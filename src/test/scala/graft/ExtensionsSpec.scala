package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Hashing
import graft.plans.GraftExtensions

/** Native Catalyst expression + SparkSessionExtensions registration:
  * `graft_cosine` usable from SQL text and the Column API, codegen path
  * matching the kernel exactly.
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val extSession: SparkSession = {
    val base = spark // materialize shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(GraftExtensions.register)
      .getOrCreate()
    SparkSession.setActiveSession(base)
    SparkSession.setDefaultSession(base)
    s
  }

  test("graft_cosine registered via extensions, callable from SQL") {
    val s = extSession
    import s.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f, 2.0f), Seq(1.0f, 0.0f, 2.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val got = s.sql("SELECT graft_cosine(a, b) AS c FROM vecs").as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    val expected = Hashing.cosine(Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    assert(math.abs(got(2) - expected) < 1e-12)
  }

  test("graft_cosine via Column API handle, null-safe") {
    val s = extSession
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 1.0f)), Some(Seq(1.0f, 1.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f, 1.0f)))).toDF("a", "b")
    val out = df.select(GraftExtensions.cosineExpr(df("a"), df("b")).as("c"))
      .collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).isNullAt(0)) // null input → null, not crash
  }

  test("expression survives whole-stage codegen (no interpreted fallback)") {
    val s = extSession
    import s.implicits._
    val n = 1000
    val df = (0 until n).map { i =>
      (Array.tabulate(8)(j => (i + j).toFloat).toSeq,
        Array.tabulate(8)(j => (i * j + 1).toFloat).toSeq)
    }.toDF("a", "b")
    // repartition defeats ConvertToLocalRelation, so the projection runs
    // in the real codegen'd executor path rather than driver-side folding
    df.repartition(2).createOrReplaceTempView("vecs_big")
    val sum = s.sql("SELECT SUM(graft_cosine(a, b)) AS t FROM vecs_big")
      .as[Double].head()
    assert(sum > 0 && sum <= n) // cosines in (0,1] for positive vecs
    val q = s.sql("SELECT graft_cosine(a, b) FROM vecs_big")
    q.collect() // finalize the AQE plan; codegen shows only in the final plan
    val plan = q.queryExecution.executedPlan.toString
    // AQE renders whole-stage-codegen stages as "*(n) Op"
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      plan.take(400))
  }

  test("graft_dot_int: bit-equal to the zip_with fold, codegen'd, null-safe") {
    val s = extSession
    import s.implicits._
    val rnd = new scala.util.Random(77)
    val df = (0 until 500).map { _ =>
      (Seq.fill(16)(rnd.nextInt(255) - 127), Seq.fill(16)(rnd.nextInt(255) - 127))
    }.toDF("a", "b")
    val both = df.select(
      graft.plans.GraftExtensions.dotIntNative($"a", $"b").as("native"),
      org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with($"a", $"b",
          (x, y) => x.cast("long") * y.cast("long")),
        org.apache.spark.sql.functions.lit(0L), (acc, v) => acc + v).as("fold"))
      .collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    // SQL registration + codegen
    df.repartition(2).createOrReplaceTempView("ivecs")
    val q = s.sql("SELECT graft_dot_int(a, b) FROM ivecs")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      plan.take(400))
    // null-safe: null array -> null result, not a crash
    val withNull = Seq((Some(Seq(1, 2)), None: Option[Seq[Int]]))
      .toDF("a", "b")
      .select(graft.plans.GraftExtensions.dotIntNative($"a", $"b").as("d"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("graft_normalize: NFC/NFD/NFKC against JDK goldens, null-safe, SQL-registered") {
    val s = extSession
    import s.implicits._
    // decomposed e + COMBINING ACUTE, precomposed é, ligature ﬁ, ASCII
    val cases = Seq("Café", "Café", "ﬁne", "plain ascii", "")
    val df = cases.zipWithIndex.map(_.swap).toDF("i", "t").repartition(2) // real codegen path
    def run(form: String): Seq[String] =
      df.select($"i", graft.plans.GraftExtensions.normalizeNative($"t", form).as("n"))
        .orderBy("i").as[(Int, String)].collect().toSeq.map(_._2)
    import java.text.Normalizer
    UnicodeFormGoldens.forms.foreach { f =>
      assert(run(f.name) == cases.map(Normalizer.normalize(_, f)), f.name)
    }
    // NFC composes the decomposed pair; NFKC also folds the ligature
    assert(run("NFC").take(2) == Seq("Café", "Café"))
    assert(run("NFKC")(2) == "fine")
    assert(run("NFC")(2) == "ﬁne")
    // null-safe + SQL registration
    val withNull = Seq(Some("à"), None).map(Tuple1(_)).toDF("t")
    withNull.createOrReplaceTempView("norm_in")
    val viaSql = s.sql("SELECT graft_normalize(t, 'NFC') AS n FROM norm_in")
      .collect()
    assert(viaSql(0).getString(0) == "à")
    assert(viaSql(1).isNullAt(0))
  }

  test("graft_normalize: literal-foldable inputs and interpreted eval agree") {
    // nullSafeEval path (no codegen): evaluate via a local relation
    val s = extSession
    import s.implicits._
    val out = Seq(Tuple1("Å")).toDF("t")
      .select(graft.plans.GraftExtensions.normalizeNative($"t", "NFC").as("n"))
      .as[String].head()
    assert(out == "Å")
    intercept[IllegalArgumentException] {
      graft.plans.UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
  }
}

/** Forms exercised by the normalize golden test (kept outside the suite
  * so the list reads as data).
  */
object UnicodeFormGoldens {
  import java.text.Normalizer.Form
  val forms: Seq[Form] = Seq(Form.NFC, Form.NFD, Form.NFKC, Form.NFKD)
}
