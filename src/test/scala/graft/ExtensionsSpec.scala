package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Hashing
import graft.operators.Dedup
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

  test("graft_hll registered via extensions, callable from SQL") {
    val s = extSession
    import s.implicits._
    s.range(1, 5001).toDF("v").createOrReplaceTempView("ids")
    val got = s.sql(
      "SELECT graft_hll(v).n_set AS n_set, graft_hll(v).est AS est FROM ids")
      .as[(Long, Long)].collect().head
    val expected = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllRegisters(
        s.range(1, 5001).toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("x")),
        Seq("g"), "v"), Seq("g"))
      .select("n_set", "est").as[(Long, Long)].collect().head
    assert(got == expected)
  }

  test("graft_topk: equals the window top-k, partial-aggregates, SQL-registered") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // heavy ties (ord from a small set) exercise the id tiebreak
    val df = (1 to 5000).map(i =>
      (i % 7, (rng.nextInt(40) * 0.5), i.toLong)).toDF("g", "ord", "id")
    val native = df.groupBy("g")
      .agg(GraftExtensions.topKNative(col("ord"), col("id"), 10).as("_tk"))
      .select(col("g"), posexplode(col("_tk")))
      .select(col("g"), col("pos"), col("col.ord"), col("col.id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("g"), (col("rn") - 1).as("pos"), col("ord"), col("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(native == windowed)
    // the plan partial-aggregates (ObjectHashAggregate), never sorts input
    val plan = df.groupBy("g")
      .agg(GraftExtensions.topKNative(col("ord"), col("id"), 10).as("_tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(plan.contains("partial_graft_topk"), plan.take(400))
    // SQL registration path
    val s = extSession
    s.range(0, 100).selectExpr("id % 3 AS g", "CAST(id AS DOUBLE) AS o", "id AS i")
      .createOrReplaceTempView("tk")
    val top = s.sql(
      "SELECT g, graft_topk(o, i, 2) AS t FROM tk GROUP BY g ORDER BY g")
      .collect()
    assert(top.length == 3)
    assert(top.head.getSeq[org.apache.spark.sql.Row](1).head.getDouble(0) == 99.0)
  }

  test("sortedIntersect + shingleDigests: equal the built-in formulations") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val pairs = (1 to 200).map { i =>
      val a = Seq.fill(rng.nextInt(50))(rng.nextInt(100).toLong).distinct.sorted
      val b = Seq.fill(rng.nextInt(50))(rng.nextInt(100).toLong).distinct.sorted
      (i, a, b)
    }
    val df = pairs.toDF("i", "a", "b")
    val got = df.select(col("i"),
        GraftExtensions.sortedIntersectNative(col("a"), col("b")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    pairs.foreach { case (i, a, b) =>
      assert(got(i) == (a.toSet & b.toSet).size, s"pair $i")
    }
    // digests: size and pairwise-intersection parity with string shingles
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"),
      (3L, "abcdefghijklmXYZ"), (4L, "zz"), (5L, "")).toDF("id", "text")
    val d = docs.select(col("id"),
        GraftExtensions.shingleDigestsNative(lower(col("text")), 5).as("dg"),
        Dedup.shingles(col("text"), 5).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[String](2)))
    d.foreach { case (id, dg, sh) =>
      assert(dg.length == sh.distinct.length, s"doc $id size")
      assert(dg == dg.sorted && dg == dg.distinct, s"doc $id sorted distinct")
    }
    val m = d.map(x => x._1 -> x).toMap
    for (x <- d; y <- d if x._1 < y._1) {
      assert((x._2.toSet & y._2.toSet).size == (x._3.toSet & y._3.toSet).size,
        s"pair ${x._1},${y._1} digest-vs-string intersection")
    }
    assert(m(4L)._2.length == 1 && m(5L)._2.length == 1) // short/empty text
  }

  test("native as-of join: custom plan node, merge exec, matches composition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.plans.AsOfJoinNative
    val quotes = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 20L, 2.5),
      (2L, 5L, 9.0), (3L, 50L, 7.0))
      .toDF("q_key", "q_ts", "px").repartition(5)
    val trades = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 100L), (4L, 1L))
      .toDF("t_key", "t_ts").repartition(3)
    val j = AsOfJoinNative.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
    val got = j.select("t_key", "t_ts", "q_ts", "px").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 9L, -1L, -1.0),      // before any quote
      (1L, 10L, 10L, 1.0),      // equal time admissible
      (1L, 25L, 20L, 2.5),      // tie at t=20 → last in sort order
      (2L, 100L, 5L, 9.0),
      (4L, 1L, -1L, -1.0)))     // key with no quotes
    // the physical plan IS the custom exec, sorts+exchanges injected
    val phys = j.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys.take(300)) // nodeName strips "Exec"
    assert(phys.contains("Sort"), "EnsureRequirements added the sorts")
    // random cross-check vs the relational MAX formulation
    val rng = new scala.util.Random(5)
    val qs = (1 to 2000).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(1000).toLong, rng.nextDouble()))
      .toDF("q_key", "q_ts", "px")
    val ts = (1 to 1500).map(_ =>
      (rng.nextInt(50).toLong, rng.nextInt(1000).toLong))
      .toDF("t_key", "t_ts")
    val native = AsOfJoinNative.join(ts, qs, "t_key", "q_key", "t_ts", "q_ts")
      .groupBy("t_key", "t_ts")
      .agg(count(lit(1)).as("n"), max("q_ts").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val rel = ts.distinct().join(qs,
        col("t_key") === col("q_key") && col("q_ts") <= col("t_ts"), "left")
      .groupBy("t_key", "t_ts").agg(max("q_ts").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(native.keySet == rel.keySet)
    native.foreach { case (k, m) => assert(m == rel(k), s"key $k") }
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

  test("graft_morton: bit goldens, naive-interleave agreement, codegen'd, null-safe") {
    import graft.plans.MortonInterleave.interleave
    // definitional goldens: x at even positions, y at odd
    assert(interleave(1L, 0L) == 1L)
    assert(interleave(0L, 1L) == 2L)
    assert(interleave(3L, 3L) == 15L)
    assert(interleave(0xFFFFL, 0L) == 0x55555555L)
    assert(interleave(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(interleave(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // inputs reduce modulo 2^16
    assert(interleave(0x10001L, 0L) == interleave(1L, 0L))
    // agreement with the bit-by-bit definition on random inputs
    def naive(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(41)
    (0 until 500).foreach { _ =>
      val (x, y) = (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
      assert(interleave(x, y) == naive(x, y), s"($x, $y)")
    }
    // SQL registration + whole-stage codegen
    val s = extSession
    import s.implicits._
    (0 until 200).map(i => (i.toLong, (i * 7 % 65536).toLong)).toDF("x", "y")
      .repartition(2).createOrReplaceTempView("zsrc")
    val q = s.sql("SELECT graft_morton(x, y) AS z FROM zsrc")
    val got = q.as[Long].collect()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      plan.take(400))
    assert(got.toSet == (0 until 200).map(i => naive(i.toLong, i * 7L % 65536)).toSet)
    // null-safe
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(GraftExtensions.mortonNative($"x", $"y").as("z"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("graft_hilbert: round-trip vs test-only inverse, unit-step adjacency, codegen'd, null-safe") {
    import graft.plans.HilbertIndex.xy2d
    // test-only inverse (the published d2xy walk, bottom-up)
    def d2xy(d: Long): (Long, Long) = {
      var (x, y, t) = (0L, 0L, d)
      var s = 1L
      while (s < 65536L) {
        val rx = (t / 2) % 2
        val ry = (t ^ rx) % 2
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx
        y += s * ry
        t /= 4
        s <<= 1
      }
      (x, y)
    }
    // corner golden: d=0 is the origin
    assert(xy2d(0L, 0L) == 0L)
    // round-trip over a sampled d range + the locality property that
    // justifies the operator: consecutive d are ALWAYS grid-adjacent
    var prev = d2xy(0L)
    (0L to 4096L).foreach { d =>
      val (x, y) = d2xy(d)
      assert(xy2d(x, y) == d, s"round-trip broke at d=$d ($x,$y)")
      if (d > 0) {
        val md = math.abs(x - prev._1) + math.abs(y - prev._2)
        assert(md == 1, s"jump of $md at d=$d")
      }
      prev = (x, y)
    }
    // bijectivity on a random coordinate sample
    val rnd = new scala.util.Random(43)
    val pts = (0 until 2000).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).distinct
    assert(pts.map { case (x, y) => xy2d(x, y) }.distinct.size == pts.size)
    // inputs reduce modulo 2^16
    assert(xy2d(0x10001L, 0L) == xy2d(1L, 0L))
    // SQL registration + codegen + null-safety
    val s = extSession
    import s.implicits._
    (0 until 200).map(i => (i.toLong, (i * 7 % 65536).toLong)).toDF("x", "y")
      .repartition(2).createOrReplaceTempView("hsrc")
    val q = s.sql("SELECT graft_hilbert(x, y) AS h FROM hsrc")
    val got = q.as[Long].collect()
    q.collect() // finalize AQE so the executed plan is inspectable
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      plan.take(400))
    assert(got.toSet == (0 until 200).map(i => xy2d(i.toLong, i * 7L % 65536)).toSet)
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(GraftExtensions.hilbertNative($"x", $"y").as("h"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("zorderBy: every partition's bounding box is tight in BOTH dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 64×64 grid of points; Z-order into 16 partitions → each partition
    // should cover a small rectangle, not a full-width stripe
    val pts = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val laid = graft.operators.Layout.zorderBy(pts, "x", 1, "y", 1, numFiles = 16)
    val boxes = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.map(_.getAs[Long]("n")).sum == 64L * 64)
    // every non-trivial partition's box is at most half the grid in
    // each dimension — a leading-column sort would give full-width
    // (63-wide) stripes in the trailing dimension
    val nonTrivial = boxes.filter(_.getAs[Long]("n") >= 64)
    assert(nonTrivial.nonEmpty)
    nonTrivial.foreach { b =>
      val w = b.getAs[Long]("x1") - b.getAs[Long]("x0")
      val h = b.getAs[Long]("y1") - b.getAs[Long]("y0")
      assert(w <= 32 && h <= 32, s"partition box ${w}x$h too wide")
    }
  }

  test("optimizer rule collapses nested same-form graft_normalize, keeps cross-form") {
    val s = extSession
    import s.implicits._
    val df = Seq("Café", "x").toDF("t").repartition(2)
    // same form twice → optimized plan carries ONE normalize call
    val same = df.select(
      GraftExtensions.normalizeNative(
        GraftExtensions.normalizeNative($"t", "NFC"), "NFC").as("n"))
    val optimized = same.queryExecution.optimizedPlan
    val nSame = optimized.expressions.map(_.collect {
      case u: graft.plans.UnicodeNormalize => u }.size).sum
    assert(nSame == 1, optimized.toString)
    assert(same.as[String].collect().toSet == Set("Café", "x"))
    // different forms must NOT collapse (NFD∘NFC ≠ NFC)
    val cross = df.select(
      GraftExtensions.normalizeNative(
        GraftExtensions.normalizeNative($"t", "NFC"), "NFD").as("n"))
    val nCross = cross.queryExecution.optimizedPlan.expressions.map(_.collect {
      case u: graft.plans.UnicodeNormalize => u }.size).sum
    assert(nCross == 2, cross.queryExecution.optimizedPlan.toString)
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

  test("cdcChunksNative ≡ the Scala kernel; null doc → null (explode drops)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val texts = (1 to 50).map(i =>
      (i.toLong, (1 to rng.nextInt(800)).map(_ =>
        ('a' + rng.nextInt(26)).toChar).mkString)) :+ (99L, null)
    val df = texts.toDF("id", "t")
    val got = df.select(col("id"),
        GraftExtensions.cdcChunksNative(col("t"), 16, 128, 6).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null
         else r.getSeq[org.apache.spark.sql.Row](1)
           .map(x => (x.getInt(0), x.getInt(1), x.getLong(2))))).toMap
    texts.foreach { case (id, t) =>
      if (t == null) assert(got(id) == null)
      else assert(got(id) == graft.functions.Hashing
        .cdcChunks(t, 16, 128, 6).toSeq, s"id=$id")
    }
  }

  test("graft_topk/graft_kmv: wrong input types are ANALYSIS errors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1, BigDecimal("1.5"), 10L)).toDF("g", "d", "i")
    // DECIMAL ord → analysis failure, not an executor ClassCastException
    val eTopk = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(GraftExtensions.topKNative(col("d"), col("i"), 3).as("t"))
        .collect()
    }
    assert(eTopk.getMessage.contains("graft_topk"), eTopk.getMessage)
    // INT id (not BIGINT) is also rejected at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(GraftExtensions.topKNative(col("i").cast("double"),
          col("g"), 3).as("t"))
        .collect()
    }
    // graft_kmv on a DECIMAL column → analysis failure
    val eKmv = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(GraftExtensions.kmvNative(col("d"), 16).as("k"))
        .collect()
    }
    assert(eKmv.getMessage.contains("graft_kmv"), eKmv.getMessage)
  }

  test("graft_topk: NaN ord sorts like the window's DESC (NaN largest)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // raw `>` is false both ways on NaN and breaks sortWith's contract;
    // Double.compare puts NaN above +Inf — exactly Spark's DESC order
    val df = Seq((1, Double.NaN, 1L), (1, 5.0, 2L), (1, Double.NaN, 3L),
      (1, Double.PositiveInfinity, 4L), (1, 7.0, 5L), (1, 5.0, 6L))
      .toDF("g", "ord", "id").repartition(3)
    val native = df.groupBy("g")
      .agg(GraftExtensions.topKNative(col("ord"), col("id"), 4).as("t"))
      .select(posexplode(col("t")))
      .collect().map(r => (r.getInt(0),
        r.getStruct(1).getDouble(0), r.getStruct(1).getLong(1))).toList
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select((col("rn") - 1).as("pos"), col("ord"), col("id"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toList
    def key(t: (Int, Double, Long)) =
      (t._1, java.lang.Double.doubleToLongBits(t._2), t._3)
    assert(native.map(key).sorted == windowed.map(key).sorted)
    assert(native.map(_._3).take(2).toSet == Set(1L, 3L)) // NaNs first
  }

  test("native as-of join: null times on either side are safe") {
    import org.apache.spark.sql.functions._
    import graft.plans.AsOfJoinNative
    val s = spark
    import s.implicits._
    // right rows with null q_ts are dropped (match nothing, no NPE);
    // a left row with null t_ts emits null-extended output
    val quotes = Seq((java.lang.Long.valueOf(1L), null: java.lang.Long, 1.0),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), 2.0))
      .toDF("q_key", "q_ts", "px")
    val trades = Seq((java.lang.Long.valueOf(1L), null: java.lang.Long),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(20L)))
      .toDF("t_key", "t_ts")
    val got = AsOfJoinNative.join(trades, quotes,
        "t_key", "q_key", "t_ts", "q_ts")
      .select("t_key", "t_ts", "q_ts", "px").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(got == Set(
      (1L, -1L, -1L, -1.0),   // null left time → null-extended
      (1L, 20L, 10L, 2.0)))   // null-time quote ignored, 10 matches
  }

  test("graft_splitmix64: bit-equal to the JVM kernel incl. negatives; HRW growth moves rows only to new shards") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val xs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L,
      0x9e3779b97f4a7c15L, -987654321L)
    val got = xs.toDF("x")
      .select(GraftExtensions.splitmix64Native(col("x")))
      .as[Long].collect().toSeq
    assert(got == xs.map(graft.functions.Hashing.splitmix64))
    // null in → null out
    assert(Seq[Option[Long]](None).toDF("x")
      .select(GraftExtensions.splitmix64Native(col("x"))).head.isNullAt(0))
    // consistent-hashing guarantee: growing 8 → 10 shards, every row
    // that moves lands on a NEW shard (argmax can only change if a new
    // seed wins), and roughly (10-8)/10 of rows move
    val ids = (0L until 2000L).toDF("doc_id")
    val mig = graft.operators.Layout.shardMigration(ids, "doc_id", 8, 10)
      .as[(Long, Long, Long)].collect()
    val movedToOld = mig.filter(r => r._1 < 8 && r._3 > 0)
    assert(movedToOld.isEmpty, s"rows moved onto pre-existing shards: ${movedToOld.toSeq}")
    val moved = mig.map(_._3).sum.toDouble / 2000.0
    assert(moved > 0.1 && moved < 0.3, s"moved fraction $moved, expected ~0.2")
  }

  test("graft_int_ewma: floorDiv recurrence incl. negatives, codegen'd, type-checked, SQL-registered") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // -500 after the 50-level: s = floor(-150/8) = -19, where a
    // truncating division would give -18 — the floor-vs-truncate case
    val xs = Seq(100L, -300L, -500L, -50L, 7L, -1L, 0L, 999L)
    def golden(den: Long): Seq[Long] =
      xs.tail.scanLeft(xs.head)((s, x) => Math.floorDiv(x + (den - 1) * s, den))
    val df = Seq(Tuple1(xs)).toDF("v")
      .select(transform(col("v"), x => coalesce(x, lit(0L))).as("v"))
    for (den <- Seq(2, 8)) {
      val got = df.select(GraftExtensions.intEwmaNative(col("v"), den))
        .as[Seq[Long]].head()
      assert(got == golden(den.toLong), s"den=$den")
    }
    // floor vs truncation actually differs here (negative smoothed level)
    assert(golden(8).exists(_ < 0))
    // empty array → empty; null array → null
    assert(df.select(GraftExtensions.intEwmaNative(
      slice(col("v"), 1, 0), 8)).as[Seq[Long]].head() == Seq.empty[Long])
    assert(Seq(Tuple1(null.asInstanceOf[Seq[Long]])).toDF("v")
      .select(GraftExtensions.intEwmaNative(col("v"), 8)).head().isNullAt(0))
    // nullable elements / wrong element type → ANALYSIS errors
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(GraftExtensions.intEwmaNative(
        transform(col("v"), x => when(x >= 0L, x)), 8)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(GraftExtensions.intEwmaNative(
        transform(col("v"), x => coalesce(x.cast("int"), lit(0))), 8)).collect()
    }
    // SQL registration path on the extensions session
    val sqlDf = extSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(xs)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)))))
    sqlDf.createOrReplaceTempView("ewma_in")
    val viaSql = extSession.sql(
      "SELECT graft_int_ewma(v, 8) AS s FROM ewma_in")
      .collect().head.getSeq[Long](0)
    assert(viaSql == golden(8L))
  }
}

/** Forms exercised by the normalize golden test (kept outside the suite
  * so the list reads as data).
  */
object UnicodeFormGoldens {
  import java.text.Normalizer.Form
  val forms: Seq[Form] = Seq(Form.NFC, Form.NFD, Form.NFKC, Form.NFKD)
}
