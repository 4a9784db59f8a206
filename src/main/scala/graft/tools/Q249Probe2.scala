package graft.tools
import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._
/** Stage-by-stage replica of recHoldoutEval's internals at a given sf
  * dir — counts and times each intermediate so an OOM names its stage.
  */
object Q249Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val spark = Tables.localSession("q249probe2")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
      r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    val b = Dedup.materialize(li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("_c"), col("l_orderkey").as("_g"),
        col("l_partkey").as("_i"),
        expr("unix_micros(o_orderdate) DIV 86400000000").as("_d")))
    t("b")(b.count())
    val lim = b.agg(min("_d"), max("_d")).head()
    val cutoff = lim.getLong(0) + 4L * (lim.getLong(1) - lim.getLong(0)) / 5L
    val train = b.filter(col("_d") < cutoff)
    val test = b.filter(col("_d") >= cutoff)
    val testCusts = test.select("_c").distinct()
    val trainItems = Dedup.materialize(train.select("_c", "_i").distinct()
      .join(testCusts, Seq("_c"), "semi"))
    t("trainItems")(trainItems.count())
    val testItems = test.select("_c", "_i").distinct()
    t("testItems")(testItems.count())
    val nbrW = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("_w").desc, col("dst"))
    val cooc = Dedup.materialize(train.select("_g", "_i").distinct()
      .groupBy("_g").agg(collect_list("_i").as("_is"))
      .filter(size(col("_is")) <= 1000)
      .select(col("_is"), explode(col("_is")).as("src"))
      .select(col("src"), explode(col("_is")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("_w"))
      .withColumn("_rn", row_number().over(nbrW))
      .filter(col("_rn") <= 20).drop("_rn"))
    t("cooc")(cooc.count())
    val cand = trainItems.join(cooc, col("_i") === col("src"))
      .select(col("_c"), col("dst").as("_j"), col("_w"))
    t("cand")(cand.count())
    val scores = cand
      .join(trainItems.select(col("_c"), col("_i").as("_j")),
        Seq("_c", "_j"), "left_anti")
      .groupBy("_c", "_j").agg(sum("_w").as("_s"))
    t("scores")(scores.count())
    val recs = scores.groupBy("_c")
      .agg(graft.plans.GraftExtensions.topKNative(
        col("_s").cast("double"), col("_j"), 5).as("_t"))
      .select(col("_c"), posexplode(col("_t")))
      .select(col("_c"), col("col.id").as("_j"),
        (col("pos") + 1).cast("long").as("_rank"))
    t("recs")(recs.count())
    spark.stop()
  }
}
