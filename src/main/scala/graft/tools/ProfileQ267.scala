package graft.tools
import graft.{SparkEntry, Tables}
object ProfileQ267 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession("profile-q267")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val edges = graft.operators.Graphs.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey", dedup = false)
    var t0 = System.nanoTime()
    val canon = graft.operators.Dedup.materialize(edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    println(f"canon rows=${canon.count()} t=${(System.nanoTime()-t0)/1e9}%.1f")
    val both = canon.select(col("a").as("z"), col("b").as("x"))
      .unionByName(canon.select(col("b").as("z"), col("a").as("x")))
    val deg = both.groupBy("z").agg(count(lit(1)).as("_d"))
    val wz = deg.filter(col("_d") <= 1000 && col("_d") >= 2)
      .withColumn("_ln", graft.plans.GraftExtensions.lnQ12Native(col("_d")))
      .withColumn("_wq6", expr("1000000000000000000 DIV _ln")).drop("_ln")
    t0 = System.nanoTime()
    val pairs = both.join(wz, Seq("z"))
      .groupBy("z", "_wq6").agg(collect_list("x").as("_xs"))
      .select(col("_wq6"), explode(col("_xs")).as("pa"), col("_xs"))
      .select(col("_wq6"), col("pa"), explode(col("_xs")).as("pb"))
      .filter(col("pa") < col("pb"))
    val cand = pairs.groupBy(col("pa").as("a"), col("pb").as("b"))
      .agg(count(lit(1)).as("cn"), sum("_wq6").as("aa_q6"))
    println(f"cand rows=${cand.count()} t=${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val out = cand.join(canon, Seq("a", "b"), "left_anti")
      .orderBy(col("aa_q6").desc, col("a"), col("b")).limit(100)
    println(f"final rows=${out.count()} t=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
