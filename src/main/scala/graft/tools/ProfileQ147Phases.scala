package graft.tools

import graft.Tables
import graft.operators.{Dedup, Graphs}
import org.apache.spark.sql.functions._

/** Job-level timing inside q147's pageRank: adjacency cache + nodes,
  * each round, final top-k — to attribute the bench cost.
  */
object ProfileQ147Phases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession("profile-q147-phases")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val scale = 1000000000000L; val dampPct = 85; val c = 8192
    for (k <- 0 to 1) {
      println(s"[phase] ---- pass $k ----")
      val li = Tables.lineitem(spark, dir)
      val edges = Graphs.coOccurrenceEdges(li, "l_orderkey", "l_partkey", dedup = false)
      val e = edges.select("src", "dst")
        .groupBy("src").agg(collect_set("dst").as("_all"))
        .select(col("src"), size(col("_all")).as("deg"),
          posexplode(expr(
            s"transform(sequence(0, (size(_all)-1) div $c)," +
              s" i -> slice(_all, i*$c+1, $c))")).as(Seq("_chunk", "nbrs")))
        .cache()
      t("adjacency cache")(e.count())
      val nodes = t("nodes checkpoint")(
        e.filter(col("_chunk") === 0).select(col("src").as("node"))
          .union(e.select(explode(col("nbrs")).as("node")))
          .distinct().localCheckpoint(eager = true))
      val n = t("nodes count")(nodes.count())
      val base = (scale * (100 - dampPct)) / (100L * n)
      var scores = nodes.withColumn("score", lit(scale / n))
      for (r <- 1 to 3) {
        scores = t(s"round $r") {
          val contrib = e
            .join(broadcast(scores.withColumnRenamed("node", "src")), Seq("src"))
            .select(expr(s"(score * $dampPct) div (deg * 100)").as("_c"),
              explode(col("nbrs")).as("node"))
            .groupBy("node").agg(sum("_c").as("_cs"))
          nodes.join(broadcast(contrib), Seq("node"), "left")
            .select(col("node"),
              (lit(base) + coalesce(col("_cs"), lit(0L))).as("score"))
            .localCheckpoint(eager = true)
        }
      }
      t("final topk")(scores.orderBy(col("score").desc, col("node")).limit(20).count())
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
