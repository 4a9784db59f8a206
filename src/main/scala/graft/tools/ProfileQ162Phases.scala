package graft.tools

import graft.Tables
import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Phase timing inside q162: canonical edges, degrees, orient, wedge
  * generation, closure — to attribute the cost.
  */
object ProfileQ162Phases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession("profile-q162-phases")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (k <- 0 to 1) {
      println(s"[phase] ---- pass $k ----")
      val edges = Graphs.coOccurrenceEdges(Tables.lineitem(spark, dir),
        "l_orderkey", "l_partkey", dedup = false)
      val und = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(eager = false)
      val m = t("und count")(und.count())
      println(s"[phase] m=$m")
      val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      t("deg count")(deg.count())
      val o = und
        .join(deg.select(col("n").as("a"), col("d").as("_da")), Seq("a"))
        .join(deg.select(col("n").as("b"), col("d").as("_db")), Seq("b"))
        .select(
          when(struct(col("_da"), col("a")) < struct(col("_db"), col("b")),
            struct(col("a").as("u"), col("b").as("v")))
            .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("_e"))
        .select(col("_e.u").as("u"), col("_e.v").as("v"))
      val oc = o.localCheckpoint(eager = false)
      t("orient materialize")(oc.count())
      val wedges = oc.groupBy("u").agg(sort_array(collect_set("v")).as("_vs"))
        .select(col("_vs"), explode(col("_vs")).as("a"))
        .select(col("a"), explode(col("_vs")).as("b"))
        .filter(col("a") < col("b"))
      val nw = t("wedge gen + count")(wedges.count())
      println(s"[phase] wedges=$nw")
      val tri = t("closure join")(
        wedges.join(broadcast(und), Seq("a", "b")).count())
      println(s"[phase] triangles=$tri")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
