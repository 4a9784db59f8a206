package graft.tools

import org.apache.spark.sql.functions._

import graft.{Tables, SparkEntry}
import graft.operators.Layout

/** Dev tool: demonstrates the bucketed-layout path end-to-end — writes
  * lineitem/orders co-bucketed on the join key, re-joins them, prints the
  * executed plan (expect zero Exchange) and validates the row count
  * against the plain join.
  *
  * Usage: runMain graft.tools.LayoutDemo [sfDir [buckets]]
  */
object LayoutDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val buckets = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = Tables.localSession("graft-layout-demo")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    Layout.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity", "l_extendedprice"),
      "li_bkt", "l_orderkey", buckets)
    Layout.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "os_bkt", "l_orderkey", buckets)

    val joined = Layout.colocatedJoin(spark, "li_bkt", "os_bkt", "l_orderkey")
    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    val expected = Tables.lineitem(spark, dir).join(Tables.orders(spark, dir),
      col("l_orderkey") === col("o_orderkey")).count()
    println(s"JOIN_ROWS=$n EXPECTED=$expected EXCHANGES=$exchanges")
    println(plan.linesIterator.take(12).mkString("\n"))
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS os_bkt")
    spark.stop()
  }
}
