package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev tool: synthesize an N×-scale copy of a testdata directory by
  * unioning key-offset copies of the fact tables (dimensions stay fixed,
  * like TPC-H scaling). Used to measure how the headline queries scale
  * beyond the provided sf0.1 — the "would this survive 100×" check.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <copies>
  */
object ScaleUp {
  private val OFF = 1000000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesS) = args
    val copies = copiesS.toInt
    val spark = Tables.localSession("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")

    def scaled(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until copies).map { i =>
        keyCols.foldLeft(df) { (d, k) => d.withColumn(k, col(k) + i * OFF) }
      }.reduce(_ unionByName _)

    // dimensions copied as-is
    for (t <- Seq("region", "nation", "supplier", "part"))
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    scaled(Tables.customer(spark, src), Seq("c_custkey"))
      .write.mode("overwrite").parquet(s"$dst/customer.parquet")
    scaled(Tables.orders(spark, src), Seq("o_orderkey", "o_custkey"))
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    scaled(Tables.lineitem(spark, src), Seq("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    scaled(Tables.events(spark, src), Seq("event_id", "user_id"))
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    scaled(Tables.documents(spark, src), Seq("doc_id"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    scaled(Tables.embeddings(spark, src), Seq("vec_id"))
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"SCALED ${copies}x -> $dst")
    spark.stop()
  }
}
