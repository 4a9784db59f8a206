package graft.tools

import graft.{SparkEntry, Tables}

/** Dev smoke: drives the driver-facing surface exactly as the driver does
  * — `SparkEntry.entry` (rows>0 check) and optionally one named query
  * with its formatted plan (for shuffle/pushdown inspection).
  *
  * Usage: runMain graft.tools.Smoke [queryName [sfDir]]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(5, truncate = false)
    args.headOption.foreach { q =>
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
      val qdf = SparkEntry.queries(q)(spark, dir)
      qdf.explain("formatted")
      println(s"QUERY_ROWS=${qdf.count()}")
    }
    spark.stop()
  }
}
