package graft.tools

import graft.{SparkEntry, Tables}

/** Generic engine-side timing sweep: runs the named queries against a
  * (typically ScaleUp-generated) data directory and prints per-query
  * rows + wall time. Correctness is the DuckDB gate's job (sf0.01 /
  * 10×); this records that the ENGINE completes at the larger scale
  * and how the wall time moves — the "would the plan survive 30×"
  * evidence COVERAGE.md cites per tier.
  *
  * Usage: runMain graft.tools.ScaleSweep <sfDir> <query> [query ...]
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSweep <sfDir> <query> [query ...]")
    val dir = args.head
    val spark = Tables.localSession("graft-scalesweep")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.tail) {
      SparkEntry.queries.get(name) match {
        case None => println(f"[sweep] $name%-28s UNKNOWN QUERY")
        case Some(fn) =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          println(f"[sweep] $name%-28s rows=$n%9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
