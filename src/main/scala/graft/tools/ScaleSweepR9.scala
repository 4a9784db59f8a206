package graft.tools

import graft.{SparkEntry, Tables}

/** Engine-side 30× timing sweep of the round-9 tier (q141–q149):
  * correctness at 30× is DuckDB-gated where the replay is affordable;
  * this records that the ENGINE completes and how it scales.
  *
  * Usage: runMain graft.tools.ScaleSweepR9 [sfDir]
  */
object ScaleSweepR9 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val spark = Tables.localSession("graft-scalesweep-r9")
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q141_hll_distinct", "q142_heavy_hitters",
      "q143_constraint_report", "q144_scd2_history", "q145_ks_drift",
      "q146_stream_hll", "q147_copurchase_rank", "q148_chisq_drift",
      "q149_constraints_by_source")
    for (name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[sweep] $name%-28s rows=$n%9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
