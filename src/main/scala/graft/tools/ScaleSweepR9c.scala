package graft.tools

import graft.{SparkEntry, Tables}

/** Engine-side 30× timing sweep of the late-round-9 tier (q178–q195):
  * correctness is DuckDB-gated at sf0.01 and 10× (COVERAGE.md; engine-
  * level cross-checks where the replay is intractable); this records
  * that the ENGINE completes at 30× and how it scales.
  *
  * Usage: runMain graft.tools.ScaleSweepR9c [sfDir]
  */
object ScaleSweepR9c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val spark = Tables.localSession("graft-scalesweep-r9c")
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q178_setsim_join", "q179_bfs_hops", "q180_skyline",
      "q181_ab_ttest", "q182_weighted_quantiles", "q183_topk_native",
      "q184_record_linkage", "q185_stream_first_n", "q186_longest_streak",
      "q187_fd_violations", "q188_pattern_negation", "q189_kmv_distinct",
      "q190_bloom_join", "q191_asof_native", "q192_trend_slopes",
      "q193_centroid_shift", "q194_wilson_ranking", "q195_corpus_matrix",
      "q196_survival_km", "q197_session_lift", "q198_gini",
      "q199_user_entropy", "q200_stream_kmv")
    for (name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[sweep] $name%-28s rows=$n%9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
