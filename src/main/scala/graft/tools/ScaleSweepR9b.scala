package graft.tools

import graft.{SparkEntry, Tables}

/** Engine-side 30× timing sweep of the round-9 continuation tier
  * (q154–q168): correctness at 10× is DuckDB-gated (COVERAGE.md); this
  * records that the ENGINE completes at 30× and how it scales.
  *
  * Usage: runMain graft.tools.ScaleSweepR9b [sfDir]
  */
object ScaleSweepR9b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val spark = Tables.localSession("graft-scalesweep-r9b")
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q154_components_distributed", "q155_hll_overlap",
      "q156_first_touch", "q157_also_bought", "q158_agg_state_merge",
      "q159_skew_report", "q160_session_paths", "q161_join_size_est",
      "q162_triangles", "q163_upsert_latest", "q164_stream_heavy",
      "q165_stream_sessions", "q166_kcore", "q167_pit_enrich",
      "q168_stream_enrich", "q169_communities", "q170_corpus_jaccard",
      "q171_funnel_windowed", "q172_asof_nearest", "q173_weighted_rank",
      "q174_linear_attribution", "q175_stream_upsert",
      "q176_trailing_revenue", "q177_partitioned_scan")
    for (name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[sweep] $name%-28s rows=$n%9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
