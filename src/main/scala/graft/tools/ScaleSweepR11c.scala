package graft.tools

import graft.{SparkEntry, Tables}

/** Engine-only scale sweep of the round-11-continuation queries
  * (q233–q248) on a ScaleUp'd dataset — the "does the plan survive a
  * 30× corpus" gate (the ScaleSweepR9 convention): every query must
  * COMPLETE with sane wall time; correctness at scale is covered by
  * the 10×-oracle gates where a DuckDB replay is tractable.
  *
  * Usage: runMain graft.tools.ScaleSweepR11c /tmp/sf3
  */
object ScaleSweepR11c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    val spark = Tables.localSession("graft-scalesweep-r11c")
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q233_dominant_direction", "q234_mmr_topk",
      "q235_ewma_chart", "q236_hybrid_rrf", "q237_robust_stats",
      "q238_budget_sample", "q239_table_profile", "q240_stream_ewma",
      "q241_dyadic_quantiles", "q242_code_switch", "q243_pit_features",
      "q244_target_encode", "q245_equifreq_bins", "q246_shard_migration",
      "q247_anisotropy", "q248_set_cover", "q249_rec_eval",
      "q250_auc_exact", "q251_decile_lift", "q252_emd_drift",
      "q253_transitions", "q254_auc_by_group", "q255_stream_emd",
      "q256_robust_outliers", "q257_cohen_kappa", "q258_abc_classes",
      "q259_log_rank")
    for (name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[sweep] $name%-28s rows=$n%9d t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
