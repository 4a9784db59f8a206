package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** The pipeline's last mile: export a curated corpus as size-bounded,
  * deterministically shuffled training shards plus a verifiable
  * manifest.
  *
  * Training ingestion wants (a) a global pseudo-random order decoupled
  * from corpus layout (so a reader streaming shard 0..k sees an i.i.d.
  * mixture, not one source then the next), (b) size-bounded shards, and
  * (c) reproducibility — the same corpus + seed must shard identically
  * on any cluster. The order key is the seeded md5 permutation used
  * across the engine (`md5(seed#id)` — engine-independent), the exact
  * global position comes from [[graft.operators.Ranking.withGlobalRowNumber]]
  * (two-phase: range-bucket on the numeric md5 prefix, local
  * row_number, broadcast offsets — NO global window at any scale), and
  * shard = (pos-1) DIV rowsPerShard.
  *
  * Scale shape: one pass for bucket counts (bounded collect ≤
  * numBuckets), one shuffle into shards, one write. The manifest's
  * per-shard id digest concatenates the shard's sorted ids —
  * O(rowsPerShard) per group, fine for verification-sized shards; for
  * billion-row shards swap in an order-insensitive digest (sum of
  * per-id hashes) at the cost of weaker collision guarantees.
  */
object TrainingExport {

  /** Assign every row its shard: `shard` (0-based) and `shard_pos`
    * (0-based position inside the shard) by the seeded md5 global
    * permutation. Deterministic for a given (corpus, seed,
    * rowsPerShard) — reruns and other engines agree bit-for-bit
    * (the q115 oracle replays it with a plain global window).
    */
  def withShards(df: DataFrame, rowsPerShard: Int, seed: Long = 0,
      idCol: String = "doc_id"): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard $rowsPerShard must be > 0")
    val keyed = df
      .withColumn("_md5", md5(concat_ws("#", lit(seed), col(idCol).cast("string"))))
      // numeric lead for range-bucketing: the first 15 hex chars as a
      // long (60 bits). Hex is fixed-width lowercase, so numeric order
      // of the prefix is a prefix-projection of (md5, id) lexicographic
      // order — bucketing by it never contradicts the final sort.
      .withColumn("_ord", conv(substring(col("_md5"), 1, 15), 16, 10).cast("long"))
    Ranking.withGlobalRowNumber(keyed, Seq("_ord", "_md5", idCol),
        outCol = "_grank", nCol = "_gn")
      .withColumn("shard", expr(s"CAST((_grank - 1) DIV $rowsPerShard AS BIGINT)"))
      .withColumn("shard_pos", expr(s"CAST((_grank - 1) % $rowsPerShard AS BIGINT)"))
      .drop("_ord", "_md5", "_grank", "_gn")
  }

  /** Per-shard manifest: (shard, n_rows, id_digest) where id_digest =
    * md5 of the shard's ids sorted numerically and joined with ','.
    * Any reader can recompute it from a shard's content; a mismatch
    * pinpoints the damaged shard without touching the others.
    */
  def manifest(df: DataFrame, rowsPerShard: Int, seed: Long = 0,
      idCol: String = "doc_id"): DataFrame =
    withShards(df, rowsPerShard, seed, idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        md5(array_join(transform(sort_array(collect_list(col(idCol))),
          x => x.cast("string")), ",")).as("id_digest"))

  /** Write the sharded corpus under `outDir` (one directory + one file
    * per shard via `partitionBy`, rows ordered by `shard_pos` inside
    * each file) and return the manifest of what was written.
    */
  def writeShards(df: DataFrame, outDir: String, rowsPerShard: Int,
      seed: Long = 0, idCol: String = "doc_id"): DataFrame = {
    // one computation feeds both the write and the manifest; registered
    // with the pipeline checkpoint scope so long sessions don't leak it
    val sharded = graft.operators.Dedup.materialize(
      withShards(df, rowsPerShard, seed, idCol))
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "shard_pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        md5(array_join(transform(sort_array(collect_list(col(idCol))),
          x => x.cast("string")), ",")).as("id_digest"))
  }
}
