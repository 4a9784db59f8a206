package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming-ingest near-duplicate detection: the stateful counterpart of
  * [[graft.operators.Dedup.minhashCandidates]] for a 100 TB/day document
  * firehose, where batch LSH over the full corpus is not an option.
  *
  * Shape: each arriving document is minhash-signed map-side (same kernel
  * as the batch path), exploded to its LSH band keys, and grouped by
  * (band, bucket); per-bucket `flatMapGroupsWithState` state holds the
  * signatures seen in that bucket, so a new arrival compares against ONLY
  * its bucket's history — the streaming analog of the within-bucket
  * self-join, with identical candidate semantics. State is bounded by
  * `maxPerBucket` (oldest evicted — the same skew-cap philosophy as the
  * batch `capBuckets`: a degenerate boilerplate bucket must not grow
  * without bound).
  *
  * The same function runs in batch mode (flatMapGroupsWithState over a
  * bounded Dataset executes with empty initial state), which is how the
  * spec cross-checks it against the batch LSH operator.
  */
object StreamingDedup {

  /** Bucket history: parallel seq of doc ids and their signatures. */
  final case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** Near-dup candidate pairs (id_a < id_b, est_jaccard = signature
    * agreement ≥ threshold) between each arriving document and the
    * bucket history at its arrival. A pair matching in several bands is
    * emitted once per matching band — distinct downstream if needed
    * (the batch operator's dropDuplicates step).
    */
  def nearDupCandidates(spark: SparkSession, docs: DataFrame,
      numHashes: Int = 32, rowsPerBand: Int = 4, k: Int = 5,
      threshold: Double = 0.5, maxPerBucket: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val num = numHashes
    val sigU = udf((t: String) =>
      graft.functions.Hashing.minhashSignature(t, k, num).toSeq)
    val banded = docs
      .select(col(idCol).cast("long").as("id"), sigU(col(textCol)).as("sig"))
      .select(col("id"), col("sig"),
        explode(Dedup.bandKeys(col("sig"), num, rowsPerBand)).as("bk"))
      .select(col("bk.band"), col("bk.bucket"), col("id"), col("sig"))
      .as[(Int, Long, Long, Seq[Long])]
    banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Seq[Long])],
         state: GroupState[BucketState]) =>
          val prev = state.getOption.getOrElse(BucketState(Nil, Nil))
          var ids = prev.ids
          var sigs = prev.sigs
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
          // within-batch arrivals processed in id order → deterministic
          // output regardless of partition/iterator order
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sig) =>
            if (!ids.contains(id)) {
              ids.iterator.zip(sigs.iterator).foreach { case (oid, osig) =>
                var agree = 0
                var i = 0
                while (i < num) { if (osig(i) == sig(i)) agree += 1; i += 1 }
                val est = agree.toDouble / num
                if (est >= threshold)
                  out += ((math.min(oid, id), math.max(oid, id), est))
              }
              ids = ids :+ id
              sigs = sigs :+ sig
              if (ids.length > maxPerBucket) { // evict oldest
                ids = ids.drop(1); sigs = sigs.drop(1)
              }
            }
          }
          state.update(BucketState(ids, sigs))
          out.iterator
      }
      .toDF("id_a", "id_b", "est_jaccard")
  }
}
