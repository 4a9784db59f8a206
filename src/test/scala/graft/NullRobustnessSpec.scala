package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Null-laced inputs through the operator surface: a 100 TB corpus WILL
  * contain null text and missing embeddings, and before round 11 a
  * single null killed whole jobs (minhash/simhash UDF NPE, cosine NPE)
  * or silently polluted results (null ranked FIRST in the KMV table,
  * null HLL register row). Contract asserted here: null text signs/
  * scores like the empty document (row kept for downstream quality
  * gates); null vectors and null sketch values are dropped (they can
  * participate in no distance / aggregate).
  */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away"),
    (2L, null: String), (3L, ""))
    .toDF("doc_id", "text")
    .withColumn("source", lit("s")).withColumn("url", lit("http://x/a"))

  test("null text: dedup/scoring operators neither crash nor drop the row") {
    // null and "" sign identically (the empty document)
    val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 8, 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(2L) == sigs(3L))
    assert(docs.select(TextAnalysis.qualityScore(col("text"))).count() == 3)
    assert(TextAnalysis.scoreLinear(docs).count() == 3)
    assert(TextAnalysis.perplexityScore(docs).count() == 3)
    // candidate generation + keep run to completion; the real doc
    // survives nearDupKeep
    assert(Dedup.minhashCandidates(docs, 8, 2, 3).count() >= 0)
    val kept = Dedup.nearDupKeep(docs, 8, 2).select("doc_id")
      .as[Long].collect().toSet
    assert(kept.contains(1L))
    assert(Dedup.cdcDuplicateChunks(docs).count() == 0)
    assert(Dedup.duplicateSpans(docs, 3).count() == 0)
  }

  test("null embeddings: ANN paths drop the vector, not the job") {
    val emb = Seq((1L, Array(1.0f, 2.0f), "x"),
      (2L, null: Array[Float], "y"), (3L, Array(2.0f, 4.0f), "x"))
      .toDF("vec_id", "embedding", "label")
    val brute = Similarity.bruteForceTopK(emb, emb, 2)
    assert(brute.filter(col("query_id") === 2L).count() == 0)
    assert(brute.filter(col("query_id") === 1L).count() > 0)
    assert(Similarity.lshTopK(emb, emb.limit(1), 2).count() >= 0)
    assert(Similarity.embeddingNearDup(emb, 0.9).count() >= 0)
    // int8 funnel (covers IVF/PQ paths through quantIds)
    assert(Similarity.ivfTopKInt8(emb, emb, 2, nCells = 2, iters = 1)
      .filter(col("query_id") === 2L).count() == 0)
  }
}
