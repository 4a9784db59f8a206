package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Packing, TextAnalysis, Xval}

/** Dev tool: the canonical LLM-training-data pipeline, end to end, over
  * the driver testdata — the flow a user of the reference library would
  * assemble from this engine's operators:
  *
  *   documents → text stats/quality gate → exact dedup → MinHash near-dup
  *   clustering (keep cluster minimum) → benchmark decontamination →
  *   model-based quality filter → sequence packing → train/val/test folds
  *
  * Each stage is the scale-shaped operator (digest shuffles, banded LSH
  * with skew caps, broadcast decontamination, two-phase prefix sums,
  * hash-derived folds); the whole run sits inside [[Dedup.withPipeline]]
  * so LSH/cluster checkpoint blocks are freed on exit.
  *
  * Usage: runMain graft.tools.PipelineDemo [sfDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tables.localSession("graft-pipeline-demo")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    def stage(name: String, n: Long): Unit =
      println(f"STAGE $name%-28s rows=$n%7d  t=${(System.nanoTime() - t0) / 1e9}%6.2fs")

    Dedup.withPipeline {
      val docs = Tables.documents(spark, sfDir)
      stage("input", docs.count())

      // 1. line-level C4 cleaning (the test corpus is a token stream, so
      // the terminal-punctuation rule is off), then the document gate
      val cleaned = docs.withColumn("text",
        TextAnalysis.cleanLines(col("text"), minWords = 2,
          requireTerminal = false))
      val gated = cleaned
        .withColumn("q", TextAnalysis.qualityFeatures(col("text")))
        .filter(col("q.n_words") >= 5 && col("q.mean_word_len").between(2, 12))
        .drop("q")
      stage("clean + quality gate", gated.count())

      // 2. exact dedup (md5 digest groupBy — survivors)
      val exact = Dedup.exactKeep(gated)
      stage("exact dedup", exact.count())

      // 3. near-dup clustering, keep each cluster's min doc_id
      val kept = Dedup.nearDupKeep(exact, numHashes = 32, rowsPerBand = 4,
        k = 5, threshold = 0.5)
      stage("near-dup keep", kept.count())

      // 4. decontaminate against a "benchmark" (here: the highest-id docs
      // as a stand-in eval set; production passes the real benchmark table)
      val benchmark = exact.orderBy(col("doc_id").desc).limit(20).select("text")
      val clean = kept.join(
        Dedup.decontaminate(kept, benchmark, n = 5)
          .filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id"))
      stage("decontaminated", clean.count())

      // 5. model-based quality filter (linear scorer, stand-in weights)
      val scored = TextAnalysis.scoreLinear(clean, dim = 1024, seed = 42L)
        .filter(col("keep"))
        .join(clean, Seq("doc_id"))
      stage("model quality filter", scored.count())

      // 6. pack into fixed-budget training sequences, counting tokens
      // with the loadable BPE tokenizer (demo merges; production loads
      // its trained table via Bpe.loadMerges)
      val packed = Packing.packSequences(scored, budget = 512,
        tokenCount = Some(graft.functions.Bpe.tokenCount(col("text"))))
      val nSeqs = packed.agg(max("seq_end")).as[Long].head() + 1
      stage("packed (512 BPE-tok seqs)", nSeqs)

      // 7. train/val/test folds (layout-independent, engine-replayable)
      val folded = Xval.foldMasksVal(
        Xval.md5Kfold(packed, 4, "doc_id"), 4,
        valFrac = 0.1, valKey = "doc_id", seed = 7)
      val train0 = Xval.xvalSet(folded, "train", 0).count()
      val val0 = Xval.xvalSet(folded, "val", 0).count()
      val test0 = Xval.xvalSet(folded, "test", 0).count()
      stage("fold 0 train/val/test", train0)
      println(s"FOLD0 train=$train0 val=$val0 test=$test0")
      println("PIPELINE OK")
    }
    spark.stop()
  }
}
