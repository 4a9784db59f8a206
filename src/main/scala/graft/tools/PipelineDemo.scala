package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Packing, Sketches, TextAnalysis, Validation, Xval}

/** Dev tool: the canonical LLM-training-data pipeline, end to end, over
  * the driver testdata — the flow a user of the reference library would
  * assemble from this engine's operators:
  *
  *   documents → one-scan constraint gate (structural failures abort)
  *   → text stats/quality gate → Gopher-rules gate → exact
  *   dedup → MinHash near-dup clustering (keep cluster minimum) →
  *   benchmark decontamination → model-based quality filter → mixture
  *   rebalance to target source weights → context-window chunking →
  *   sequence packing → train/val/test folds → day-2 incremental
  *   ingest against persisted indexes (+ persisted-HLL distinct-count
  *   monitoring across days) → BPE tokenizer trained on the
  *   curated corpus (merges.txt sidecar round-trip) → deterministic
  *   training-shard export with a verifiable manifest
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

      // 0. contract gate before anything downstream touches the shard:
      // the Deequ-style suite folds into ONE scan; a failing STRUCTURAL
      // constraint (missing bodies, duplicate keys, negative lengths)
      // aborts the run instead of silently curating garbage
      val report = Validation.constraintReport(docs,
        Validation.documentSuite(Seq("en", "de", "fr", "es", "zh")))
      val structFailed = report.filter(!col("passed") &&
        col("constraint").isin("complete_text", "unique_doc_id",
          "nonneg_n_chars")).count()
      require(structFailed == 0,
        "structural constraint failed on the incoming shard")
      stage("constraint gate", report.count())

      // 1. line-level C4 cleaning (the test corpus is a token stream, so
      // the terminal-punctuation rule is off), then the document gate
      val cleaned = docs.withColumn("text",
        TextAnalysis.cleanLines(col("text"), minWords = 2,
          requireTerminal = false))
      val gated = Dedup.materialize(cleaned
        .withColumn("q", TextAnalysis.qualityFeatures(col("text")))
        .filter(col("q.n_words") >= 5 && col("q.mean_word_len").between(2, 12))
        .drop("q"))
      stage("clean + quality gate", gated.count())

      // 1b. Gopher-rules gate (integer-ratio compares, scan-speed).
      // The synthetic corpus is 10-99-word token streams drawn from a
      // query-engine vocabulary, so the 50-word floor (r_word_count) and
      // the English-stopword rule (r_stop) are waived here; production
      // gates on `pass`.
      val gophered = Dedup.materialize(gated.join(
        TextAnalysis.gopherRules(gated)
          .filter(col("r_word_len") && col("r_symbol") && col("r_bullet") &&
            col("r_ellipsis") && col("r_alpha"))
          .select("doc_id"),
        Seq("doc_id")))
      stage("gopher-rules gate", gophered.count())

      // 2. exact dedup (md5 digest groupBy — survivors)
      val exact = Dedup.materialize(Dedup.exactKeep(gophered))
      stage("exact dedup", exact.count())

      // 3. near-dup clustering, keep each cluster's min doc_id
      val kept = Dedup.materialize(Dedup.nearDupKeep(exact, numHashes = 32,
        rowsPerBand = 4, k = 5, threshold = 0.5))
      stage("near-dup keep", kept.count())

      // 4. decontaminate against a "benchmark" (here: the highest-id docs
      // as a stand-in eval set; production passes the real benchmark table)
      val benchmark = exact.orderBy(col("doc_id").desc).limit(20).select("text")
      val clean = Dedup.materialize(kept.join(
        Dedup.decontaminate(kept, benchmark, n = 5)
          .filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id")))
      stage("decontaminated", clean.count())

      // 5. model-based quality filter (linear scorer, stand-in weights)
      val scored = Dedup.materialize(TextAnalysis.scoreLinear(clean, dim = 1024,
          seed = 42L)
        .filter(col("keep"))
        .join(clean, Seq("doc_id")))
      stage("model quality filter", scored.count())

      // 5b. rebalance to a target source mixture (upweight the first ten
      // sources 2:1) — integer-exact thresholds, no source upsampled
      val mixture = (0 until 20).map(i =>
        s"src$i" -> (if (i < 10) 2L else 1L)).toMap
      val balanced = Dedup.rebalanceMixture(scored, "source", mixture, seed = 7)
      stage("mixture rebalance", balanced.count())

      // 5c. context-window chunking ahead of packing (overlap win−stride)
      // chunk_uid headroom: with stride 48 a 100k-word Gopher-max doc
      // yields ~2,083 chunks, so 1M ids per doc never collides; the
      // guard turns a silent key collision into a loud failure.
      val chunks = TextAnalysis.chunkByWords(balanced, win = 64, stride = 48)
        .withColumn("chunk_uid",
          when(col("chunk_id") < 1000000L,
            col("doc_id") * 1000000L + col("chunk_id"))
            .otherwise(raise_error(lit("chunk_id >= 1e6: widen chunk_uid"))))
      stage("context chunks (64/48)", chunks.count())

      // 6. pack the chunks into fixed-budget training sequences, counting
      // tokens with the loadable BPE tokenizer (demo merges; production
      // loads its trained table via Bpe.loadMerges)
      val packed = Packing.packSequences(chunks, budget = 512,
        idCol = "chunk_uid", textCol = "chunk_text",
        tokenCount = Some(graft.functions.Bpe.tokenCount(col("chunk_text"))))
      val nSeqs = packed.agg(max("seq_end")).as[Long].head() + 1
      stage("packed (512 BPE-tok seqs)", nSeqs)

      // 7. train/val/test folds (layout-independent, engine-replayable)
      val folded = Xval.foldMasksVal(
        Xval.md5Kfold(packed, 4, "chunk_uid"), 4,
        valFrac = 0.1, valKey = "chunk_uid", seed = 7)
      val train0 = Xval.xvalSet(folded, "train", 0).count()
      val val0 = Xval.xvalSet(folded, "val", 0).count()
      val test0 = Xval.xvalSet(folded, "test", 0).count()
      stage("fold 0 train/val/test", train0)
      println(s"FOLD0 train=$train0 val=$val0 test=$test0")

      // 8. day-2 incremental ingest — the production overnight loop:
      // persist the day-1 digest + signature indexes, screen the next
      // shard against them (re-ingested bodies drop on the digest
      // anti-join, near-variants on the banded signature join — the
      // accumulated corpus is never re-deduped), then fold the novel
      // survivors into the indexes for day 3. Batch-equivalence of this
      // composition is spec-gated (OperatorsSpec "two-day incremental").
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_demo_idx").toString
      Dedup.exactIndex(exact).write.mode("overwrite")
        .parquet(s"$idxDir/exact")
      Dedup.minhashIndex(kept, numHashes = 32, rowsPerBand = 4, k = 5)
        .write.mode("overwrite").parquet(s"$idxDir/minhash")
      // simulated next-day shard, ids above the day-1 range: half
      // re-ingested bodies (exact dups), half lightly edited variants
      val day2 = docs.withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(2)) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" day2 edit"))))
      Dedup.saveBloom(spark,
        Dedup.bloomIndex(Dedup.exactIndex(exact)), s"$idxDir/exact.bloom")
      val exactIdx = spark.read.parquet(s"$idxDir/exact")
      val mhIdx = spark.read.parquet(s"$idxDir/minhash")
      // bloom pre-screen (loaded from its sidecar): digests the filter
      // rules out never reach the anti-join — output ≡ exactKeepAgainst
      val d2exact = Dedup.exactKeepAgainstBloom(
        Dedup.loadBloom(spark, s"$idxDir/exact.bloom"), exactIdx, day2)
      stage("day2 exact screen", d2exact.count())
      val d2kept0 = Dedup.nearDupKeep(d2exact, numHashes = 32,
        rowsPerBand = 4, k = 5, threshold = 0.5)
      val d2novel = d2kept0.join(
        Dedup.minhashCandidatesAgainst(mhIdx, d2kept0, numHashes = 32,
          rowsPerBand = 4, k = 5, threshold = 0.5)
          .select(col("incoming_id").as("doc_id")).distinct(),
        Seq("doc_id"), "anti")
      stage("day2 novel survivors", d2novel.count())
      val exactIdx2 = exactIdx
        .union(Dedup.exactIndex(day2)).distinct()
      stage("updated exact index", exactIdx2.count())

      // 8b. corpus monitoring without re-scanning history: day 1's HLL
      // register table persists as parquet (256 rows); day 2 builds its
      // own and the MERGE (groupBy max over sketch-sized tables)
      // estimates the union's distinct ids — the nightly distinct-count
      // dashboard never touches day-1 bodies again
      val hllGrp = (d: org.apache.spark.sql.DataFrame) =>
        Sketches.hllRegisters(d.withColumn("g", lit("corpus")), Seq("g"), "doc_id")
      hllGrp(docs).write.mode("overwrite").parquet(s"$idxDir/hll_day1")
      val hllMerged = Sketches.hllMerge(
        Seq(spark.read.parquet(s"$idxDir/hll_day1"), hllGrp(day2)), Seq("g"))
      val unionEst = Sketches.hllEstimate(hllMerged, Seq("g"))
        .select("est").as[Long].head()
      stage("union distinct (HLL merge)", unionEst)

      // 9. tokenizer trained ON the curated corpus (the decontaminated
      // dedup survivors — the corpus a production run would train on):
      // learn merges, ship them through the merges.txt sidecar, re-count
      // a sample with the loaded table — the full train → sidecar →
      // tokenize loop over data this very pipeline curated
      val learned = graft.functions.Bpe.train(clean, nMerges = 12)
      stage("BPE merges learned", learned.size)
      val mergesPath = s"$idxDir/trained_merges.txt"
      graft.functions.Bpe.saveMerges(spark,
        learned.map(m => (m._1, m._2)), mergesPath)
      val loadedMerges = graft.functions.Bpe.loadMerges(spark, mergesPath)
      require(loadedMerges == learned.map(m => (m._1, m._2)).toVector,
        "merges sidecar must round-trip in rank order")
      val sampleToks = clean.orderBy("doc_id").limit(50)
        .agg(sum(graft.functions.Bpe.tokenCount(col("text"), loadedMerges)))
        .head().getLong(0)
      stage("tokens (trained BPE, 50 docs)", sampleToks)

      // 10. export the curated corpus as deterministic training shards
      // with a verifiable manifest — the pipeline's last mile
      val manifest = graft.sources.TrainingExport.writeShards(
        clean, s"$idxDir/shards", rowsPerShard = 64, seed = 11)
      val nShards = manifest.count()
      val exported = manifest.agg(sum("n_rows")).head().getLong(0)
      require(exported == clean.count(),
        s"export covered $exported of ${clean.count()} curated docs")
      stage("export shards + manifest", nShards)

      println("PIPELINE OK")
    }
    spark.stop()
  }
}
