package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextAnalysis}

/** The curation decision trace + funnel: the trace's 'kept' set must be
  * EXACTLY the composed pipeline's output (same stages, same order, same
  * seeds), and the funnel must satisfy the conservation invariants every
  * removal-rate table implies.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // text long enough to pass Gopher when wanted; ids span 2 url groups
  // per canonical url and 3 domains so every stage drops something
  private def corpus = {
    val base = "the of and that have with be to " +
      ("spark engine curates large corpora with deterministic rules " * 8)
    Seq(
      (0L, base, "https://www.a.test/x?utm_source=1"),
      (1L, base + "one", "https://a.test/x"), // url dup of 0 (canonical)
      (2L, base, "http://b.test/y"), // exact dup of 0 (a URL-stage survivor)
      (3L, "too short", "https://c.test/z"),  // fails Gopher word count
      (4L, base + "two", "https://blocked.test/w"), // blocklisted domain
      (5L, base + "three", "https://b.test/cap1"),
      (6L, base + "four", "https://b.test/cap2"),
      (7L, base + "five", "https://b.test/cap3"))
      .toDF("doc_id", "text", "url")
  }
  private def blocklist = Seq("blocked.test").toDF("domain")

  test("trace 'kept' ids equal the composed pipeline's survivors") {
    val traced = Curation.trace(corpus, blocklist, maxPerDomain = 2, seed = 3)
    val keptTrace = traced.filter(col("drop_stage") === "kept")
      .select("doc_id").as[Long].collect().sorted
    val afterUrl = Dedup.materialize(Dedup.urlKeep(corpus))
    val afterExact = Dedup.materialize(Dedup.exactKeep(afterUrl))
    val pass = TextAnalysis.gopherRules(afterExact, carry = Seq("url"))
      .filter(col("pass"))
    val keptPipeline = Dedup.capPerDomain(pass, blocklist,
        maxPerDomain = 2, seed = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(keptTrace.sameElements(keptPipeline))
  }

  test("every doc gets the FIRST stage that drops it, in pipeline order") {
    val t = Curation.trace(corpus, blocklist, maxPerDomain = 2, seed = 3)
      .select("doc_id", "drop_stage").as[(Long, String)].collect().toMap
    assert(t(1L) == "url_dup")    // canonical-url dup of 0, dropped first
    assert(t(2L) == "exact_dup")  // body dup of survivor 0
    assert(t(3L) == "quality")
    assert(t(4L) == "domain_block")
    // b.test has 3 quality-passing docs, cap 2: exactly one dies at cap
    val bCap = Seq(5L, 6L, 7L).map(t).count(_ == "domain_cap")
    assert(bCap == 1)
    assert(t(0L) == "kept")
  }

  test("funnel conserves docs and words stage to stage") {
    val traced = Curation.trace(corpus, blocklist, maxPerDomain = 2, seed = 3)
    val f = Curation.funnel(traced).orderBy("stage_ord").collect()
    assert(f.map(_.getAs[String]("stage")).toSeq == Curation.stages)
    val nTotal = corpus.count()
    assert(f.head.getAs[Long]("n_docs_in") == nTotal)
    f.foreach { r =>
      assert(r.getAs[Long]("n_docs_in") ==
        r.getAs[Long]("n_docs_dropped") + r.getAs[Long]("n_docs_kept"))
      assert(r.getAs[Long]("n_words_in") ==
        r.getAs[Long]("n_words_dropped") + r.getAs[Long]("n_words_kept"))
    }
    f.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs_kept") == b.getAs[Long]("n_docs_in"))
      assert(a.getAs[Long]("n_words_kept") == b.getAs[Long]("n_words_in"))
    }
    // final kept = trace's kept rows
    val keptDocs = traced.filter(col("drop_stage") === "kept").count()
    assert(f.last.getAs[Long]("n_docs_kept") == keptDocs)
  }

  test("stageCosts: byte funnel conserves, shares sum to ~1e6, downstream savings arithmetic") {
    val traced = Curation.trace(corpus, blocklist, maxPerDomain = 2, seed = 3)
    val c = Curation.stageCosts(traced).orderBy("stage_ord").collect()
    assert(c.map(_.getAs[String]("stage")).toSeq == Curation.stages)
    // bytes entering stage 1 = total corpus bytes (trace's own n_bytes)
    val totalBytes = traced.agg(sum("n_bytes")).collect().head.getLong(0)
    assert(c.head.getAs[Long]("n_bytes_in") == totalBytes)
    // stage-to-stage conservation: in − dropped = next stage's in
    c.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_bytes_in") - a.getAs[Long]("n_bytes_dropped")
        == b.getAs[Long]("n_bytes_in"))
      assert(a.getAs[Long]("n_docs_in") - a.getAs[Long]("n_docs_dropped")
        == b.getAs[Long]("n_docs_in"))
    }
    // Q6 shares sum to 1e6 up to per-row floor loss (< |stages|)
    val shareSum = c.map(_.getAs[Long]("cost_share_q6")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - Curation.stages.size,
      s"cost shares sum $shareSum")
    // downstream savings = dropped bytes × stages remaining; last stage 0
    c.foreach { r =>
      assert(r.getAs[Long]("saved_downstream_bytes") ==
        r.getAs[Long]("n_bytes_dropped") *
          (Curation.stages.size - r.getAs[Int]("stage_ord")))
    }
    assert(c.last.getAs[Long]("saved_downstream_bytes") == 0L)
  }

  test("empty blocklist and loose cap: only dedup+quality stages drop") {
    val t = Curation.trace(corpus, spark.emptyDataset[String].toDF("domain"),
      maxPerDomain = 1000, seed = 3)
    val byStage = t.groupBy("drop_stage").count()
      .as[(String, Long)].collect().toMap
    assert(!byStage.contains("domain_block"))
    assert(!byStage.contains("domain_cap"))
    assert(byStage("url_dup") == 1L && byStage("exact_dup") == 1L)
  }

  test("greedySetCover: exact greedy vs brute recompute, ties by id, coverage monotone") {
    // trigram universes per doc (words chosen so trigram sets are
    // easy to enumerate): doc text of n words has n-2 trigrams
    val docs = Seq(
      (1L, "a b c d e"),          // trigrams: abc, bcd, cde  (3)
      (2L, "a b c d e f"),        // abc bcd cde def          (4)
      (3L, "x y z w"),            // xyz yzw                  (2)
      (4L, "a b c d e f"),        // duplicate of 2 → gain 0 after 2
      (5L, "p q r"))              // pqr                      (1)
      .toDF("doc_id", "text")
    val got = Curation.greedySetCover(docs, k = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    // greedy: pick 2 (4 new), then 3 (2 new), then 5 (1 new); round 4
    // finds NO doc with uncovered trigrams (docs 1 and 4 are fully
    // covered) → the greedy stops early with 3 picks
    assert(got.map(r => (r._1, r._2, r._3)) ==
      List((1L, 2L, 4L), (2L, 3L, 2L), (3L, 5L, 1L)))
    // covered_total is the running sum and is monotone
    assert(got.map(_._4) == List(4L, 6L, 7L))
  }
}
