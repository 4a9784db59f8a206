package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 top-k: score parity with a direct driver-side computation of
  * the same formula (micro-idf, sorted-term fold), ranking/tie rules,
  * and the candidate filter (no-term docs are absent).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark window agg window window"),
    (1L, "hash join merge"),
    (2L, "spark spark spark filter scan"),
    (3L, "window"),
    (4L, "nothing relevant here at all"),
    (5L, "")).toDF("doc_id", "text")

  private def bm25Reference(queries: Seq[(Long, String)], k1: Double = 1.2,
      b: Double = 0.75): Map[(Long, Long), Double] = {
    val corpus = docs.as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        (id, t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq)
      }
    val n = corpus.size
    val sumdl = corpus.map(_._2.size.toLong).sum
    val avgdl = sumdl.toDouble / n
    val out = scala.collection.mutable.Map.empty[(Long, Long), Double]
    queries.foreach { case (qid, qt) =>
      val terms = Retrieval.queryTerms(qt)
      corpus.foreach { case (id, ws) =>
        val dl = ws.size.toDouble
        var score = 0.0
        terms.foreach { t =>
          val df = corpus.count(_._2.contains(t)).toLong
          // r11: idf moved onto the integer log kernel (r = 2(n+1)/(2df+1))
          val idfMicro = (graft.functions.FixedMath.lnQ12(2L * (n.toLong + 1)) -
            graft.functions.FixedMath.lnQ12(2L * df + 1L) +
            500000000000L) / 1000000L
          val tf = ws.count(_ == t).toDouble
          score += (idfMicro.toDouble / 1e6 * (tf * (k1 + 1.0))) /
            (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
        }
        if (score > 0.0) out((qid, id)) = score
      }
    }
    out.toMap
  }

  test("scores match the driver-side reference bit-for-bit") {
    val queries = Seq(1L -> "spark window", 2L -> "hash merge")
    val got = Retrieval.bm25TopK(docs, queries, k = 10)
      .select("query_id", "doc_id", "score")
      .as[(Long, Long, Double)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap
    assert(got == bm25Reference(queries))
  }

  test("ranking: higher tf wins; no-term docs absent; ties by doc_id") {
    val res = Retrieval.bm25TopK(docs, Seq(1L -> "spark"), k = 10)
      .orderBy("rank")
      .select("doc_id", "rank").as[(Long, Int)].collect()
    // doc 2 has tf=3 of 'spark', doc 0 has tf=1 — doc 2 ranks first;
    // docs 1/3/4/5 contain no 'spark' and must be absent
    assert(res.map(_._1).toSeq == Seq(2L, 0L))
    assert(res.map(_._2).toSeq == Seq(1, 2))
  }

  test("hybridRrf: both-list docs outrank single-list docs; ranks dense; integer rrf") {
    val rng = new scala.util.Random(236)
    def sentence(seed: String): String =
      (seed * 6) + rng.nextInt(1000).toString
    // doc 0 is the query. doc 10 shares text AND embedding direction
    // (both lists); doc 20 shares only text (lex-only); doc 30 shares
    // only the embedding direction (sem-only); 40.. are noise.
    val qText = "the quick brown fox jumps over the lazy dog repeatedly"
    val hd = Seq(
      (0L, qText), (10L, qText + " indeed"), (20L, qText + " truly"),
      (30L, sentence("unrelated words entirely ")),
      (40L, sentence("different noise payload ")),
      (41L, sentence("other filler sentences ")))
      .toDF("doc_id", "text")
    def vec(dir: Int, eps: Double): Seq[Float] = {
      val v = Array.fill(8)(0.05f); v(dir) = (1.0 + eps).toFloat; v.toSeq
    }
    val he = Seq(
      (0L, vec(0, 0.0)), (10L, vec(0, 0.01)), (30L, vec(0, 0.02)),
      (20L, vec(4, 0.0)), (40L, vec(5, 0.0)), (41L, vec(6, 0.0)))
      .toDF("vec_id", "embedding")
    // topN=2: sem list = {10, 30} (the e0-direction docs), lex list =
    // {10, 20} (the shared-text docs; zero-overlap docs are filtered)
    val got = Retrieval.hybridRrf(hd, he, nQueries = 1, topN = 2, fuseK = 6)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._2)
    assert(got.forall(_._1 == 0L))
    assert(got.map(_._2).toSeq == (1L to got.length))
    // doc 10 is in both lists near the top → must be fused rank 1
    assert(got.head._3 == 10L, s"got ${got.toSeq}")
    val byDoc = got.map(r => r._3 -> r).toMap
    // lex-only doc 20 has no sem_rank; sem-only doc 30 has no lex_rank
    assert(byDoc(20L)._5.nonEmpty && byDoc(20L)._6.isEmpty)
    assert(byDoc(30L)._6.nonEmpty && byDoc(30L)._5.isEmpty)
    // rrf is exactly the integer formula over the recorded ranks
    got.foreach { r =>
      val expect = r._5.map(x => 1000000000L / (60L + x)).getOrElse(0L) +
        r._6.map(x => 1000000000L / (60L + x)).getOrElse(0L)
      assert(r._4 == expect, s"rrf mismatch at ${r._3}")
    }
  }

  test("k truncates per query independently") {
    val res = Retrieval.bm25TopK(docs,
      Seq(1L -> "window", 2L -> "spark hash"), k = 1)
    assert(res.count() == 2)
    assert(res.groupBy("query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 1L))
  }

  test("ndcgAtK: hand-computed integer DCG/IDCG; no-truth query gets NULL") {
    import graft.functions.FixedMath.lnQ12
    def t(rel: Long, r: Long): Long =
      (BigInt(rel) * lnQ12(2L) * 1000000 / lnQ12(r + 1)).toLong
    // q=1: recs [c@1, a@2, x@3]; truth a=3, b=1, c=2 (x absent)
    val recs = Seq((1L, "c", 1L), (1L, "a", 2L), (1L, "x", 3L),
      (2L, "a", 1L)).toDF("q", "item", "rank")
    val truth = Seq((1L, "a", 3L), (1L, "b", 1L), (1L, "c", 2L))
      .toDF("q", "item", "rel")
    val got = graft.operators.Retrieval.ndcgAtK(recs, truth, k = 3)
      .orderBy("q").collect()
    val dcg = t(2, 1) + t(3, 2)
    val idcg = t(3, 1) + t(2, 2) + t(1, 3)
    assert(got(0).getLong(1) == dcg && got(0).getLong(2) == idcg)
    assert(got(0).getLong(3) == BigInt(dcg) * 1000000 / idcg)
    // q=2 has recs but NO truth: dcg 0, idcg 0, ndcg NULL
    assert(got(1).getLong(1) == 0L && got(1).getLong(2) == 0L &&
      got(1).isNullAt(3))
    // perfect ranking: recs = ideal order => ndcg exactly 1e6
    val perfect = Seq((1L, "a", 1L), (1L, "c", 2L), (1L, "b", 3L))
      .toDF("q", "item", "rank")
    val g2 = graft.operators.Retrieval.ndcgAtK(perfect, truth, k = 3)
      .collect().head
    assert(g2.getLong(3) == 1000000L)
  }
}
