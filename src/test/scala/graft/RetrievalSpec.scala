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

  test("k truncates per query independently") {
    val res = Retrieval.bm25TopK(docs,
      Seq(1L -> "window", 2L -> "spark hash"), k = 1)
    assert(res.count() == 2)
    assert(res.groupBy("query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 1L))
  }
}
