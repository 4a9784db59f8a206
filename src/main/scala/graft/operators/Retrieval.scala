package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: BM25 scoring + exact top-k per
  * query (Robertson & Spärck Jones probabilistic relevance framework;
  * the Okapi BM25 formulation with the Lucene-style always-positive
  * idf = ln(1 + (N − df + 0.5)/(df + 0.5))). Curation pipelines use
  * exactly this shape to pull benchmark-adjacent or domain-adjacent
  * documents out of a crawl (targeted decontamination sweeps, DSIR-style
  * proxy retrieval, eval-set neighborhood audits).
  *
  * Determinism discipline: corpus statistics (N, Σdl, per-term df) come
  * from ONE aggregation pass; idf is fixed to integer micro-units
  * (round(ln·10⁶)) so every later arithmetic step is reproducible IEEE
  * double math on identical inputs in any engine; per-document term
  * contributions are folded in sorted-term order so the float sum is
  * order-fixed.
  *
  * Scale shape: queries are a literal handful — their terms ride into
  * the scan as expressions (no join), so scoring is one map-side pass
  * over (id, words). Top-k per query runs as TakeOrderedAndProject
  * (per-partition bounded heaps + driver merge of k) over a
  * checkpointed slim (query_id, id, score) table — the corpus is
  * scored once and never shuffled; nothing ∝ corpus reaches the driver.
  */
object Retrieval {

  /** Tokenize a query string exactly like [[TextAnalysis.words]]. */
  def queryTerms(q: String): Seq[String] =
    q.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).distinct.sorted

  /** BM25 top-k documents per query. `queries`: (query_id, text), small
    * (terms become literals in the scan). Output: (query_id, doc_id,
    * score, rank 1..≤k) — rank by (score desc, id asc); documents
    * matching no query term are not candidates.
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && k >= 1, "bm25TopK needs queries and k >= 1")
    val allTerms: Seq[String] =
      queries.flatMap(q => queryTerms(q._2)).distinct.sorted
    val toks = Dedup.materialize(docs.select(col(idCol),
      coalesce(TextAnalysis.words(col(textCol)),
        array().cast("array<string>")).as("_ws"))
      .withColumn("_dl", size(col("_ws")).cast("long")))
    // one stats pass: N, Σdl, df per term (terms are literals — the agg
    // row is |terms|+2 numbers, nothing else leaves the executors)
    val aggCols: Seq[Column] = sum("_dl").as("sumdl") +:
      allTerms.map(t => sum(when(array_contains(col("_ws"), t), 1L)
        .otherwise(0L)).as(s"df_$t"))
    val statsRow = toks.agg(count(lit(1)).as("n"), aggCols: _*).head()
    val n = statsRow.getAs[Long]("n")
    val sumdl = statsRow.getAs[Long]("sumdl")
    val avgdl = sumdl.toDouble / n
    // Robertson idf, libm-free: (n−df+0.5)/(df+0.5)+1 = 2(n+1)/(2df+1),
    // so round(ln(r)·10⁶) = (L(2n+2) − L(2df+1) + 5·10¹¹) / 10⁶ over
    // the integer log kernel L = lnQ12 (exact 10⁻¹² fixed point, the
    // q199 discipline) — removes the last oracle-allowlisted libm call
    // (r > 1 always, so the difference is nonnegative and the floor
    // division is engine-identical truncation).
    val idfMicro: Map[String, Long] = allTerms.map { t =>
      val df = statsRow.getAs[Long](s"df_$t")
      val d = graft.functions.FixedMath.lnQ12(2L * (n + 1)) -
        graft.functions.FixedMath.lnQ12(2L * df + 1L)
      t -> (d + 500000000000L) / 1000000L
    }.toMap
    // scoring pass: contribution of term t, folded in sorted-term order
    def contrib(t: String): Column = {
      val tf = size(filter(col("_ws"), w => w === t)).cast("double")
      (lit(idfMicro(t).toDouble / 1e6) * (tf * lit(k1 + 1.0))) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("_dl").cast("double") / lit(avgdl))))
    }
    def scoreFor(qText: String): Column =
      queryTerms(qText).map(contrib).foldLeft(lit(0.0))(_ + _)
    val scored = Dedup.materialize(toks.select(col(idCol),
      posexplode(array(queries.map { case (_, qt) => scoreFor(qt) }: _*))
        .as(Seq("_qi", "score")))
      .withColumn("query_id",
        element_at(array(queries.map(q => lit(q._1)): _*), col("_qi") + 1))
      .filter(col("score") > 0.0)
      .select(col("query_id"), col(idCol), col("score")))
    // exact per-query top-k as TakeOrderedAndProject over the slim
    // checkpointed score table — no per-query window over the corpus
    val topk = queries.map { case (qid, _) =>
      scored.filter(col("query_id") === qid)
        .orderBy(col("score").desc, col(idCol))
        .limit(k)
    }.reduce(_ unionAll _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    topk.withColumn("rank", row_number().over(w))
  }
}
