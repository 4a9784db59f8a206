package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Engine-side 10× gate for the exact containment join where the DuckDB
  * pairwise replay is intractable (50k docs → 2.5G directed pairs):
  * (1) precision+values — every emitted directed pair re-verified
  * against the STRING 12-shingle sets (independent of the digest
  * pipeline);
  * (2) recall screens — (a) every exact-duplicate pair (identical
  * text) must appear in BOTH directions with containment 1.0;
  * (b) C(a→b) ≥ J(a,b) always, so every Jaccard-join pair at the same
  * threshold must appear in both directions — a miss would prove the
  * containment prefix filter dropped a true pair.
  */
object ContainmentCrossCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-containment-xcheck")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val tau = 0.9
    val docs = Tables.documents(spark, dir)
    val out = Dedup.containmentJoin(docs, tau)
    // (1) values: string-set containment on the emitted pairs must agree
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 12).as("sh"))
    val verified = out
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("_sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("_sb")), "id_b")
      .withColumn("_i", size(array_intersect(col("_sa"), col("_sb"))))
      .withColumn("_c", col("_i").cast("double") / size(col("_sa")))
    val bad = verified.filter(col("_c") =!= col("containment") ||
      col("_c") < tau || col("_i") =!= col("inter"))
    // (2a) exact duplicates ⇒ both directions at containment 1.0
    val dup = docs.select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("_d"))
    val dupPairs = dup.as("a").join(dup.as("b"),
        col("a._d") === col("b._d") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val missedDup = dupPairs.join(out.select("id_a", "id_b"),
      Seq("id_a", "id_b"), "anti")
    // (2b) C ≥ J: every Jaccard-τ pair must be present in both directions
    val jac = Dedup.setSimJoin(docs, tau).select(col("id_a"), col("id_b"))
    val jacBoth = jac.union(jac.select(col("id_b").as("id_a"),
      col("id_a").as("id_b")))
    val missedJac = jacBoth.join(out.select("id_a", "id_b"),
      Seq("id_a", "id_b"), "anti")
    println(s"[xcheck] pairs=${out.count()} badValues=${bad.count()} " +
      s"dupPairs=${dupPairs.count()} missedDup=${missedDup.count()} " +
      s"jacPairs=${jacBoth.count()} missedJac=${missedJac.count()}")
    spark.stop()
  }
}
