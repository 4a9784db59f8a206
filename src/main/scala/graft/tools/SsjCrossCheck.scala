package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Engine-side 10× gate for the exact set-similarity join where the
  * DuckDB pairwise replay is intractable (50k docs → 1.25G pairs):
  * (1) precision+values — every emitted pair re-verified against the
  * STRING 12-shingle sets (independent of the digest pipeline);
  * (2) recall screen — every MinHash-discovered pair at the same
  * threshold must be in the output (LSH can only under-report, so a
  * miss here would prove the prefix filter dropped a true pair).
  */
object SsjCrossCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-ssj-xcheck")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val docs = Tables.documents(spark, dir)
    val out = Dedup.setSimJoin(docs, tau = 0.8)
    val outPairs = out.select(col("id_a"), col("id_b"), col("jaccard"))
    // (1) values: string-set jaccard on the emitted pairs must agree
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 12).as("sh"))
    val verified = outPairs
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("_sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("_sb")), "id_b")
      .withColumn("_i", size(array_intersect(col("_sa"), col("_sb"))))
      .withColumn("_j", col("_i").cast("double") /
        (size(col("_sa")) + size(col("_sb")) - col("_i")))
    val bad = verified.filter(col("_j") =!= col("jaccard") || col("_j") < 0.8)
    // (2) recall: minhash-verified pairs at >= 0.8 must all be present
    val mh = Dedup.minhashCandidates(docs, numHashes = 64, rowsPerBand = 4,
      k = 12, threshold = 0.8, collapseExact = false)
    val mhTrue = Dedup.jaccardVerify(docs, mh.select("id_a", "id_b"), k = 12)
      .filter(col("jaccard") >= 0.8)
    val missed = mhTrue.join(outPairs.select("id_a", "id_b"),
      Seq("id_a", "id_b"), "anti")
    println(s"[xcheck] pairs=${outPairs.count()} badValues=${bad.count()} " +
      s"mhTrue=${mhTrue.count()} missedByPrefix=${missed.count()}")
    spark.stop()
  }
}
