package graft.tools

import graft.{SparkEntry, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev-only stage timing for the q56 near-dup pipeline. */
object ProfileQ56 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession("profile-q56")
    spark.sparkContext.setLogLevel("WARN")
    def docs = Tables.documents(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm the scan + JIT
    docs.count()
    time("exactKeep.count")(Dedup.exactKeep(docs).count())
    val uniq = Dedup.exactKeep(docs)
    val cands = time("minhashCandidates build+cnt") {
      val c = Dedup.minhashCandidates(uniq, 32, 4, 5, 0.5, collapseExact = false)
      c.count(); c
    }
    println(s"[profile] n_pairs=${cands.count()} n_docs=${docs.count()}")
    val clustered = time("clusterPairs driver path")(Dedup.clusterPairs(cands))
    time("clusterPairs distributed")(
      Dedup.clusterPairs(cands, driverMaxEdges = 0).count())
    time("survivor anti-join count") {
      val losers = clustered.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      uniq.join(losers, Seq("doc_id"), "anti").count()
    }
    time("full q56 second run")(
      SparkEntry.queries("q56_neardup_keep")(spark, dir).count())
    spark.stop()
  }
}
