package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Isolates the sentence-count regex split's share of q212's
  * readability scan (the r15 verdict's remaining HOF-split candidate,
  * `TextAnalysis.readability`): times the full readability projection
  * vs the same projection with the split replaced by a constant, on
  * the same corpus. If the delta is a large share, the split earns
  * the TokenCountWs byte-run-kernel treatment; if not, the decision
  * to leave it is recorded with this number.
  */
object ProfileQ212Split {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val spark = Tables.localSession("graft-profile-q212")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val t = coalesce(col("text"), lit(""))
    val nS = size(filter(split(lower(t), "[.!?]+"),
      s => s.rlike("[a-z0-9]"))).cast("long")
    def run(label: String, sentCol: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = docs
          .withColumn("_rd_ws", graft.operators.TextAnalysis.words(t))
          .select(col("doc_id"),
            size(col("_rd_ws")).cast("long").as("n_words"),
            sentCol.as("n_sentences"),
            graft.plans.GraftExtensions.syllableSumNative(col("_rd_ws"))
              .as("n_syllables"))
        val n = df.agg(sum("n_sentences"), sum("n_syllables")).collect()(0)
        println(f"[q212split] $label%-10s run$i t=${(System.nanoTime() - t0) / 1e9}%7.2f s sums=$n")
      }
    }
    run("with", nS)
    run("without", lit(1L))
    spark.stop()
  }
}
