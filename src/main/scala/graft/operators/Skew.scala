package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregations (SURVEY "salting for skew").
  *
  * A `groupBy(key).agg(...)` over a key with a few hot values sends each
  * hot key's entire volume to one reducer. Salted two-phase aggregation
  * splits every key into `saltBuckets` sub-keys (uniform map-side spray),
  * partially aggregates, then re-aggregates the partials — the hot key's
  * work spreads over `saltBuckets` tasks and the second shuffle only
  * carries pre-aggregated partials. AQE's skew-join handling covers
  * joins; this covers aggregations, where AQE does not re-split.
  *
  * Correct only for algebraic aggregates (sum/count/min/max — anything
  * with an associative merge); the API takes (partial, merge) pairs.
  */
object Skew {

  /** salted sum/count aggregation: returns `keyCols ++ [sum_<col>, n]`. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum("_psum").as(s"sum_$valueCol"), sum("_pn").as("n"))
  }

  /** General salted two-phase aggregation: `partials` run per
    * (key, salt), `merges` combine partials per key. Each merge must be
    * the associative combiner of its partial (sum↔sum, min↔min, ...).
    */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
