package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins for event-time tables (SURVEY §2.3: "as-of joins
  * via union+window or range-join").
  *
  * [[Asof.join]] uses the union+window formulation: instead of a non-equi
  * join (which Spark plans as a broadcast nested loop, quadratic per
  * key), both tables are unioned and a per-key running `last(ignoreNulls)`
  * carries the latest right-side value forward onto each left row. Cost:
  * one shuffle on the key + one sort — linear, skew-bounded, AQE-friendly.
  * This is the 100 TB-safe way to do point-in-time lookups.
  */
object Asof {

  /** For each left row, attach the latest right row with
    * `right.timeCol <= left.timeCol` per `key`. Value columns must not
    * clash with left columns (project/rename first). `tiebreak` orders
    * right rows at equal timestamps (highest wins), making the result
    * deterministic.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tiebreak: Option[String] = None): DataFrame = {
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_t", col(leftTime))
    val r = right.select((col(key) +: col(rightTime).as("_rt") +:
        valueCols.map(col) ++: tiebreak.toSeq.map(c => col(c).as("_tb"))): _*)
      .withColumn("_side", lit(0))
      .withColumn("_t", col("_rt"))
      .drop("_rt")
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left at the same timestamp (side 0 < 1), so a
    // right value stamped exactly at t is visible to the left row at t
    val order: Seq[Column] = col("_t") +: col("_side") +:
      tiebreak.map(_ => col("_tb")).toSeq
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(u) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .drop("_side", "_t", "_tb")
  }

  /** Nearest-event as-of join with tolerance (pandas `merge_asof
    * direction='nearest'`): for each left row, the right row (per key)
    * minimizing |Δt|, ties broken BACKWARD (the earlier right row),
    * null when the nearest is further than `toleranceUs`. Times are
    * epoch-µs longs.
    *
    * Same linear union+window discipline as [[join]] run in both
    * directions: a backward pass (running last over preceding rows) and
    * a forward pass (running first over following rows) carry the
    * nearest candidate time each way, then one row-local comparison
    * picks the side. Cost: one shuffle on the key + one sort, reused by
    * both window frames — never a non-equi join.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String,
      leftTimeUs: String, rightTimeUs: String,
      toleranceUs: Long): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_t", col(leftTimeUs))
    val r = right.select(col(key), col(rightTimeUs).as("_t"))
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_rt", when(col("_side") === 0, col("_t")))
    // right rows order before left at the same µs (side 0 < 1): a right
    // event exactly at t is "backward-visible" to a left row at t (Δ=0)
    val ord = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
    val back = ord.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = ord.rowsBetween(0, Window.unboundedFollowing)
    u
      .withColumn("_bt", last(col("_rt"), ignoreNulls = true).over(back))
      .withColumn("_ft", first(col("_rt"), ignoreNulls = true).over(fwd))
      .filter(col("_side") === 1)
      .withColumn("_db", when(col("_bt").isNotNull, col("_t") - col("_bt")))
      .withColumn("_df", when(col("_ft").isNotNull, col("_ft") - col("_t")))
      .withColumn("nearest_us",
        when(col("_db").isNotNull && col("_db") <= toleranceUs &&
          (col("_df").isNull || col("_db") <= col("_df")), col("_bt"))
        .when(col("_df").isNotNull && col("_df") <= toleranceUs, col("_ft")))
      .drop("_side", "_t", "_rt", "_bt", "_ft", "_db", "_df")
  }

  /** Interval containment join optimized by time-binning: right intervals
    * `[startCol, endCol]` are exploded onto the bins they overlap, the
    * join becomes equi on (key, bin) + an exact containment filter — a
    * shuffle on short keys instead of a nested-loop non-equi join.
    * `binWidth` in the time columns' units; intervals are assumed
    * bounded (≤ ~1000 bins each — log-guarded by the explode size).
    */
  def binnedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    val l = left.withColumn("_bin", (col(leftTime) / binWidth).cast("long"))
    val r = right.withColumn("_bin",
      explode(sequence((col(startCol) / binWidth).cast("long"),
        (col(endCol) / binWidth).cast("long"))))
    // each left row carries exactly one bin, so a (left, interval) pair
    // can only meet once — no post-join dedup needed
    l.join(r, Seq(key, "_bin"))
      .filter(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .drop("_bin")
  }
}
