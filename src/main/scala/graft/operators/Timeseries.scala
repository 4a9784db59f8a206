package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of an event stream: align each key's
  * observations onto a fixed calendar grid and carry the last
  * observation forward across gaps (the "resample + ffill" idiom of
  * every time-series feature pipeline; dabstract-style sensor datasets
  * do the same when aligning irregular annotation streams onto frame
  * grids — cf. reference dataset/abstract.py's time-aligned meta).
  *
  * Scale shape: the per-(key, bucket) pre-aggregation is one partial-
  * agg'd shuffle of slim rows; the grid explodes per KEY (bounded by
  * that key's own span — never a global cross join); the forward-fill
  * window partitions by key, so no partition-less window exists in the
  * plan. Grid cells are date arithmetic; the filled value is
  * `max(value)` per cell — an order-independent (hence deterministic)
  * bucket statistic.
  */
object Timeseries {

  /** Daily grid + forward fill. Output one row per (key, day) from the
    * key's first to last event day: (keyCol, day, value = max event
    * value that day carried forward across empty days, n_events,
    * is_gap). Keys see only their own span, so a key active for one
    * day emits one row.
    */
  def gapFillDaily(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val daily = Dedup.materialize(events
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        col(valCol).cast("double").as("_v"))
      .groupBy(keyCol, "day")
      .agg(max("_v").as("_day_v"), count(lit(1)).as("_n")))
    val grid = daily.groupBy(keyCol)
      .agg(min("day").as("_d0"), max("day").as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day")))
          .as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("_day_v"), ignoreNulls = true).over(w).as("value"),
        coalesce(col("_n"), lit(0L)).as("n_events"),
        col("_day_v").isNull.as("is_gap"))
  }
}
