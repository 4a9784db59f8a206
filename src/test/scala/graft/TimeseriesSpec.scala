package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Timeseries

/** Daily-grid resample + forward fill: span bounds, gap filling, the
  * per-day max statistic, and single-day keys.
  */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: days 1, 2, 5 — gaps on 3 and 4 carry day-2's max
    (1L, ts("2024-03-01 10:00:00"), 10.0),
    (1L, ts("2024-03-02 09:00:00"), 5.0),
    (1L, ts("2024-03-02 17:30:00"), 7.5),
    (1L, ts("2024-03-05 23:59:59"), 1.0),
    // user 2: a single active day
    (2L, ts("2024-03-10 12:00:00"), 3.0))
    .toDF("user_id", "ts", "value")

  test("grid spans first..last day per key; gaps forward-fill the last max") {
    val got = Timeseries.gapFillDaily(events)
      .orderBy("user_id", "day")
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd"),
        col("value"), col("n_events"), col("is_gap"))
      .as[(Long, String, Double, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-03-01", 10.0, 1L, false),
      (1L, "2024-03-02", 7.5, 2L, false), // max of 5.0 and 7.5
      (1L, "2024-03-03", 7.5, 0L, true),  // gap: carries day 2
      (1L, "2024-03-04", 7.5, 0L, true),
      (1L, "2024-03-05", 1.0, 1L, false),
      (2L, "2024-03-10", 3.0, 1L, false))) // single-day span: one row
  }

  test("no rows outside any key's own span; first row is never a gap") {
    val res = Timeseries.gapFillDaily(events)
    assert(res.count() == 6)
    val firsts = res.orderBy("user_id", "day")
      .groupBy("user_id").agg(min("day").as("d"))
      .join(res, Seq("user_id"))
      .filter(col("day") === col("d"))
    assert(firsts.filter(col("is_gap")).count() == 0)
  }
}
