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

  test("timeWeightedAvg: hold-until-next weighting, not the arithmetic mean") {
    // user 1: v=10 held 1s, v=0 held 9s → TWA 1.0 (arith mean would be
    // 10/3 with the final sample, which carries no interval at all)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, 2L, ts("2024-01-01 00:00:01"), 0.0),
      (1L, 3L, ts("2024-01-01 00:00:10"), 99.0), // last: no interval
      (2L, 4L, ts("2024-01-01 00:00:00"), 7.0))  // single event: NULL twa
      .toDF("user_id", "event_id", "ts", "value")
    val got = Timeseries.timeWeightedAvg(ev)
      .orderBy("user_id")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 10000000L, Some(1.0)),
      (2L, 1L, 0L, None)))
  }

  test("driftAlerts: sustained shift fires, zero-mean noise does not; ties ordered by event_id") {
    // user 1: flat 0s then a +10 step — drawup accumulates after the step
    val stepped = (1 to 10).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 00:00:$i%02d"), if (i <= 5) 0.0 else 10.0))
    // user 2: alternating ±5 around its own mean 0 — drawup stays ≤ 10·n/… below threshold
    val noise = (1 to 10).map(i =>
      (2L, (100 + i).toLong, ts(f"2024-01-01 00:00:$i%02d"),
        if (i % 2 == 0) 5.0 else -5.0))
    val ev = (stepped ++ noise).toDF("user_id", "event_id", "ts", "value")
    val alerts = Timeseries.driftAlerts(ev, threshold = 8.0)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(alerts.nonEmpty && alerts.forall(_._1 == 1L),
      s"only the stepped user should alert: $alerts")
    // mean of user 1 is 5; after the step each obs adds +5 to the cum:
    // drawup crosses 8 at the 7th observation (cum −25 min, +10 by obs 7)
    assert(alerts.map(_._2).min == 7L)
  }

  test("longestStreak: islands split on gaps; earliest start wins ties") {
    def t(day: Int): Timestamp = new Timestamp(day * 86400000L)
    // user 1: days 1,2,3 then 5,6 → longest 3 starting day 1, 2 islands
    // user 2: days 1,2 and 10,11 → tie of 2: earliest start (1) wins
    // user 3: one day, duplicated events → streak 1, 1 island
    val ev = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6),
      (2L, 1), (2L, 2), (2L, 10), (2L, 11),
      (3L, 7), (3L, 7))
      .map { case (u, d) => (u, t(d)) }.toDF("user_id", "ts")
    val r = Timeseries.longestStreak(ev).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((3L, 1L, 2L)))
    assert(r(2L) == ((2L, 1L, 2L)))
    assert(r(3L) == ((1L, 7L, 1L)))
  }

  test("seasonalBacktest: calendar lags skip gaps; hand-computed MASE; same-day rows pre-sum") {
    import spark.implicits._
    import graft.operators.Timeseries
    // key a, days 1,2,3,4,6,8,9 (5 and 7 missing); day 1 split in two rows
    val df = Seq(("a", 1L, 4.0), ("a", 1L, 6.0), ("a", 2L, 12.0),
      ("a", 3L, 11.0), ("a", 4L, 11.0), ("a", 6L, 14.0),
      ("a", 8L, 10.5), ("a", 9L, 13.0)).toDF("k", "day", "v")
    val r = Timeseries.seasonalBacktest(df, "k", "day", "v", season = 7)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5),
        if (x.isNullAt(6)) None else Some(x.getLong(6))))
    // seasonal: d8←d1 |105000−100000|=5000, d9←d2 |130000−120000|=10000
    // naive: d2←d1 20000, d3←d2 10000, d4←d3 0, d9←d8 25000 (d6,d8 gap)
    // MASE_q6 = ⌊10⁶·15000·4 / (55000·2)⌋ = 545454
    assert(r.toSeq == Seq(
      ("a", 7L, 2L, 4L, 15000L, 55000L, Some(545454L))))
    // a key with no consecutive or season-apart days → NULL mase
    val sparse = Seq(("b", 1L, 5.0), ("b", 3L, 6.0)).toDF("k", "day", "v")
    val rb = Timeseries.seasonalBacktest(sparse, "k", "day", "v", 7)
      .collect().head
    assert(rb.getLong(2) == 0L && rb.getLong(3) == 0L && rb.isNullAt(6))
  }

  test("ewmaChart: exact floorDiv recurrence, spike alerts, first day never alerts") {
    // flat 100s, one 200 spike, flat again: the spike day must alert
    // (|200−100|·4 > 100), the recovery day must NOT re-alert against
    // the lifted chart line only if within 25% — here s_prev = 112
    // (floor((200+700)/8)), |100−112|·4 = 48 ≤ 112 → calm.
    val rows = Seq(
      ("x", "2024-03-01 01:00:00", 100.0),
      ("x", "2024-03-02 01:00:00", 100.0),
      ("x", "2024-03-03 01:00:00", 200.0),
      ("x", "2024-03-04 01:00:00", 100.0),
      ("y", "2024-03-01 01:00:00", 50.0))
      .map { case (k, t, v) => (k, ts(t), v) }
      .toDF("event_type", "ts", "value")
    val got = Timeseries.ewmaChart(rows, alphaDen = 8, relDen = 4)
      .orderBy("event_type", "day")
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val x = got.filter(_._1 == "x")
    // recurrence: 1000000; (1000000+7e6)/8 = 1000000;
    // (2000000+7000000)/8 = 1125000; (1000000+7875000)/8 = 1109375
    assert(x.map(_._3).toSeq ==
      Seq(1000000L, 1000000L, 1125000L, 1109375L))
    assert(x.map(_._4).toSeq == Seq(false, false, true, false))
    // single-day key: no previous level, never alerts
    assert(got.filter(_._1 == "y").map(_._4).toSeq == Seq(false))
  }
}
