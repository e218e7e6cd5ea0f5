package graft

import graft.ops.TimeSeries

/** Boundary pins for the time-series shapes (SURVEY §2.14's lesson:
  * every comparison boundary the sf data can't reliably reach gets a
  * crafted fixture BEFORE the oracle is trusted):
  *  - ohlc: same-tick open/close ties resolve by id; an event exactly ON
  *    a bar edge belongs to the NEW bar (pmod floor).
  *  - mergeIntervals: touching intervals (start == prev end) MERGE;
  *    islands use the running-max end, so one long interval swallows
  *    several later short ones that lag-1 logic would split.
  *  - gapFillForward: spine spans [min_day, max_day] per entity, filled
  *    days carry the last observed value and filled=1.
  *  - dedupTemporal: an event at EXACTLY gapUs after the previous one
  *    stays in the burst (strict >, the sessionize convention).
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("ohlc: one bar per (bar, series); open/close are first/last by (ts, id)") {
    val ev = Seq(
      // bar 0 (barUs=100): open tie at t=10 → id 1 wins open; close at t=90
      (1L, 10L, "a", 5.0), (2L, 10L, "a", 7.0), (3L, 90L, "a", 1.0),
      // t=100 sits exactly ON the bar edge → bar 100, alone
      (4L, 100L, "a", 4.0),
      // other series untouched
      (5L, 20L, "b", 2.0)
    ).toDF("event_id", "t_us", "event_type", "value")
    val res = TimeSeries.ohlc(ev, "event_type", "event_id", "t_us", "value", barUs = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(res === Map(
      (0L, "a") -> ((5.0, 1.0, 7.0, 1.0, 3L)),
      (100L, "a") -> ((4.0, 4.0, 4.0, 4.0, 1L)),
      (0L, "b") -> ((2.0, 2.0, 2.0, 2.0, 1L))))
  }

  test("mergeIntervals: touching merge; running-max end swallows later shorts") {
    val iv = Seq(
      // [0,100] swallows [10,20] and [30,40]; [100,110] TOUCHES → merges too
      (1L, 10L, 0L, 100L), (1L, 20L, 10L, 20L), (1L, 30L, 30L, 40L),
      (1L, 40L, 100L, 110L),
      // gap of 1 tick → new island
      (1L, 50L, 111L, 120L),
      // second key independent
      (2L, 60L, 0L, 5L)
    ).map { case (u, id, s, e) => (u, id, s, e) }
      .toDF("user_id", "event_id", "s_us", "e_us")
    val res = TimeSeries.mergeIntervals(iv, "user_id", "event_id", "s_us", "e_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(res === Map(
      (1L, 1L) -> ((0L, 110L, 4L)),
      (1L, 2L) -> ((111L, 120L, 1L)),
      (2L, 1L) -> ((0L, 5L, 1L))))
  }

  test("gapFillForward: spine covers min..max day, fills carry last value") {
    val DayUs = 86400000000L
    val ev = Seq(
      // user 1: observations on day 0 (two events, sum 3.0) and day 3
      (1L, 0L * DayUs + 5L, 1.0), (1L, 0L * DayUs + 6L, 2.0),
      (1L, 3L * DayUs + 1L, 9.0),
      // user 2: single day — spine of length 1, nothing filled
      (2L, 7L * DayUs, 4.0)
    ).toDF("user_id", "t_us", "value")
    val res = TimeSeries.gapFillForward(ev, "user_id", "t_us", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(res === Map(
      (1L, 0L) -> ((3.0, 0L)),
      (1L, 1L) -> ((3.0, 1L)),
      (1L, 2L) -> ((3.0, 1L)),
      (1L, 3L) -> ((9.0, 0L)),
      (2L, 7L) -> ((4.0, 0L))))
  }

  test("anomalyZScore: self-exclusion, warm-up drop, zero-variance null") {
    import graft.ops.TimeSeries
    // key "a": 7 flat days (x=10), then a spike day 107 — baseline is the
    // flat window (sd=0 → null z, no flag), then day 8's spike makes day
    // 9's baseline non-flat
    val rows = (0L to 6L).map(i => ("a", i, 10L)) ++ Seq(
      ("a", 7L, 107L),  // sd=0 baseline → z null, flag 0 (can't score)
      ("a", 8L, 10L)    // baseline now {10x6, 107}: sd > 0 → scored
    ) ++ (0L to 3L).map(i => ("b", i, 5L)) // < win+1 days → all dropped
    val res = TimeSeries.anomalyZScore(rows.toDF("k", "day", "x"),
        "k", "day", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)),
          r.getLong(4)))).toMap
    assert(res.keySet === Set(("a", 7L), ("a", 8L)))
    assert(res(("a", 7L)) === ((null, 0L)))
    // day 8 baseline: 6×10 + 107 → m = 167/7, sd > 0; x=10 is below mean
    val (z8, flag8) = res(("a", 8L))
    assert(z8 != null && z8.doubleValue() < 0)
    assert(flag8 === 0L) // |10 - 23.857| ≈ 13.9 < 2sd (sd ≈ 33.9)
  }

  test("dedupTemporal: exact-gap stays in burst (strict >); keeper is first by (ts, id)") {
    val gap = 100L
    val ev = Seq(
      // burst 0: t=0 keeper, t=100 is EXACTLY gap after → same burst,
      // t=150 chains (gap 50) → same burst
      (1L, "a", 10L, 0L), (1L, "a", 11L, 100L), (1L, "a", 12L, 150L),
      // t=251 is 101 > gap after 150 → new burst
      (1L, "a", 13L, 251L),
      // same tick as keeper, higher id → absorbed, id 10 still keeper
      (1L, "a", 14L, 0L),
      // different type partitions independently
      (1L, "b", 15L, 0L)
    ).toDF("user_id", "event_type", "event_id", "t_us")
    val res = TimeSeries.dedupTemporal(ev, Seq("user_id", "event_type"),
        "event_id", "t_us", gapUs = gap)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(res === Map(
      (1L, "a", 0L) -> ((10L, 0L, 4L)),
      (1L, "a", 1L) -> ((13L, 251L, 1L)),
      (1L, "b", 0L) -> ((15L, 0L, 1L))))
  }
}
