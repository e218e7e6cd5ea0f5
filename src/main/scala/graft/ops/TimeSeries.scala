package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shapes over the event log: bar downsampling, interval
  * coalescing, spine gap-filling, and burst deduplication.
  *
  * All four are single-shuffle plans whose only partition key is the
  * entity (or the bar), never the corpus — the property that matters at
  * 100 TB, where the event log is the biggest table in the lake:
  *
  *  - [[ohlc]] is one hash aggregation keyed by (bar, series); open and
  *    close ride the SAME aggregation as lexicographic struct min/max
  *    (no joins back to the log, no per-bar sorts).
  *  - [[mergeIntervals]] / [[dedupTemporal]] are the gaps-and-islands
  *    window shape: one shuffle on the entity, O(1) state per row.
  *  - [[gapFillForward]] materializes the per-entity day spine with
  *    `sequence` + explode — the spine is bounded by entities × days,
  *    never by events, and forward-fill is a running `last(ignoreNulls)`
  *    inside the same entity partition (no second shuffle).
  *
  * Timestamps are integer microsecond ticks end to end (the sessionize
  * precedent: micros is the finest grid DuckDB's nano-truncating parquet
  * reader can mirror), so every comparison is exact integer math.
  */
object TimeSeries {

  /** OHLC-style bar downsampling: tumbling bars of `barUs` micros per
    * `seriesCol`, with open/close = value at the first/last event of the
    * bar. Determinism: "first/last" is the lexicographic (t_us, id)
    * struct min/max — `idCol` must be unique, so ties at the same tick
    * resolve identically on any engine.
    *
    * One aggregation pass: open/close/high/low/n/sum all reduce in the
    * same hash-agg; partials combine map-side (struct min/max is a
    * commutative monoid), so the shuffle carries one row per
    * (bar, series) per map task — bars × series, not events.
    */
  def ohlc(events: DataFrame, seriesCol: String, idCol: String,
           tsUsCol: String, valueCol: String, barUs: Long): DataFrame = {
    val bar = (col(tsUsCol) - pmod(col(tsUsCol), lit(barUs))).as("bar_us")
    events
      .groupBy(bar, col(seriesCol))
      .agg(
        min(struct(col(tsUsCol), col(idCol), col(valueCol))).as("__o"),
        max(struct(col(tsUsCol), col(idCol), col(valueCol))).as("__c"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        count(lit(1)).as("n"),
        Relational.moneySum(col(valueCol)).as("total"))
      .select(col("bar_us"), col(seriesCol),
        col(s"__o.$valueCol").as("open"),
        col(s"__c.$valueCol").as("close"),
        col("high"), col("low"), col("n"), col("total"))
  }

  /** Coalesce overlapping-or-touching closed intervals per key (the
    * gaps-and-islands shape). A row starts a new island iff its start
    * exceeds the running max end of ALL previous intervals (not just the
    * lag-1 end: an earlier long interval can swallow several later short
    * ones, which lag-1 misses). Touching intervals (start == prev end)
    * MERGE — closed-interval semantics, pinned by spec fixture.
    *
    * One shuffle on `keyCol`; both windows share the same partitioning
    * and sort, so Spark plans a single Sort + two Window ops without a
    * second exchange.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, idCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(startCol, idCol)
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("__new", when(
        col(startCol) > coalesce(prevMaxEnd, lit(Long.MinValue)), 1)
        .otherwise(0))
      // first row of each key: prevMaxEnd is null -> flag 0; island ids
      // still start at 0 because the running sum below starts there.
      .withColumn("island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col(keyCol), col("island").cast("long").as("island"))
      .agg(min(col(startCol)).as("start"),
           max(col(endCol)).as("end"),
           count(lit(1)).as("n_src"))
  }

  /** Per-entity daily spine + forward fill. Aggregates the log to one
    * exact-integer row per (entity, day), explodes the entity's
    * [min_day, max_day] spine, and forward-fills missing days with the
    * last observed value. `filled` marks spine rows that carried no
    * observation. Day = micros div 86_400_000_000 (integer UTC days).
    *
    * Scale: the spine explode is bounded by entities × days — for a
    * 1000-day log that is ~10^3 rows per entity regardless of event
    * volume. The fill window reuses the groupBy's hash partitioning on
    * the entity; only the spine (already aggregated) flows through it.
    */
  def gapFillForward(events: DataFrame, keyCol: String, tsUsCol: String,
                     valueCol: String): DataFrame = {
    val DayUs = 86400000000L
    val daily = events
      .withColumn("day", expr(s"$tsUsCol div $DayUs"))
      .groupBy(col(keyCol), col("day"))
      .agg(Relational.moneySum(col(valueCol)).as("v_day"))
    val spine = daily
      .groupBy(col(keyCol))
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col(keyCol), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine
      .join(daily, Seq(keyCol, "day"), "left")
      .withColumn("v_fill", last(col("v_day"), ignoreNulls = true).over(w))
      .withColumn("filled", col("v_day").isNull.cast("int").cast("long"))
      .drop("v_day")
  }

  /** Trailing-window z-score anomaly detection over a per-key daily
    * series of INTEGER observations: each day scores against the
    * strictly-preceding `win` days (self-exclusion — an anomalous day
    * never inflates its own baseline). Mean/std derive from exact
    * integer moment sums in ONE window pass; the float finish is a
    * fixed op sequence (m = tsum/win, sd = sqrt(greatest(0, tsum2/win
    * − m²))) so any engine computes identical doubles — the stats_agg
    * discipline. Days with fewer than `win` predecessors are dropped
    * (no partial baselines); a zero-variance baseline yields null z and
    * no flag. Integer headroom: |x| ≤ ~3·10⁹·√win keeps x² sums in a
    * long. */
  def anomalyZScore(daily: DataFrame, keyCol: String, dayCol: String,
                    xCol: String, win: Int = 7,
                    threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
    val wt = w.rowsBetween(-win, -1)
    daily
      .withColumn("__rn", row_number().over(w))
      .withColumn("__tsum", sum(col(xCol)).over(wt))
      .withColumn("__tsum2", sum(col(xCol) * col(xCol)).over(wt))
      .filter(col("__rn") > win)
      .withColumn("__m", col("__tsum").cast("double") / win.toDouble)
      .withColumn("__sd", sqrt(greatest(lit(0.0),
        col("__tsum2").cast("double") / win.toDouble - col("__m") * col("__m"))))
      .select(col(keyCol), col(dayCol), col(xCol),
        when(col("__sd") > 0,
          round((col(xCol).cast("double") - col("__m")) / col("__sd"), 6)).as("z"),
        when(col("__sd") > 0 &&
            abs(col(xCol).cast("double") - col("__m")) > lit(threshold) * col("__sd"), 1L)
          .otherwise(0L).as("is_anomaly"))
  }

  /** Burst dedup: collapse runs of same-(key) events closer than `gapUs`
    * to their FIRST event (telemetry retry / double-fire collapse). A
    * burst is a session by another name — an event is kept iff its gap
    * to the previous event of the same key is > `gapUs` (strictly; an
    * exact-gap event is part of the burst, same convention as
    * [[Relational.sessionize]]) or it is the key's first event.
    *
    * Returns one row per KEPT event with the burst size it absorbed.
    * Same one-shuffle island shape as [[mergeIntervals]].
    */
  def dedupTemporal(events: DataFrame, keyCols: Seq[String], idCol: String,
                    tsUsCol: String, gapUs: Long): DataFrame = {
    val kc = keyCols.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(tsUsCol), col(idCol))
    events
      .withColumn("__new", when(
        col(tsUsCol) - lag(col(tsUsCol), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("burst",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kc :+ col("burst").cast("long").as("burst"): _*)
      .agg(min(struct(col(tsUsCol), col(idCol))).as("__k"),
           count(lit(1)).as("n_absorbed"))
      .select(kc ++ Seq(col("burst"),
        col(s"__k.$idCol").as("kept_id"),
        col(s"__k.$tsUsCol").as("kept_ts")) :+ col("n_absorbed"): _*)
  }
}
