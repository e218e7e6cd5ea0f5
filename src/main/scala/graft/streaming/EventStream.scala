package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface — the streaming form of the batch event
  * operators (events_window / sessionize keys). The reference is batch-
  * only (SURVEY.md §2.9), so this is an extension: the same transforms
  * compiled against `readStream` sources with event-time watermarks.
  *
  * The transforms are DataFrame→DataFrame and identical in shape to the
  * batch keys, so correctness is checked by running them over a bounded
  * stream (memory sink, processAllAvailable) and comparing to the batch
  * result — see StreamingSpec.
  */
object EventStream {

  /** Tumbling hourly window with late-data tolerance. Input needs an
    * event-time `t` TimestampType column (convert epoch-nanos longs with
    * `timestamp_micros(ts div 1000)` as the batch key does). */
  def hourlyTypeCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("t", watermark)
      .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("v"))

  /** Sliding 15-minute window advanced every 5 minutes — the overlap case
    * (each event lands in 3 windows). */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("t", watermark)
      .groupBy(window(col("t"), "15 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** Session windows with a 30-minute gap, per user — the streaming-native
    * form of the batch `sessionize` key (session_window fuses the gap
    * logic into state management instead of lag/cumsum). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("t", watermark)
      .groupBy(session_window(col("t"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Streaming OHLC bars — the streaming form of the `events_ohlc` key:
    * open/close as lexicographic (event-time, id) struct min/max inside
    * the windowed aggregation, exactly as in batch
    * ([[graft.ops.TimeSeries.ohlc]]). Struct min/max is a commutative
    * monoid, so the incremental state merge across micro-batches is the
    * same fold as the batch partial-combine — stream ≡ batch holds
    * structurally (spec-asserted bar for bar). */
  def ohlcBars(events: DataFrame, idCol: String = "event_id",
               valueCol: String = "value",
               watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("t", watermark)
      .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
      .agg(
        min(struct(col("t"), col(idCol), col(valueCol))).as("__o"),
        max(struct(col("t"), col(idCol), col(valueCol))).as("__c"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("bar_start"), col("event_type"),
        col(s"__o.$valueCol").as("open"), col(s"__c.$valueCol").as("close"),
        col("high"), col("low"), col("n"))

  /** Streaming CDC compaction — the streaming form of the `cdc_apply`
    * key ([[graft.ops.Relational.cdcCompact]]). The lexicographic
    * struct-max on the unique sequence is a commutative monoid, so the
    * per-key streaming state IS the batch partial-aggregate: micro-batch
    * arrival order, batch boundaries and replays cannot change the
    * fixpoint (spec-asserted against the batch operator). The tombstone
    * filter runs on the emitted rows — in update mode a key whose last
    * op becomes a delete simply stops being emitted, which is the
    * standard changelog-consumer contract (the sink owns retraction).
    * State per key is one (seq, op, payload) struct — bounded by live
    * keys, not by log length. */
  def cdcLatest(ops: DataFrame, keyCol: String = "user_id",
                seqCol: String = "event_id", opCol: String = "op",
                deleteOp: String = "D"): DataFrame = {
    val payload = ops.columns.filterNot(
      Set(keyCol, seqCol, opCol, "t").contains).toSeq
    val packed = struct((col(seqCol) +: col(opCol) +: payload.map(col)): _*)
    ops.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_ops"), max(packed).as("last"))
      .filter(col(s"last.$opCol") =!= deleteOp)
      .select(col(keyCol) +: col("n_ops") +:
        col(s"last.$seqCol").as("last_seq") +:
        payload.map(c => col(s"last.$c").as(c)): _*)
  }

  /** Streaming exact dedup — the streaming form of the `dedup_exact` key.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * key's event time falls behind the watermark, so state is bounded by
    * (watermark × arrival rate) instead of growing with the all-time key
    * count — the only viable form for an unbounded ingest feed. Re-sent
    * events (at-least-once sources, replayed files) inside the tolerance
    * window are emitted exactly once. */
  def dedupEvents(events: DataFrame, keyCol: String = "event_id",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("t", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-static enrichment join: each micro-batch left-joins the
    * (small) static dimension, explicitly broadcast — stateless, no
    * watermark, no shuffle of the stream side. The streaming analog of
    * the batch broadcast dim join in `entry`. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: each purchase paired with the same
    * user's clicks from the preceding `window`. Both sides are streams,
    * so each buffers rows in join state; the event-time range condition
    * plus the watermarks lets Spark evict state once the watermark passes
    * a row's join horizon — state is bounded by (window + watermark) ×
    * arrival rate, never by history. Without the range condition this
    * join would be unbounded-state and must not ship. */
  def purchaseClickJoin(events: DataFrame, window: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("t").as("click_t"))
      .withWatermark("click_t", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("t").as("purchase_t"))
      .withWatermark("purchase_t", watermark)
    purchases.join(clicks,
        col("click_user") === col("user_id") &&
        col("click_t") <= col("purchase_t") &&
        col("click_t") >= col("purchase_t") - expr(s"INTERVAL $window"))
      .select("purchase_id", "user_id", "purchase_t", "click_id", "click_t")
  }
}
