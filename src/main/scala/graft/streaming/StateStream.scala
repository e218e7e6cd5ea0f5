package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state on the `transformWithState` API — Spark 4's
  * successor to `flatMapGroupsWithState` (which `GraphStream`/
  * `TextStream` cover): typed per-key state objects from a
  * `StatefulProcessorHandle`, timers, TTL, and RocksDB-backed storage.
  *
  * Operator: per-user running (event count, value cents) — the simplest
  * monoid, so the stream ≡ batch proof is exact: after the last
  * micro-batch, each user's LATEST update row must equal the batch
  * groupBy. Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`), which is the
  * 100 TB-appropriate choice anyway: state lives off-heap and spills,
  * where the default HDFS-backed store keeps every key on-heap.
  */
class UserTotalsProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState("totals",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues)
      : Iterator[(Long, Long, Long)] = {
    var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
    rows.foreach { case (_, c) => n += 1; cents += c }
    state.update((n, cents))
    Iterator.single((key, n, cents))
  }
}

object StateStream {

  /** (user_id, n_events, cents) — one updated row per user per
    * micro-batch (Update mode); the latest row per user is the running
    * total. Works identically on a batch DataFrame for the ≡ proof. */
  def userTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("u"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "cents")
  }
}
