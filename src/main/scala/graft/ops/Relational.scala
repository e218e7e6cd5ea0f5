package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator helpers shared by the declared query keys.
  *
  * Cross-engine float determinism: a parallel double sum is not
  * bit-reproducible (partition fold order differs between engines and even
  * between runs), so any aggregate the oracle hash-checks must avoid
  * accumulating rounding error.  Monetary columns in the testdata are on
  * the 0.01 grid (verified), so we sum EXACT integer cents and divide once
  * at the end — both engines then produce the identical double.  This also
  * holds at 100 TB: long sums don't lose precision below 2^63 cents.
  */
object Relational {

  /** Exact integer sum of a fixed-point column scaled by 10^scale.
    * `round(c * 10^scale)` lands exactly on an integer (inputs are on the
    * grid; fp error ~1e-9 ≪ 0.5), so the cast is lossless. */
  def fixedPointSum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * lit(f)).cast("long"))
  }

  /** Deterministic money sum: cent-exact, emitted as a 2dp double. */
  def moneySum(c: Column): Column =
    round(fixedPointSum(c, 2) / lit(100.0), 2)

  /** Deterministic mean: exact integer numerator / exact count. */
  def fixedPointAvg(c: Column, scale: Int, digits: Int): Column =
    round(fixedPointSum(c, scale).cast("double") /
      (count(lit(1)) * lit(math.pow(10, scale))), digits)

  /** Epoch-nanos long column (how we read TIMESTAMP(NANOS) parquet) →
    * epoch micros, exactly — `div` is INTEGER division; a plain `/` would
    * roundtrip through double, and an ns epoch ~1.7e18 is not exactly
    * representable as double. */
  def nanosColToMicros(colName: String): Column = expr(s"$colName div 1000")

  /** Two-phase SALTED aggregation — the skew pattern for keys whose row
    * count dwarfs a single task (at 100 TB a hot key otherwise pins one
    * reducer): spread each key over `buckets` salt partitions, partial-
    * aggregate, then combine. Correct for any commutative monoid; use
    * exact-integer values (fixedPointSum) so the two-phase double sum
    * stays reproducible. `saltSrc` must vary WITHIN a key (any row-level
    * column) — salt derived from it is deterministic, unlike rand(). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                saltSrc: Column, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSrc), lit(buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("salted_sum"))

  /** Gap-based sessionization over an event stream — the batch analog of
    * streaming session windows.  A new session starts when the gap to the
    * previous event of the same user exceeds `gapUs` microseconds.
    * All arithmetic in exact integer micros for oracle parity.
    *
    * Scale: one shuffle on user_id (the window partition); session ids are
    * per-user running sums, so no global coordination. Skewed users are the
    * hazard at 100 TB — mitigate upstream with AQE skew handling.
    */
  def sessionize(events: DataFrame, userCol: String, idCol: String,
                 tsNanosCol: String, gapUs: Long): DataFrame = {
    val tUs = expr(s"$tsNanosCol div 1000").as("t_us")
    val w = Window.partitionBy(userCol).orderBy("t_us", idCol)
    val flagged = events
      .select(col(userCol), col(idCol), tUs)
      .withColumn("new_session",
        when(col("t_us") - lag("t_us", 1).over(w) > gapUs, 1).otherwise(0))
    flagged
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id").cast("long").as("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min("t_us").as("start_us"),
           max("t_us").as("end_us"))
  }

  /** INCREMENTAL MATERIALIZED-VIEW maintenance: absorb a row-level
    * change feed into a standing count/sum aggregate WITHOUT touching
    * the base table. `mv` holds `groupCols ++ (n, sumCols*)`; `changes`
    * is a CDF frame (rows + `_change_type`) carrying ONLY logical
    * changes — the caller filters out rewrite commits
    * (optimize/compact/z-order surface their output as op-tagged
    * inserts with no matching deletes, which would double-count).
    *
    * The algebra is the classic signed-delta IVM for commutative
    * monoids: insert/update_postimage weigh +1, delete/update_preimage
    * weigh −1; partial-aggregate the delta, merge with the MV by
    * summing, and DROP groups whose support reaches zero (the subtlety
    * naive implementations miss — a fully-deleted group must vanish
    * from the view, not linger as a zero row).
    *
    * Scale: cost is |delta| + |MV| — one shuffle over the delta (with
    * map-side combine) and one over the MV-sized merge; the 100 TB base
    * table is never read. AVG/derived measures recompute from (sum, n)
    * at read time; MIN/MAX are NOT maintainable this way (deletes can't
    * be unwound from a max) — those need a recompute or a sketch. */
  def mvRefresh(mv: DataFrame, changes: DataFrame, groupCols: Seq[String],
                sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(lit("mvRefresh: unknown _change_type "),
        col("_change_type"))).cast("long")) // fail loud, never mis-weigh
    val deltaAggs = sum(sign).as("n") +:
      sumCols.map(c => sum(sign * col(c)).as(c))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val mergeAggs = sum(col("n")).as("n") +:
      sumCols.map(c => sum(col(c)).as(c))
    mv.select((groupCols :+ "n") ++ sumCols map col: _*)
      .unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .filter(col("n") > 0)
  }

  /** MERGE / upsert: apply a `changes` batch to a `current` snapshot by
    * key — matched keys take the changed row, unmatched changes insert,
    * untouched current rows persist; each output row is tagged with its
    * action. The payload travels as ONE struct per side so a match is
    * atomic per row (the as-of join lesson: per-column coalesce would
    * stitch fields from both versions).
    *
    * Scale: one equi-shuffle full outer join — the canonical SMJ; with
    * the snapshot bucketed on the key (sources/Warehouse bucketed
    * tables) the snapshot side needs no exchange at all, which is how a
    * nightly 100 TB MERGE stays bounded by the batch size, not the
    * table. Both inputs must be unique per key (standard MERGE
    * precondition; violations surface as row-count growth).
    */
  def mergeUpsert(current: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    require(current.columns.sameElements(changes.columns),
      s"schema mismatch: ${current.columns.mkString(",")} vs ${changes.columns.mkString(",")}")
    val payload = current.columns.filterNot(_ == keyCol)
    def pack(df: DataFrame, as: String) =
      df.select(col(keyCol).as("__k"), struct(payload.map(col): _*).as(as))
    pack(current, "__cur").join(pack(changes, "__new"), Seq("__k"), "full")
      .select(col("__k").as(keyCol),
        // the WHOLE struct, never per-column coalesce: a change row with
        // a legitimately-null field must yield that null, not a stitched
        // hybrid of old and new versions
        coalesce(col("__new"), col("__cur")).as("__row"),
        when(col("__new").isNotNull && col("__cur").isNotNull, "update")
          .when(col("__cur").isNull, "insert")
          .otherwise("keep").as("action"))
      .select(col(keyCol) +: payload.map(c => col(s"__row.$c").as(c))
        :+ col("action"): _*)
  }

  /** Snapshot diff — the dataset-versioning primitive: classify every
    * key as added / removed / changed between two snapshots of the same
    * schema, comparing the WHOLE non-key payload as one struct (the
    * [[mergeUpsert]] discipline — per-column comparison would miss a
    * field going null). Unchanged keys (the overwhelming majority of a
    * 100 TB nightly diff) are dropped BEFORE any downstream work, so
    * the output is bounded by the churn, not the table. One full-outer
    * equi-join on the key; with both snapshots bucketed on it (the
    * WarehouseSpec layout) the join co-locates with no exchange.
    *
    * Struct equality is null-safe per Spark SQL semantics (`<=>` over
    * fields), so a field changing to/from null reports as `changed`.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String): DataFrame = {
    require(before.columns.sameElements(after.columns),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val payload = before.columns.filterNot(_ == keyCol)
    def pack(df: DataFrame, as: String) =
      df.select(col(keyCol).as("__k"), struct(payload.map(col): _*).as(as))
    pack(before, "__old").join(pack(after, "__new"), Seq("__k"), "full")
      .withColumn("change_type",
        when(col("__new").isNull, "removed")
          .when(col("__old").isNull, "added")
          .when(!(col("__old") <=> col("__new")), "changed"))
      .filter(col("change_type").isNotNull)
      .select(col("__k").as(keyCol), col("change_type"),
        col("__old"), col("__new"))
  }

  /** SCD2 MAINTENANCE: apply a changes batch (at most one change row
    * per key — latest-wins resolved upstream) to a historized dimension:
    * current rows whose attribute differs CLOSE at the change time and
    * a new current row OPENS; unchanged/matching keys pass through;
    * unseen keys INSERT as current. The nightly dimension-update
    * companion to [[scd2]] (which builds history from scratch) — at
    * 100 TB one never rebuilds the dimension, one applies deltas.
    *
    * Inputs: dim (key, attr, valid_from, valid_to, is_current);
    * changes (key, attr, t_us). One equi-shuffle left join + an
    * anti-join on the (small) batch side. */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val c = changes.select(col(keyCol),
      col("attr").as("__new_attr"), col("t_us").as("__t"))
    val cur = dim.join(c, Seq(keyCol), "left")
    val isReal = col("is_current") && col("__new_attr").isNotNull &&
      col("__new_attr") =!= col("attr")
    val closed = cur.select(col(keyCol), col("attr"), col("valid_from"),
      when(isReal, col("__t")).otherwise(col("valid_to")).as("valid_to"),
      (col("is_current") && (col("__new_attr").isNull ||
        col("__new_attr") === col("attr"))).as("is_current"))
    val opened = cur.filter(isReal)
      .select(col(keyCol), col("__new_attr").as("attr"),
        col("__t").as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    val inserted = c.join(dim.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      .select(col(keyCol), col("__new_attr").as("attr"),
        col("__t").as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
    closed.unionByName(opened).unionByName(inserted)
  }

  /** SCD type-2 dimension build: collapse an event stream into validity
    * intervals [valid_from, valid_to) per entity — one row per VALUE
    * CHANGE of `attrCol`, `valid_to` null on the current row. The
    * standard warehouse historization the reference's batch world never
    * had.
    *
    * Two window passes share ONE (entity, ts) sort: change detection
    * (lag) and interval close (lead) use the same window spec, so
    * Catalyst plans a single Exchange+Sort. All times exact integer
    * micros. Ties on ts break by `idCol` — deterministic end to end.
    */
  /** Changelog compaction (Debezium-style CDC apply): reduce a stream of
    * keyed upsert/delete operations to the latest surviving state per
    * key. `seqCol` totally orders operations on a key (a log offset or
    * unique event id); rows whose LAST operation is `deleteOp` vanish.
    *
    * Shape: one hash aggregation — `max(struct(seq, op, payload…))` is a
    * lexicographic max on the unique seq, i.e. max_by, so Catalyst
    * partial-aggregates map-side and the shuffle carries one candidate
    * row per (key, partition), NOT the changelog. The window-sort
    * formulation (`row_number() … ORDER BY seq DESC`) would shuffle and
    * sort every operation; at a 100 TB changelog the agg form wins on
    * both bytes moved and spill behavior. Out-of-order and multi-batch
    * arrival commute into the same result (max is a monoid — spec-pinned
    * by shuffled-input equality).
    */
  def cdcCompact(changelog: DataFrame, keyCol: String, seqCol: String,
                 opCol: String, deleteOp: String = "D"): DataFrame = {
    val payload = changelog.columns.filter(c =>
      c != keyCol && c != seqCol && c != opCol).toSeq
    val packed = struct((col(seqCol) +: col(opCol) +: payload.map(col)): _*)
    changelog.groupBy(keyCol)
      .agg(count(lit(1)).as("n_ops"), max(packed).as("last"))
      .filter(col(s"last.$opCol") =!= deleteOp)
      .select(col(keyCol) +: col("n_ops") +:
        col(s"last.$seqCol").as("last_seq") +:
        payload.map(c => col(s"last.$c").as(c)): _*)
  }

  def scd2(events: DataFrame, entityCol: String, attrCol: String,
           idCol: String, tsNanosCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy("t_us", idCol)
    events
      .select(col(entityCol), col(idCol), col(attrCol).as("attr"),
        expr(s"$tsNanosCol div 1000").as("t_us"))
      .withColumn("chg",
        when(lag("attr", 1).over(w).isNull ||
             lag("attr", 1).over(w) =!= col("attr"), 1).otherwise(0))
      .filter(col("chg") === 1)
      .withColumn("valid_to", lead("t_us", 1).over(w))
      .select(col(entityCol), col("attr"),
        col("t_us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
