package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the latest right row of the same key
  * with right.ts <= left.ts. Spark has no built-in; the scalable
  * formulation is the UNION + WINDOW trick, not a custom SparkPlan
  * (SURVEY.md §7.3 escalation: compose built-ins first):
  *
  *   union both sides tagged → one shuffle on (key) for the window →
  *   last non-null right-payload over (key ORDER BY ts, side) → keep
  *   left rows.
  *
  * vs the naive alternatives: an inequality join is O(n·m) nested-loop
  * (no equi predicate on time); a per-key sort-merge custom operator
  * would need a SparkPlan. The union-window is ONE hash shuffle + sort —
  * the same cost class as a regular join, and AQE-skew-aware for free.
  *
  * Ties: right rows sort BEFORE left rows at equal ts (`<=` semantics,
  * matching DuckDB/pandas ASOF); callers must de-duplicate the right
  * side per (key, ts) for a well-defined result (both engines are
  * otherwise ambiguous).
  *
  * The right payload travels as ONE struct and the window takes
  * `last(struct)` — the match is atomic per right row. Per-column
  * `last(c, ignoreNulls)` would tear rows: a legitimately-NULL payload
  * column would back-fill from an OLDER right row while the other
  * columns came from the newer one (ADVICE r1). With the struct, a
  * matched right row with null fields yields those nulls verbatim, and
  * only a genuinely absent match yields an all-null payload.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     lookup side (must be unique per (key, ts))
    * @param key       equi key column name (both sides)
    * @param ts        event-time column name (both sides, numeric)
    * @param rightCols right payload columns to carry to matches
    * @return left rows + `rightCols` (null where no right row precedes) */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) ++
        Seq(col("__side"), lit(null).cast(payloadType).as("__r")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(leftCols.map(c =>
          if (c == key || c == ts) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__side"), struct(rightCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("__side")) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__m"): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row of the
    * same key with right.ts >= left.ts (the "next event after" lookup —
    * next maintenance window, next price tick). Pure axis reflection of
    * [[asOf]]: run the backward machinery on the negated timestamp, so
    * the one-shuffle union-window shape — and the tie rule (equal ts
    * matches, rights sort before lefts) — carry over verbatim. `ts`
    * must be numeric (negatable); callers dedupe the right side per
    * (key, ts) exactly as for [[asOf]].
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                  rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__negts", negate(col(ts)))
    val r = right.withColumn("__negts", negate(col(ts)))
    asOf(l, r, key, "__negts", rightCols).drop("__negts")
  }
}
