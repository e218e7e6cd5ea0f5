package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without an equi key — the second operator
  * Spark lacks natively (a bare inequality join plans as a broadcast
  * nested loop: O(n·m) compares).
  *
  * Bucketized formulation: quantize the axis into `bucketWidth` cells;
  * each point lands in ONE bucket, each interval explodes into the
  * buckets it overlaps (ceil(len/width)+1 rows). The join becomes
  * bucket-EQUI (hash shuffle, AQE-aware) + an exact residual filter.
  * No pair can be emitted twice (a point has one bucket), so no distinct
  * is needed. At 100 TB pick bucketWidth ≈ median interval length: the
  * interval blow-up stays ~2× while each bucket's candidate set shrinks
  * by the axis cardinality.
  */
object RangeJoin {

  /** @param points    df with `pointCol` (numeric axis value)
    * @param intervals df with `loCol`/`hiCol` (inclusive bounds)
    * @return all (point row ++ interval row) pairs with lo <= p <= hi */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / lit(bucketWidth)).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / lit(bucketWidth)).cast("long"),
        floor(col(hiCol) / lit(bucketWidth)).cast("long"))))
    p.join(i, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: all (a, b) pairs with
    * `[aLo, aHi] ∩ [bLo, bHi] ≠ ∅` (closed bounds), i.e.
    * `aLo <= bHi AND bLo <= aHi` — the time-range join Spark plans as a
    * broadcast nested loop if written directly.
    *
    * Both sides explode into the buckets they cover, the join is
    * bucket-equi, and the exact predicate filters residues. Because BOTH
    * sides explode, an overlapping pair would meet in every shared
    * bucket; instead of a `distinct` over the output (a second full
    * shuffle), each pair is CLAIMED by exactly one bucket — the first
    * bucket both intervals inhabit, `max(floor(aLo/W), floor(bLo/W))` —
    * so emission is unique by construction. Same 100 TB tuning rule as
    * [[pointInInterval]]: `bucketWidth` ≈ median interval length keeps
    * the explode factor ~2× while bounding per-bucket candidates.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      aLo: String, aHi: String, bLo: String, bHi: String,
                      bucketWidth: Double): DataFrame = {
    def bkt(c: String) = floor(col(c) / lit(bucketWidth)).cast("long")
    val a = left.withColumn("__abkt0", bkt(aLo))
      .withColumn("__bucket", explode(sequence(col("__abkt0"), bkt(aHi))))
    val b = right.withColumn("__bbkt0", bkt(bLo))
      .withColumn("__bucket", explode(sequence(col("__bbkt0"), bkt(bHi))))
    a.join(b, "__bucket")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__bucket") === greatest(col("__abkt0"), col("__bbkt0")))
      .drop("__bucket", "__abkt0", "__bbkt0")
  }
}
