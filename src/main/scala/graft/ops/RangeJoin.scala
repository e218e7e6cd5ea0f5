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
}
