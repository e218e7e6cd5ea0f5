package graft

import org.apache.spark.sql.functions._

/** Proof that runtime skew handling actually engages — salting
  * (`group_sum_salted`) is the manual fallback, but the first line of
  * defense at 100 TB is AQE's OptimizeSkewedJoin splitting an oversized
  * shuffle partition into parallel sub-reads. This spec builds a join
  * whose left side concentrates ~99% of rows on one key, lowers the skew
  * thresholds to test scale, and asserts (a) the executed plan contains
  * skew-split shuffle reads and (b) the result is identical to the
  * broadcast-join reference (the split must never change semantics). */
class AQESkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("OptimizeSkewedJoin splits the hot partition; results unchanged") {
    val c = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // ~99% of 60k left rows share key 0; a fat payload (kept alive in
      // the output so column pruning can't drop it from the shuffle)
      // makes the hot reduce partition far exceed the lowered threshold.
      // The downstream aggregate is GLOBAL on purpose: a groupBy on the
      // join key would reuse the join's hash partitioning, and AQE
      // (correctly) refuses to skew-split a partitioning that a
      // downstream operator still requires.
      val left = spark.range(0, 60000).select(
        when(col("id") % 100 < 99, 0L).otherwise(col("id")).as("k"),
        concat(lit("x" * 64), col("id")).as("payload"))
      val right = spark.range(0, 1000).select(
        col("id").as("k"), (col("id") * 7).as("w"))

      def agg(j: org.apache.spark.sql.DataFrame) = j.agg(
        count(lit(1)).as("n"), sum(length(col("payload"))).as("pl"),
        sum("w").as("ws"))

      val joined = agg(left.join(right, "k"))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"no skew-split shuffle read in the executed AQE plan:\n$plan")

      // semantics: identical to the broadcast reference (no skew path)
      c.set("spark.sql.autoBroadcastJoinThreshold", "10m")
      val ref = agg(left.join(broadcast(right), "k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.sameElements(ref))
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }
}
