package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Proofs that Catalyst's RUNTIME filters engage on this engine's layouts
  * — the two mechanisms that, at 100 TB, turn a join into a fraction of a
  * scan instead of a full one:
  *
  *  - '''Dynamic partition pruning''': joining a partitioned fact on its
  *    partition column against a filtered dim prunes fact DIRECTORIES at
  *    runtime from the dim's join keys — the archive-sized scan reads
  *    only the matching partitions, and the dim's broadcast is REUSED as
  *    the pruning subquery (no extra job).
  *  - '''Bloom-filter runtime filter''': for a selective shuffle join,
  *    the small side's join keys become a bloom filter applied map-side
  *    on the big side BEFORE the shuffle — non-matching rows never leave
  *    the scan stage, which is the difference between shuffling 100 TB
  *    and shuffling the ~matching slice.
  *
  * Both asserted on executed plans with results checked against the
  * unfiltered reference (a runtime filter must never change semantics).
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val c = spark.conf
    val saved = kvs.map { case (k, _) => k -> c.getOption(k) }
    try { kvs.foreach { case (k, v) => c.set(k, v) }; body }
    finally saved.foreach { case (k, o) =>
      o.fold(c.unset(k))(c.set(k, _)) }
  }

  test("join on the partition column prunes fact partitions at runtime (DPP)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Warehouse.writePartitioned(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_returnflag"),
      dir, "l_returnflag")
    val fact = spark.read.parquet(dir)
    // the PartitionPruning rule only fires when the dim side carries a
    // SELECTIVE predicate over a real scan — a filtered LocalRelation is
    // constant-folded before the rule sees it, so the dim must round-trip
    // through parquet (which is the realistic star-schema shape anyway)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
      .toDF("flag", "label").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("label") === "returned")

    // tiny-data stats would estimate no pruning benefit; force the
    // decision the 100 TB layout would get on real sizes
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10") {
      val q = fact.join(dim, fact("l_returnflag") === dim("flag"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      val got = q.collect().head
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning subquery in PartitionFilters:\n${plan.take(2500)}")
      val ref = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
        .agg(count(lit(1)), sum("l_quantity")).collect().head
      assert(got.getLong(0) == ref.getLong(0) && got.getDouble(1) == ref.getDouble(1))
    }
  }

  test("selective shuffle join injects a bloom filter on the big side") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val big = Tables.lineitem(spark, sf)
      val small = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      def agg(j: DataFrame) = j.agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 6).as("qty"))
      val q = agg(big.join(small, big("l_orderkey") === small("o_orderkey")))
      val got = q.collect().head
      val plan = q.queryExecution.executedPlan.toString
      // the filter pair in the executed plan: bloom_filter_agg builds the
      // filter from the small side; might_contain applies it on the big
      // side BELOW its shuffle exchange
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no bloom runtime filter on the application side:\n${plan.take(2500)}")
      // semantics: identical to the same join without runtime filters
      withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val ref = agg(big.join(small, big("l_orderkey") === small("o_orderkey")))
          .collect().head
        assert(got.getLong(0) == ref.getLong(0) && got.getDouble(1) == ref.getDouble(1))
      }
    }
  }
}
