package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Plan-level proof of the two write-time layout levers: partition
  * pruning (the scan lists only matching directories) and bucketed
  * co-located joins (no Exchange on either side). */
class WarehouseSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("compacted sink: file count tracks data size, not writer count") {
    val docs = Tables.documents(spark, sf).repartition(13) // many writers
    val n = docs.count()
    def partFiles(dir: String): Int =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))

    val few = Files.createTempDirectory("graft_compact1").toString
    Warehouse.writeCompacted(docs, few, targetRows = n + 1)
    assert(partFiles(few) == 1, s"expected 1 file for target>rows")

    val five = Files.createTempDirectory("graft_compact5").toString
    Warehouse.writeCompacted(docs, five, targetRows = (n + 4) / 5, knownRows = n)
    val got = partFiles(five)
    assert(got >= 5 && got <= 6, s"expected ~5 files, got $got")
    // round-trip intact
    assert(spark.read.parquet(five).count() == n)
  }

  test("partitioned sink prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    val orders = Tables.orders(spark, sf)
    Warehouse.writePartitioned(orders, dir, "o_orderstatus")

    val back = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = back.queryExecution.executedPlan.toString

    // the filter must reach the file listing, not just the row filter
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      plan.take(1200))
    // and the pruned read returns exactly the directly-filtered rows
    val expected = orders.filter(col("o_orderstatus") === "F").count()
    assert(back.count() === expected)
    // layout sanity: one directory per distinct status
    val statuses = orders.select("o_orderstatus").distinct().count()
    val dirs = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("o_orderstatus="))
    assert(dirs.toLong === statuses)
  }

  test("bucketed tables join with no Exchange on either side") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    Warehouse.writeBucketed(orders, "orders_b", s"$base/orders_b", 4, "o_custkey")
    Warehouse.writeBucketed(customer, "customer_b", s"$base/customer_b", 4, "c_custkey")
    // force the join to consider a shuffle (disable broadcast) so the
    // assertion is about bucketing, not about a small dim fitting in RAM
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ob = spark.table("orders_b"); val cb = spark.table("customer_b")
      val joined = ob.join(cb, ob("o_custkey") === cb("c_custkey"))
        .select("o_orderkey", "c_name")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      assert(!plan.contains("Exchange"), plan.take(1200))
      // co-located join returns the same rows as the plain shuffled join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("replacePartitions overwrites only the arriving partitions (backfill)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_backfill").toString
    Seq((1L, "d1", "old1"), (2L, "d2", "old2"), (3L, "d3", "old3"))
      .toDF("id", "ds", "v")
      .write.partitionBy("ds").parquet(s"$base/t")
    // re-run day 2 with corrected data; days 1 and 3 must survive
    Warehouse.replacePartitions(
      Seq((20L, "d2", "new2")).toDF("id", "ds", "v"), s"$base/t", "ds")
    val got = spark.read.parquet(s"$base/t")
      .select("id", "ds", "v").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "d1", "old1"), (20L, "d2", "new2"), (3L, "d3", "old3")))
    // idempotent: the same backfill again changes nothing
    Warehouse.replacePartitions(
      Seq((20L, "d2", "new2")).toDF("id", "ds", "v"), s"$base/t", "ds")
    assert(spark.read.parquet(s"$base/t").count() == 3)
  }

  test("schema evolution: mergeSchema unifies files written with drifted schemas") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$base/t/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$base/t/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$base/t")
    assert(df.columns.toSet == Set("id", "v", "score", "batch"))
    val got = df.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(9.5))) // old rows null-fill
  }

  test("zorder2 interleaves bits (known values)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("x", "y")
      .select(Warehouse.zorder2(col("x"), col("y"), bits = 10).as("z"))
      .as[Long].collect().toSeq
    // morton(x,y): x bits at even positions, y bits at odd
    def morton(x: Long, y: Long): Long =
      (0 until 10).foldLeft(0L)((a, i) =>
        a | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1)))
    assert(got == Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(3, 5), morton(1023, 1023)))
    assert(got(1) == 1L && got(2) == 2L) // x → even bit, y → odd bit
  }

  test("z-ordered layout bounds BOTH dimensions per file; x-sort only one") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
      .select((col("l_partkey") % 1024).as("x"),
        (col("l_orderkey") % 1024).as("y"), col("l_quantity"))
    val base = Files.createTempDirectory("graft_zorder").toString
    Warehouse.writeZOrdered(li, s"$base/z", files = 8, col("x"), col("y"), bits = 10)
    li.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/plain")
    def boxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .select("x0", "x1", "y0", "y1")
        .as[(Long, Long, Long, Long)].collect()
    // thin-slice pruning probe: how many files would a y = const filter
    // have to open? (min/max row-group stats are exactly these boxes)
    def hits(bs: Array[(Long, Long, Long, Long)]): Int =
      (0 until 1024 by 64).map(v =>
        bs.count { case (_, _, y0, y1) => y0 <= v && v <= y1 }).sum
    val zHits = hits(boxes(s"$base/z"))
    val xHits = hits(boxes(s"$base/plain"))
    // x-sorted files span the full y range → every probe opens every
    // file; z-ordered files cover ~quarter-range y boxes
    assert(zHits < xHits / 2, s"z=$zHits plain=$xHits")
  }
}
