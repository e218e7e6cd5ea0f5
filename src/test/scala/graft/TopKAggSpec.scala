package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("g1", 5.0, "a"), ("g1", 9.0, "b"), ("g1", 7.0, "c"), ("g1", 9.0, "aa"),
    ("g1", 1.0, "d"),
    ("g2", 3.0, "x"),
    ("g3", 2.0, "p"), ("g3", 2.0, "q"), ("g3", 2.0, "o"), ("g3", 2.0, "r"))

  test("top-k per group: ordering, ties by tag, truncation, small groups") {
    val got = rows.toDF("g", "v", "tag")
      .groupBy("g")
      .agg(TopKAgg.topK(3, col("v"), col("tag")).as("top"))
      .as[(String, String)].collect().toMap
    assert(got("g1") == "aa,b,c") // 9.0 tie → tag asc; 5.0/1.0 truncated
    assert(got("g2") == "x")      // group smaller than k
    assert(got("g3") == "o,p,q")  // all-tie group → first 3 tags
  }

  test("topk3 is SQL-callable as a registered UDAF") {
    graft.functions.Functions.register(spark)
    rows.toDF("g", "v", "tag").createOrReplaceTempView("topk_rows")
    val got = spark.sql("SELECT g, topk3(v, tag) AS top FROM topk_rows GROUP BY g")
      .as[(String, String)].collect().toMap
    assert(got("g1") == "aa,b,c")
  }

  test("partial aggregation merges correctly across many partitions") {
    val big = (0 until 1000).map(i => ("g", i.toDouble, f"t$i%04d"))
    val one = big.toDF("g", "v", "tag").coalesce(1)
      .groupBy("g").agg(TopKAgg.topK(4, col("v"), col("tag")).as("top"))
      .as[(String, String)].head()._2
    val many = big.toDF("g", "v", "tag").repartition(16)
      .groupBy("g").agg(TopKAgg.topK(4, col("v"), col("tag")).as("top"))
      .as[(String, String)].head()._2
    assert(one == "t0999,t0998,t0997,t0996")
    assert(many == one, "merge() must be partition-count invariant")
  }
}
