package graft

import org.apache.spark.sql.functions._
import graft.graph.ConnectedComponents
import graft.ops.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hash sample is layout-independent (same subset after repartition)") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.hashSample(docs, "doc_id", 32)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 32)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // ~32/256 = 12.5% with binomial slack on a small corpus
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.04 && frac < 0.25, s"sample fraction $frac implausible")
  }

  test("hash sample plan is a pure scan filter — no shuffle") {
    val plan = Sampling.hashSample(Tables.documents(spark, sf), "doc_id", 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("sample membership is stable under corpus growth (bucket property)") {
    val docs = Tables.documents(spark, sf)
    val full = Sampling.hashSample(docs, "doc_id", 32)
      .select("doc_id").as[Long].collect().toSet
    val half = Sampling.hashSample(docs.filter(col("doc_id") % 2 === 0), "doc_id", 32)
      .select("doc_id").as[Long].collect().toSet
    // removing rows never changes surviving rows' membership
    assert(half == full.filter(_ % 2 == 0))
  }

  test("stratified sample: per-stratum rates, default fallback, no shuffle") {
    val docs = Tables.documents(spark, sf)
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang",
        rates = Map("en" -> 64), defaultBuckets = 16)
      .select("doc_id").as[Long].collect().toSet
    // membership recomputed independently from (bucket, lang)
    val withB = docs.select(col("doc_id"), col("lang"),
        Sampling.hashBucket(col("doc_id")).as("b"))
      .as[(Long, String, Int)].collect()
    val expect = withB.collect {
      case (id, lang, b) if b < (if (lang == "en") 64 else 16) => id
    }.toSet
    assert(got == expect)
    assert(expect.nonEmpty)
    // both strata sides must be represented for the test to mean anything
    val langs = withB.filter(r => expect(r._1)).map(_._2).toSet
    assert(langs.contains("en") && langs.exists(_ != "en"))
    val plan = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 64), 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sampling must not shuffle:\n$plan")
  }

  test("leakage-free split: no near-dup component straddles train/eval") {
    // synthetic clusters: docs 0-2 one component, 3-4 another, 5+ singletons
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L))
      .toDF("node", "component")
    val docs = spark.range(0, 50).select(col("id").as("doc_id"))
    val got = Sampling.assignSplits(docs, "doc_id", clusters, evalBuckets = 128)
    val spansPerComponent = got.groupBy("component")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(spansPerComponent == 0)
    // cluster members share the bucket of their component label
    val m = got.filter(col("component") === 0L)
      .select("bucket").distinct().as[Int].collect()
    assert(m.length == 1)
    // both splits are populated at a half/half bucket threshold
    assert(got.select("split").distinct().count() == 2)
  }

  test("split over real CC clusters matches per-pair check end to end") {
    val docs = Tables.documents(spark, sf)
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
    val cc = ConnectedComponents.run(pairs, "doc_a", "doc_b")
    val split = Sampling.assignSplits(docs, "doc_id", cc, evalBuckets = 128)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    val badPairs = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
      .count { case (a, b) => split(a) != split(b) }
    assert(badPairs == 0, s"$badPairs near-dup pairs straddle the split")
  }

  test("mixEpochs repeats each source by its weight with 1..f epoch tags") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "source")
    val got = Sampling.mixEpochs(docs, "doc_id", "source",
        Map("a" -> 3, "b" -> 2))
      .as[(Long, String, Long)].collect().toSet
    val expect = Set(
      (1L, "a", 1L), (1L, "a", 2L), (1L, "a", 3L),
      (2L, "a", 1L), (2L, "a", 2L), (2L, "a", 3L),
      (3L, "b", 1L), (3L, "b", 2L),
      (4L, "c", 1L))
    assert(got == expect)
  }

  test("weighted sample is layout-independent and weight-monotone") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = spark.range(1, 2001).toDF("id")
      .withColumn("w", (col("id") % 10) + 1)
    val a = Sampling.weightedSample(df, "id", col("w"), k = 100)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedSample(df.repartition(13), "id", col("w"), k = 100)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "subset depends on partition layout")
    // weight-monotone: doubling every weight halves every race key, so
    // the selected SET is invariant under uniform weight scaling …
    val c = Sampling.weightedSample(df, "id", col("w") * lit(2), k = 100)
      .collect().map(_.getLong(0)).toSeq
    assert(a === c, "selection not invariant under uniform weight scaling")
    // … while heavier rows are favored: the weight-10 decile must beat
    // its 10%-uniform share in a weight-proportional draw
    val heavy = df.filter(col("w") === 10).count().toDouble
    val heavyInSample = a.count(id => id % 10 == 9)
    assert(heavyInSample > 10, s"weight-10 rows under-selected: $heavyInSample")
  }

  test("weighted sample plans per-partition heaps (TakeOrderedAndProject)") {
    val p = SparkEntry.queries("sample_weighted")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }
}
