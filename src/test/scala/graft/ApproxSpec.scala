package graft

import org.apache.spark.sql.functions._

/** The approximate/sketch surface a 100 TB engine leans on when exact
  * answers stop being worth their shuffle: each sketch probed against its
  * exact twin with the PUBLISHED error contract, not a vibes tolerance —
  * a regression in sketch wiring (wrong column, wrong seed handling,
  * accidental row duplication) breaks these bounds immediately.
  */
class ApproxSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct is within the configured rsd of exact") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).as[Long].head()
    val approx = o.agg(approx_count_distinct(col("o_custkey"), 0.02))
      .as[Long].head()
    // 0.02 rsd → allow 5 sigma before calling it broken
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }

  test("count-min sketch never undercounts; overcount bounded by eps·N") {
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.tokenize(col("text"))).as("tok"))
    val total = toks.count()
    val eps = 0.001
    val cms = toks.stat.countMinSketch("tok", eps = eps, confidence = 0.99, seed = 42)
    val exact = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(20)
      .as[(String, Long)].collect()
    exact.foreach { case (tok, n) =>
      val est = cms.estimateCount(tok)
      assert(est >= n, s"CMS undercounted '$tok': $est < $n")
      assert(est <= n + (eps * total).toLong * 3,
        s"CMS overcount for '$tok' beyond 3·eps·N: $est vs $n (N=$total)")
    }
  }

  test("percentile_approx lands within the accuracy rank window of exact") {
    val li = Tables.lineitem(spark, sf)
    val acc = 100 // guarantees rank error ≤ N/acc
    val n = li.count()
    val approx = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)))
      .as[Double].head()
    // rank of the approx answer must be within N/acc of the true median rank
    val rankOfApprox = li.filter(col("l_extendedprice") <= approx).count()
    assert(math.abs(rankOfApprox - n / 2.0) <= n.toDouble / acc + 1,
      s"approx median $approx sits at rank $rankOfApprox of $n")
  }

  test("bloom filter has no false negatives and a bounded false-positive rate") {
    val o = Tables.orders(spark, sf)
    val bloom = o.stat.bloomFilter("o_orderkey", expectedNumItems = 20000, fpp = 0.01)
    val keys = o.select("o_orderkey").as[Long].collect()
    assert(keys.forall(bloom.mightContain), "bloom filter false negative")
    val absentHits = (1 to 20000).count(i => bloom.mightContain(-i.toLong))
    assert(absentHits <= 20000 * 0.01 * 3, s"fpr too high: $absentHits/20000")
  }
}
