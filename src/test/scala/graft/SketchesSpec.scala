package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.functions.BloomMightContain
import graft.ops.Sketches

/** Exactness proofs for the sketch-composed operators: the sketches are
  * approximate, but the OPERATORS built on them must be exact.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("bitmapDistinct equals exact count(distinct) incl. negatives and bucket straddles") {
    // keys straddle bitmap buckets (32768-wide), repeat, and go negative
    val rows = Seq.tabulate(5000) { i =>
      ("g" + (i % 3), (i * 7919L % 90000L) - 20000L)
    } ++ Seq(("g0", 1L), ("g0", 1L), ("g1", 32768L), ("g1", 32769L))
    val df = rows.toDF("g", "k")
    val got = Sketches.bitmapDistinct(df, "g", "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g").agg(countDistinct("k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("BloomMightContain has no false negatives; codegen equals interpreted") {
    val keys = (0L until 2000L).map(_ * 104729L % 1000003L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(keys.size, 0.01)
    keys.foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probeOf = (c: org.apache.spark.sql.Column) =>
      ColumnShim.column(BloomMightContain(bos.toByteArray, ColumnShim.expression(c)))
    val df = keys.toDF("k")
    // no false negatives: every inserted key probes true (codegen path)
    assert(df.filter(!probeOf(col("k"))).count() === 0)
    // interpreted path (eval) agrees with the codegen path on a mixed set
    val expr = BloomMightContain(bos.toByteArray,
      ColumnShim.expression(lit(0L)))
    val mixed = (keys ++ (2000000L until 2002000L)).toDF("k")
    val viaCodegen = mixed.withColumn("m", probeOf(col("k")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    mixed.collect().foreach { r =>
      val k = r.getLong(0)
      assert(expr.test(k) === viaCodegen(k), s"codegen/interp disagree on $k")
    }
  }

  test("plan guards: bitmap path aggregates without Expand; bloom probe sits in the scan-side Filter") {
    val df = (0L until 1000L).map(k => ("g" + (k % 3), k)).toDF("g", "k")
    // level 1 plans as SortAggregate (bitmap_construct_agg's binary
    // buffer is not hash-aggregable) but still partial-aggregates
    // map-side; level 2 (the popcount sum) is a HashAggregate. The
    // load-bearing assertion is NO Expand — the count-distinct rewrite
    // this operator replaces would introduce one.
    val bitmapPlan = Sketches.bitmapDistinct(df, "g", "k")
      .queryExecution.executedPlan.toString
    assert(bitmapPlan.contains("HashAggregate") &&
      !bitmapPlan.contains("Expand"), bitmapPlan.take(800))
    assert(bitmapPlan.contains("bitmap_construct_agg") ||
      bitmapPlan.toLowerCase.contains("bitmapconstructagg"), bitmapPlan.take(800))

    // parquet-backed fact: over a LocalRelation the optimizer executes
    // the probe at plan time (ConvertToLocalRelation) and no Filter
    // node survives to assert on
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomplan").toString
    (0L until 1000L).toDF("fk").write.parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = (0L until 1000L by 7L).toDF("dk")
    val plan = Sketches.bloomPrunedSemi(fact, "fk", dim, "dk")
      .queryExecution.executedPlan.toString
    // the probe must appear as a Filter condition (scan side), i.e.
    // BEFORE the semi join in the plan tree
    assert(plan.contains("graft_might_contain"), plan.take(1200))
    val filterIdx = plan.indexOf("graft_might_contain")
    val joinIdx = plan.indexOf("LeftSemi")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"probe not below the semi join:\n${plan.take(1200)}")
  }

  test("misraGriesHeavy equals the full groupBy HAVING on skewed data") {
    // zipf-ish skew + a long tail, shuffled across partitions; k small
    // enough that summaries evict constantly
    val rnd = new scala.util.Random(3)
    val rows = rnd.shuffle(
      (1 to 8).flatMap(h => Seq.fill(400 / h)(s"hot$h")) ++
        (0 until 3000).map(i => s"tail${i % 1500}"))
    val df = rows.toDF("w").repartition(7)
    val k = 10
    val got = Sketches.misraGriesHeavy(df, "w", k)
      .as[(String, Long)].collect().toMap
    val n = rows.size.toLong
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * (k + 1) > n).toMap
    assert(got === want)
    assert(want.nonEmpty) // the fixture actually has heavy hitters
  }

  test("bloomPrunedSemi is exact regardless of false positives") {
    // fpp cranked high so false positives certainly occur; the exact
    // verify join must erase them
    val fact = (0L until 5000L).map(k => (k, k % 7)).toDF("fk", "payload")
    val dim = (0L until 5000L by 13L).toDF("dk")
    val got = Sketches.bloomPrunedSemi(fact, "fk", dim, "dk", fpp = 0.5)
      .select("fk").as[Long].collect().sorted
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("fk").as[Long].collect().sorted
    assert(got === want)
  }
}
