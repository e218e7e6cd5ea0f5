package graft

import org.apache.spark.sql.functions._
import graft.ops.DataQuality

/** Pins the profile/checks semantics the sf data can't reach (it has no
  * nulls and no duplicate keys): null counting, distinct-vs-null
  * interaction, uniqueness violation math, and the single-scan plan
  * shape both surfaces promise.
  */
class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String)](
    (1L, "a"), (2L, null), (2L, "b"), (null, "b"), (3L, "c")
  ).toDF("k", "s")

  test("profile counts nulls, excludes them from distinct, stringifies min/max") {
    val res = DataQuality.profile(df, Seq("k" -> col("k"), "s" -> col("s")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    // k: one null, distinct {1,2,3}; s: one null, distinct {a,b,c}
    assert(res === Map(
      "k" -> ((1L, 3L, "1", "3")),
      "s" -> ((1L, 3L, "a", "c"))))
  }

  test("checks: uniqueness = rows - distinct; row predicates count violations; ok flips") {
    val res = DataQuality.checks(df,
        rowViolations = Seq(
          "s_nonnull" -> col("s").isNull,
          "k_positive" -> (col("k") <= 0L)),
        uniqueKeys = Seq("k_unique" -> col("k")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // k_unique: 5 rows - 3 distinct = 2 violations (the null AND the dup
    // both count — a nullable "unique" key is itself a finding)
    assert(res === Map(
      "s_nonnull" -> ((1L, 0L)),
      "k_positive" -> ((0L, 1L)),
      "k_unique" -> ((2L, 0L))))
  }

  test("snapshotDiff: whole-struct null-safe compare; unchanged rows drop") {
    import graft.ops.Relational
    val before = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", null)
    ).toDF("k", "s", "v")
    val after = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 10L),     // unchanged — must NOT appear
      (2L, "b", null),    // field -> null is a CHANGE (null-safe compare)
      (4L, "d", 40L),     // null -> value is a change too
      (5L, "e", 50L)      // added
    ).toDF("k", "s", "v") // 3L removed
    val res = Relational.snapshotDiff(before, after, "k")
      .select(col("k"), col("change_type")).as[(Long, String)]
      .collect().toMap
    assert(res === Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("datasetHash: invariant to order/partitioning, sensitive to any row edit") {
    val df = spark.range(1, 1001).toDF("id")
      .withColumn("s", concat_ws("|", col("id"), lit("x")))
    def fp(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = DataQuality.datasetHash(d, col("s")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val a = fp(df)
    assert(a === fp(df.repartition(17)), "fingerprint depends on layout")
    assert(a === fp(df.orderBy(col("id").desc)), "fingerprint depends on order")
    val edited = df.withColumn("s",
      when(col("id") === 500, lit("500|y")).otherwise(col("s")))
    assert(a._2 !== fp(edited)._2, "single-row edit not detected")
    assert(fp(df.filter(col("id") =!= 500))._1 === 999L)
  }

  test("profile_table and dq_checks plan exactly one scan of orders") {
    for (key <- Seq("profile_table", "dq_checks")) {
      val exec = SparkEntry.queries(key)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val orderScans = exec.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("orders")) => f
      }
      assert(orderScans.size == 1,
        s"$key scans orders ${orderScans.size} times:\n${exec.toString.take(1200)}")
    }
  }

  test("robustOutliers: half-integral medians stay exact; naive-double lockstep") {
    // even group count => median 1050.5 cents and MAD on the .5 grid —
    // the integer-scaled path must agree with a naive double reference
    val vals = Seq(1000L, 1010L, 1050L, 1051L, 1090L, 1101L, 5000L, 980L)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "cents")
    val got = graft.ops.DataQuality.robustOutliers(rows, "grp", "id", "cents")
      .as[(Long, String, Long, Long)].collect().map(_._1).sorted.toSeq
    // naive reference in doubles
    def medD(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val m = medD(vals.map(_.toDouble))
    val mad = medD(vals.map(v => math.abs(v - m)))
    val expect = vals.zipWithIndex
      .filter { case (v, _) => math.abs(v - m) > 2.5 * mad }
      .map(_._2.toLong).sorted
    assert(got === expect)
    assert(got.nonEmpty) // the 5000-cent spike must flag
  }
}
