package graft

import org.apache.spark.sql.functions._
import graft.ops.Features

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The portable bucket both engines compute: first md5 byte of the
    * token's UTF-8 string form, mod dim. */
  private def naiveBucket(tok: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = md.digest(tok.getBytes("UTF-8"))(0) & 0xff
    b % dim
  }

  test("hashFeatures matches a naive in-test featurizer on a fixture") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b b b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = Features.hashFeatures(docs, "doc_id", "text", dim = 8)
      .orderBy("doc_id").as[(Long, String)].collect()
    val want = Seq(1L -> "a b a c", 2L -> "b b b", 3L -> "x").map {
      case (id, text) =>
        val counts = text.split("\\s+").filter(_.nonEmpty)
          .groupBy(naiveBucket(_, 8)).view.mapValues(_.length).toSeq.sorted
        id -> counts.map { case (b, c) => s"$b:$c" }.mkString(" ")
    }
    assert(got.toSeq == want)
  }

  test("hashFeatures is layout-independent and respects the dim bound") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = Features.hashFeatures(docs, "doc_id", "text", dim = 64)
      .as[(Long, String)].collect().toMap
    val b = Features.hashFeatures(docs.repartition(13), "doc_id", "text", dim = 64)
      .as[(Long, String)].collect().toMap
    assert(a == b)
    val buckets = a.values.flatMap(_.split(" ")).map(_.split(":")(0).toInt)
    assert(buckets.nonEmpty && buckets.forall(i => i >= 0 && i < 64))
  }

  test("indexLabels ranks by frequency desc with value-asc tie-break") {
    // freq: b=3, a=2, c=2, z=1  →  b:0, a:1, c:2 (tie a/c broken asc), z:3
    val df = Seq("b", "b", "b", "a", "a", "c", "c", "z").toDF("cat")
    val got = Features.indexLabels(df, "cat", "idx")
      .select("cat", "idx").distinct().as[(String, Long)].collect().toMap
    assert(got == Map("b" -> 0L, "a" -> 1L, "c" -> 2L, "z" -> 3L))
  }

  test("indexLabels keeps every input row (inner join on a total mapping)") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    assert(Features.indexLabels(orders, "o_orderpriority", "idx").count() == n)
  }

  test("minMaxScale: exact ppm values, constant-column guard, layout-proof") {
    val df = Seq((1L, 0L, 7L), (2L, 50L, 7L), (3L, 200L, 7L))
      .toDF("id", "v", "k")
    val got = Features.minMaxScale(df, Seq("v", "k"))
      .select("id", "v_ppm", "k_ppm").orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    // (v-0)*1e6 div 200: 0, 250000, 1000000; k constant → 0
    assert(got == Seq((1L, 0L, 0L), (2L, 250000L, 0L), (3L, 1000000L, 0L)))
    val re = Features.minMaxScale(df.repartition(7), Seq("v", "k"))
      .select("id", "v_ppm", "k_ppm").orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(re == got)
  }

  test("minMaxScale truncates toward floor on the ppm grid") {
    // (1-0)*1e6 div 3 = 333333 (not 333334): floor semantics pinned
    val df = Seq((1L, 0L), (2L, 1L), (3L, 3L)).toDF("id", "v")
    val got = Features.minMaxScale(df, Seq("v"))
      .select("id", "v_ppm").orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 333333L), (3L, 1000000L)))
  }
}
