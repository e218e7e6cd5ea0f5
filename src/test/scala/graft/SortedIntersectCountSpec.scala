package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.functions.SortedIntersectCount

/** The merge-count expression behind Triangles: codegen and interpreted
  * paths must agree, and the contract edges (null input, empty arrays,
  * disjoint/subset/identical) are pinned. */
class SortedIntersectCountSpec extends SparkTestBase {
  import spark.implicits._

  private def cnt(a: Seq[Long], b: Seq[Long]): Long = {
    val df = Seq((a, b)).toDF("x", "y")
    val c = ColumnShim.column(SortedIntersectCount(
      ColumnShim.expression(col("x")), ColumnShim.expression(col("y"))))
    df.select(c).collect()(0).getLong(0)
  }

  test("merge counts: identical, subset, disjoint, interleaved, empty") {
    assert(cnt(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === 3L)
    assert(cnt(Seq(1L, 2L, 3L, 9L), Seq(2L, 9L)) === 2L)
    assert(cnt(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) === 0L)
    assert(cnt(Seq(1L, 4L, 7L, 10L), Seq(4L, 5L, 10L, 11L)) === 2L)
    assert(cnt(Seq.empty, Seq(1L)) === 0L)
    assert(cnt(Seq.empty, Seq.empty) === 0L)
  }

  test("null input yields null; codegen and interpreted paths agree") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(2L, 3L))),
      (None, Some(Seq(1L))),
      (Some(Seq(1L)), None)
    ).toDF("x", "y")
    val c = ColumnShim.column(SortedIntersectCount(
      ColumnShim.expression(col("x")), ColumnShim.expression(col("y"))))
    val wholeStage = df.select(c.as("n")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(wholeStage.toSeq === Seq(1L, null, null))
    // force the interpreted path
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(c.as("n")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getLong(0))
      assert(interp.toSeq === wholeStage.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
