package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Plan-integrated segment pruning for `spark.read.format("txlog")`:
  * DataFrame/SQL filters push into the DSv2 scan builder, route
  * through the shared stats+bloom triage, and the scan delegates to
  * Spark's own vectorized parquet read over the surviving segments —
  * `readWhere` semantics without string routing, plus parquet-level
  * PushedFilters and column pruning from the delegate. */
class TxLogDsv2Spec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txdsv2").toString

  /** 4 date-sliced segments with stats on `day` and `id`, 8 rows each
    * (the TxLogTriagePruneSpec layout). */
  private def slicedTable(): String = {
    val dir = freshDir()
    (5 to 8).foreach { x =>
      val rows = (0 until 8).map(i => ((x * 100 + i).toLong, s"199$x-06-15"))
      TxLog.appendWithStats(spark, rows.toDF("id", "day"), dir,
        Seq("day", "id"))
    }
    dir
  }

  private def dsv2(dir: String): DataFrame =
    spark.read.format("txlog").load(dir)

  private def plannedSegs(df: DataFrame): Seq[String] =
    graft.sources.txlog.TxLogBatch.plannedSegments(df)

  test("unfiltered read matches TxLog.read") {
    val dir = slicedTable()
    val got = dsv2(dir).orderBy("id").collect().toSeq
    val want = TxLog.read(spark, dir).orderBy("id").collect().toSeq
    assert(got == want && got.size == 32)
  }

  test("a pushed day-slice filter opens one segment (listener-counted)") {
    val dir = slicedTable()
    val q = dsv2(dir).filter(col("day") === "1996-06-15")
    // SEGMENT pruning pinned on the planned file set — records-read
    // alone can't distinguish it from the delegate's parquet row-group
    // skipping, which would also keep recs low with pruning broken
    assert(plannedSegs(q).size == 1,
      s"planned segments: ${plannedSegs(q)}")
    val (rows, recs) = countRecordsRead { q.collect() }
    assert(rows.length == 8)
    // one 8-row segment scanned; the unpruned scan would read 32
    assert(recs <= 8, s"read $recs records, expected one segment's 8")
  }

  test("DSv2-filter ≡ readWhere across the predicate shapes") {
    val dir = slicedTable()
    val shapes = Seq(
      "day = '1996-06-15'",
      "day BETWEEN '1996-01-01' AND '1997-12-31'",
      "'1998-01-01' < day",
      "id >= 700 AND id < 799",
      "day IN ('1995-06-15', '1998-06-15')",
      "day = '1996-06-15' OR id = 801") // unprunable top-level OR
    shapes.foreach { p =>
      val got = dsv2(dir).filter(p).orderBy("id").collect().toSeq
      val want = TxLog.readWhere(spark, dir, p).orderBy("id").collect().toSeq
      assert(got == want, s"shape [$p]: dsv2=$got readWhere=$want")
    }
  }

  test("delegate surfaces parquet pushdown and column pruning in the plan") {
    val dir = slicedTable()
    val plan = dsv2(dir).filter(col("day") === "1996-06-15").select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(day)"),
      s"no parquet pushdown in:\n$plan")
  }

  test("a provably matchless predicate prunes everything: zero-partition scan") {
    val dir = slicedTable()
    val (rows, recs) = countRecordsRead {
      dsv2(dir).filter(col("day") === "2050-01-01").collect()
    }
    assert(rows.isEmpty && recs == 0, s"rows=${rows.length} recs=$recs")
  }

  test("SQL over a registered view prunes identically") {
    val dir = slicedTable()
    dsv2(dir).createOrReplaceTempView("txdsv2_sql")
    val (rows, recs) = countRecordsRead {
      spark.sql(
        "SELECT id FROM txdsv2_sql WHERE day = '1997-06-15'").collect()
    }
    assert(rows.length == 8 && recs <= 8, s"rows=${rows.length} recs=$recs")
  }

  test("CREATE TABLE ... USING txlog registers in the session catalog and prunes") {
    val dir = slicedTable()
    spark.sql("DROP TABLE IF EXISTS txdsv2_cat")
    try {
      spark.sql(s"CREATE TABLE txdsv2_cat USING txlog OPTIONS (path '$dir')")
      val (rows, recs) = countRecordsRead {
        spark.sql("SELECT id FROM txdsv2_cat WHERE day = '1996-06-15'").collect()
      }
      assert(rows.length == 8 && recs <= 8, s"rows=${rows.length} recs=$recs")
      // the planned scan holds exactly the one surviving segment path
      // (counted from inputFiles — the plan string truncates)
      val segs = plannedSegs(spark.sql(
        "SELECT id FROM txdsv2_cat WHERE day = '1996-06-15'"))
      assert(segs.size == 1, s"planned: $segs")
    } finally spark.sql("DROP TABLE IF EXISTS txdsv2_cat")
  }

  test("asOf option time-travels") {
    val dir = slicedTable()
    TxLog.delete(spark, dir, "day = '1995-06-15'")
    assert(dsv2(dir).count() == 24)
    val asOf = spark.read.format("txlog").option("asOf", "3").load(dir)
    assert(asOf.count() == 32)
  }

  test("schema evolution: old segments surface null for added columns") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    TxLog.append(Seq((2L, "b", "x")).toDF("id", "v", "extra"), dir)
    val got = dsv2(dir).orderBy("id").collect().toSeq
    assert(got.map(_.getString(2)) == Seq(null, "x"))
  }

  test("DV and column-mapped tables fail loud with a usable pointer") {
    val dv = freshDir()
    TxLog.append((0 until 8).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dv)
    TxLog.deleteMoR(spark, dv, "id = 3")
    val e1 = intercept[Exception] { dsv2(dv).collect() }
    assert(Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("deletion vectors"))),
      s"got: $e1")
    val rn = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), rn)
    TxLog.renameColumn(spark, rn, "v", "val")
    val e2 = intercept[Exception] { dsv2(rn).count() }
    assert(Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("column mapping"))),
      s"got: $e2")
  }
}
