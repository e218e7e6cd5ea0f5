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

  test("MoR-deleted (DV) table: DSv2 ≡ TxLog.read, pruning intact on clean segments") {
    val dir = slicedTable()
    TxLog.deleteMoR(spark, dir, "id = 603")
    TxLog.deleteMoR(spark, dir, "id IN (505, 506)")
    val got = dsv2(dir).orderBy("id").collect().toSeq
    val want = TxLog.read(spark, dir).orderBy("id").collect().toSeq
    assert(got == want && got.size == 29, s"got ${got.size} rows")
    // a residual filter over the dirty segment never resurrects a
    // tombstone (the raw bytes still hold id=603)
    assert(dsv2(dir).filter("id = 603").collect().isEmpty)
    // segment pruning still reaches the plan for a slice untouched by DVs
    val q = dsv2(dir).filter(col("day") === "1997-06-15")
    assert(plannedSegs(q).size == 1, s"planned: ${plannedSegs(q)}")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (700L to 707L))
    // and a filtered read over the DIRTY segment applies as exact residual
    val dirtyQ = dsv2(dir).filter("day = '1996-06-15'")
    val dirtyWant = TxLog.readWhere(spark, dir, "day = '1996-06-15'")
    assert(dirtyQ.orderBy("id").collect().toSeq ==
      dirtyWant.orderBy("id").collect().toSeq)
    assert(dirtyQ.count() == 7)
  }

  test("column-mapped table (rename + drop): DSv2 surfaces logical labels, prunes, pushes down") {
    val dir = slicedTable()
    TxLog.renameColumn(spark, dir, "day", "event_day")
    val df = dsv2(dir)
    assert(df.columns.toSeq == Seq("id", "event_day"))
    assert(df.orderBy("id").collect().toSeq ==
      TxLog.read(spark, dir).orderBy("id").collect().toSeq)
    // stats triage translates the logical label to the physical stats key
    val q = df.filter(col("event_day") === "1996-06-15")
    assert(plannedSegs(q).size == 1, s"planned: ${plannedSegs(q)}")
    assert(q.count() == 8)
    // parquet-level pushdown rides the PHYSICAL name (the bytes' name)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("day"),
      s"no physical pushdown in:\n$plan")
    // dropped columns stay hidden
    val d2 = freshDir()
    TxLog.append(Seq((1L, "a", "secret")).toDF("id", "v", "gone"), d2)
    TxLog.dropColumn(spark, d2, "gone")
    assert(dsv2(d2).columns.toSeq == Seq("id", "v"))
    assert(dsv2(d2).collect().head.getString(1) == "a")
  }

  test("DV + column mapping combined: parity and pruning") {
    val dir = slicedTable()
    TxLog.renameColumn(spark, dir, "day", "d")
    TxLog.deleteMoR(spark, dir, "id = 603")
    val got = dsv2(dir).orderBy("id").collect().toSeq
    val want = TxLog.read(spark, dir).orderBy("id").collect().toSeq
    assert(got == want && got.size == 31)
    val q = dsv2(dir).filter(col("d") === "1996-06-15")
    assert(plannedSegs(q).size == 1, s"planned: ${plannedSegs(q)}")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(600L, 601L, 602L, 604L, 605L, 606L, 607L))
  }

  test("SQL INSERT INTO / INSERT OVERWRITE write through the commit path") {
    val dir = slicedTable()
    spark.sql("DROP TABLE IF EXISTS txdsv2_w")
    try {
      spark.sql(s"CREATE TABLE txdsv2_w USING txlog OPTIONS (path '$dir')")
      spark.sql("INSERT INTO txdsv2_w VALUES (900, '1999-06-15')")
      // the commit is a real log version: the Scala API sees it too
      assert(TxLog.read(spark, dir).count() == 33)
      assert(spark.sql("SELECT * FROM txdsv2_w WHERE id = 900").count() == 1)
      spark.sql("INSERT OVERWRITE txdsv2_w VALUES (1, '2000-01-01')")
      assert(TxLog.read(spark, dir).collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally spark.sql("DROP TABLE IF EXISTS txdsv2_w")
  }

  test("INSERT INTO ... REPLACE WHERE and writeTo.overwrite(cond) → replaceWhere") {
    val dir = slicedTable() // 4 day-sliced segments, 8 rows each
    spark.sql("DROP TABLE IF EXISTS txdsv2_rw")
    try {
      spark.sql(s"CREATE TABLE txdsv2_rw USING txlog OPTIONS (path '$dir')")
      // replace exactly one day's slice: one commit, the frame's
      // segment drops wholesale, the other three carry by reference
      spark.sql("""INSERT INTO txdsv2_rw REPLACE WHERE day = '1995-06-15'
        SELECT id, '1995-06-15' AS day FROM range(2)""")
      assert(TxLog.commitOp(dir, 4) == "replace_where",
        "REPLACE WHERE must land as the engine's replaceWhere commit")
      assert(spark.sql(
        "SELECT count(*) FROM txdsv2_rw WHERE day = '1995-06-15'")
        .head().getLong(0) == 2)
      assert(spark.table("txdsv2_rw").count() == 26) // 3*8 + 2
      // an incoming row OUTSIDE the declared frame is rejected
      // (Delta's replaceWhere contract), nothing committed
      val e = intercept[Exception](spark.sql(
        """INSERT INTO txdsv2_rw REPLACE WHERE day = '1995-06-15'
           SELECT 1 AS id, '1997-01-01' AS day"""))
      assert(e.getMessage.contains("do not satisfy"))
      assert(TxLog.headVersion(dir) == 4)
      // the DataFrameWriterV2 spelling routes identically
      Seq((7L, "1996-06-15")).toDF("id", "day").writeTo("txdsv2_rw")
        .overwrite(col("day") === "1996-06-15")
      assert(TxLog.commitOp(dir, 5) == "replace_where")
      assert(spark.sql(
        "SELECT count(*) FROM txdsv2_rw WHERE day = '1996-06-15'")
        .head().getLong(0) == 1)
      // an unconditional writeTo overwrite degenerates to truncate
      Seq((42L, "x")).toDF("id", "day").writeTo("txdsv2_rw")
        .overwrite(lit(true))
      assert(TxLog.read(spark, dir).collect().map(_.getLong(0)).toSeq ==
        Seq(42L))
    } finally spark.sql("DROP TABLE IF EXISTS txdsv2_rw")
  }

  test("CREATE TABLE with declared columns: first INSERT lands, pre-INSERT scan is empty") {
    val dir = freshDir()
    spark.sql("DROP TABLE IF EXISTS txdsv2_new")
    try {
      spark.sql("CREATE TABLE txdsv2_new (id BIGINT, day STRING) " +
        s"USING txlog OPTIONS (path '$dir')")
      // catalog schema stands in while the log is empty
      assert(spark.sql("SELECT * FROM txdsv2_new").collect().isEmpty)
      spark.sql("INSERT INTO txdsv2_new VALUES (7, '1995-01-01'), (8, '1995-01-02')")
      assert(spark.sql("SELECT * FROM txdsv2_new").count() == 2)
      assert(TxLog.read(spark, dir).orderBy("id")
        .collect().map(_.getLong(0)).toSeq == Seq(7L, 8L))
    } finally spark.sql("DROP TABLE IF EXISTS txdsv2_new")
  }

  test("CTAS: CREATE TABLE ... USING txlog AS SELECT") {
    val dir = freshDir()
    spark.sql("DROP TABLE IF EXISTS txdsv2_ctas")
    try {
      spark.sql(s"CREATE TABLE txdsv2_ctas USING txlog OPTIONS (path '$dir') " +
        "AS SELECT id, concat('v', id) AS v FROM range(5)")
      assert(spark.sql("SELECT * FROM txdsv2_ctas").count() == 5)
      assert(TxLog.read(spark, dir).count() == 5)
    } finally spark.sql("DROP TABLE IF EXISTS txdsv2_ctas")
  }

  test("df.write.format(txlog): append with statsCols records skipping stats") {
    val dir = freshDir()
    Seq((1L, "1995-06-15"), (2L, "1995-06-16")).toDF("id", "day")
      .write.format("txlog").option("statsCols", "day,id")
      .mode("append").save(dir)
    Seq((3L, "1996-06-15"), (4L, "1996-06-16")).toDF("id", "day")
      .write.format("txlog").option("statsCols", "day,id")
      .mode("append").save(dir)
    // the recorded stats prune like an API appendWithStats would
    val q = dsv2(dir).filter(col("day") >= "1996-01-01")
    assert(plannedSegs(q).size == 1, s"planned: ${plannedSegs(q)}")
    assert(q.count() == 2)
    Seq((9L, "1999-01-01")).toDF("id", "day")
      .write.format("txlog").mode("overwrite").save(dir)
    assert(TxLog.read(spark, dir).count() == 1)
  }

  test("INSERT into a column-mapped table translates logical labels on write") {
    val dir = slicedTable()
    TxLog.renameColumn(spark, dir, "day", "event_day")
    spark.sql("DROP TABLE IF EXISTS txdsv2_m")
    try {
      spark.sql(s"CREATE TABLE txdsv2_m USING txlog OPTIONS (path '$dir')")
      spark.sql("INSERT INTO txdsv2_m VALUES (900, '1999-06-15')")
      assert(spark.sql(
        "SELECT event_day FROM txdsv2_m WHERE id = 900").collect()
        .head.getString(0) == "1999-06-15")
      // the appended bytes landed under the PHYSICAL name: the Scala
      // read (mapping-applying) agrees
      assert(TxLog.read(spark, dir).filter("id = 900").count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS txdsv2_m")
  }

  test("INSERT OVERWRITE racing a concurrent append conflicts loud (contract: overwrite asserts over the whole table)") {
    val dir = slicedTable()
    spark.sql("DROP TABLE IF EXISTS txdsv2_r")
    try {
      spark.sql(s"CREATE TABLE txdsv2_r USING txlog OPTIONS (path '$dir')")
      TxLog.testBeforeConditionalCommit.set(() =>
        TxLog.append(Seq((999L, "2001-01-01")).toDF("id", "day"), dir))
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE txdsv2_r VALUES (1, '2000-01-01')")
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[java.util.ConcurrentModificationException]),
        s"got: $e")
      // the concurrent append won; the failed overwrite left no rows
      assert(TxLog.read(spark, dir).count() == 33)
    } finally {
      TxLog.testBeforeConditionalCommit.set(null)
      spark.sql("DROP TABLE IF EXISTS txdsv2_r")
    }
  }
  test("a pathless direct read fails with the table-dir message, not a pending probe") {
    // MANAGED CREATE TABLE probes getTable without a path (legitimate);
    // a pathless spark.read must not surface as a capability error on
    // a pending descriptor — it names the missing dir outright
    val e = intercept[IllegalArgumentException] {
      spark.read.format("txlog").load()
    }
    assert(e.getMessage.contains("table dir"), s"got: ${e.getMessage}")
  }
}
