package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Pins the round-10 review fixes: SQL NULL-predicate semantics for the
  * CoW DML legs, the single-execution replaceWhere frame validation,
  * the rename-onto-physical-name collision guard, the streaming drift
  * guard over dropped columns, staged-segment reclaim on non-conflict
  * failures, streaming-sink liveness under unrelated concurrent
  * commits, and the governance gate for blind appends. */
class TxLogReviewFixSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txfix").toString

  /** Count staged segment dirs under the table root (live or not). */
  private def segDirs(dir: String): Set[String] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("seg-"))
      .map(_.getName).toSet

  // ---- SQL NULL-predicate semantics (DELETE deletes only TRUE rows) ----

  test("CoW delete KEEPS rows whose predicate evaluates to NULL, like deleteMoR") {
    val data = Seq((1L, Some(5)), (2L, None), (3L, Some(7)))
    val cow = freshDir(); val mor = freshDir()
    Seq(cow, mor).foreach(d => TxLog.append(data.toDF("id", "c"), d))
    TxLog.delete(spark, cow, "c = 5")
    TxLog.deleteMoR(spark, mor, "c = 5")
    def rows(d: String) = TxLog.read(spark, d)
      .orderBy("id").as[(Long, Option[Int])].collect().toList
    val expected = List((2L, None), (3L, Some(7)))
    assert(rows(cow) == expected, "CoW delete must keep the NULL-predicate row")
    assert(rows(mor) == expected, "CoW and MoR delete must agree")
  }

  test("replaceWhere keeps NULL-predicate rows in straddling segments") {
    val dir = freshDir()
    // one straddling segment: d1 rows (replaced), a d2 row and a
    // NULL-day row (both outside the frame — must survive)
    TxLog.append(Seq((1L, Some("d1")), (2L, Some("d2")), (3L, None))
      .toDF("id", "day"), dir)
    TxLog.replaceWhere(spark, dir, "day = 'd1'",
      Seq((10L, Some("d1"))).toDF("id", "day"))
    val rows = TxLog.read(spark, dir)
      .orderBy("id").as[(Long, Option[String])].collect().toList
    assert(rows == List((2L, Some("d2")), (3L, None), (10L, Some("d1"))),
      s"NULL-day row lost or frame leaked: $rows")
  }

  test("replaceWhere rejects incoming rows whose predicate is NULL, and reclaims staging") {
    val dir = freshDir()
    TxLog.append(Seq((1L, Some("d1"))).toDF("id", "day"), dir)
    val before = segDirs(dir)
    val e = intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, dir, "day = 'd1'",
        Seq((10L, Some("d1")), (11L, None)).toDF("id", "day"))
    }
    assert(e.getMessage.contains("do not satisfy"))
    assert(segDirs(dir) == before, "failed replaceWhere leaked staged segments")
    assert(TxLog.read(spark, dir).count() == 1)
  }

  test("replaceWhere executes the incoming frame exactly once") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "d1")).toDF("id", "day"), dir)
    val acc = spark.sparkContext.longAccumulator("rw-evals")
    val tick = udf((i: Long) => { acc.add(1); i })
    val df = Seq((10L, "d1"), (11L, "d1"), (12L, "d1")).toDF("id", "day")
      .withColumn("id", tick(col("id")))
    TxLog.replaceWhere(spark, dir, "day = 'd1'", df)
    assert(acc.value == 3,
      s"incoming frame executed ${acc.value}/3 row-evaluations — must be staged once")
    assert(TxLog.read(spark, dir).count() == 3)
  }

  // ---- column mapping: rename collision + order-insensitive relabel ----

  test("chained rename reissuing a freed label (v->value, k->v) reads and writes cleanly") {
    val dir = freshDir()
    TxLog.append(Seq((1, 2)).toDF("k", "v"), dir)
    TxLog.renameColumn(spark, dir, "v", "value") // frees the LABEL v
    TxLog.renameColumn(spark, dir, "k", "v")     // reissues it over physical k
    val df = TxLog.read(spark, dir)
    assert(df.columns.toSeq.sorted == Seq("v", "value"),
      s"duplicate or missing columns after chained rename: ${df.columns.toSeq}")
    assert(df.select("v", "value").as[(Int, Int)].head() == ((1, 2)))
    // writes under the reissued labels round-trip (no shadow-guard brick)
    TxLog.append(Seq((3, 4)).toDF("v", "value"), dir)
    assert(TxLog.read(spark, dir).select("v", "value")
      .as[(Int, Int)].collect().toSet == Set((1, 2), (3, 4)))
    // a checkpoint re-serializes the rename map; the mapping must survive
    (0 until 12).foreach(i => TxLog.append(Seq((10 + i, 20 + i))
      .toDF("v", "value"), dir))
    assert(TxLog.read(spark, dir).columns.toSeq.sorted == Seq("v", "value"))
  }

  test("dropColumn over a reissued label keeps the visible schema writable") {
    val dir = freshDir()
    TxLog.append(Seq((1, 2)).toDF("k", "v"), dir)
    TxLog.renameColumn(spark, dir, "v", "value") // physical v labeled value
    TxLog.renameColumn(spark, dir, "k", "v")     // label v reissued over k
    TxLog.dropColumn(spark, dir, "value")        // drops PHYSICAL v
    // visible schema is exactly [v] (physical k); it must stay writable
    // even though "v" is also a dropped physical name
    assert(TxLog.read(spark, dir).columns.toSeq == Seq("v"))
    TxLog.append(Seq(Tuple1(9)).toDF("v"), dir)
    assert(TxLog.read(spark, dir).as[Int].collect().toSet == Set(1, 9))
  }

  test("governance fingerprint is injection-proof (encoded fields)") {
    // two DIFFERENT governance states whose raw concatenation would
    // collide: {constraint a -> "e;d:q=w"} vs {constraint a -> "e",
    // default q -> "w"} — the encoded fingerprints must differ
    val d1 = freshDir(); val d2 = freshDir()
    TxLog.commit(d1, "create", Seq.empty, Seq.empty) // empty tables:
    TxLog.commit(d2, "create", Seq.empty, Seq.empty) // ADD skips row validation
    TxLog.addConstraint(spark, d1, "a", "e;d:q=w")
    TxLog.addConstraint(spark, d2, "a", "e")
    TxLog.setColumnDefault(d2, "q", "w")
    assert(TxLog.govFingerprintOf(d1) != TxLog.govFingerprintOf(d2),
      "raw-concatenation fingerprint collision")
  }

  test("rename onto a DROPPED column's physical name fails loud") {
    val dir = freshDir()
    TxLog.append(Seq((1, 2, 3)).toDF("k", "v", "w"), dir)
    TxLog.dropColumn(spark, dir, "w")
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, dir, "k", "w") // physical w holds hidden bytes
    }
    assert(e.getMessage.contains("dropped"))
    // rename-back (to the column's OWN physical name) stays legal
    TxLog.renameColumn(spark, dir, "v", "vv")
    TxLog.renameColumn(spark, dir, "vv", "v")
    assert(TxLog.read(spark, dir).columns.toSeq.sorted == Seq("k", "v"))
  }

  test("chained renames relabel simultaneously (no transient duplicate columns)") {
    val dir = freshDir()
    TxLog.append(Seq((1, 2, 3)).toDF("a", "b", "c"), dir)
    // a->b is illegal (b visible); but a->x, b->a IS legal and makes
    // renames {a->x, b->a}: a sequential fold applying a->x then b->a
    // is fine, but the REVERSE order would alias b onto still-present a.
    // The simultaneous relabel is order-free; pin the end state.
    TxLog.renameColumn(spark, dir, "a", "x")
    TxLog.renameColumn(spark, dir, "b", "a")
    val df = TxLog.read(spark, dir)
    // exactly three distinctly-named columns — a regression to the
    // order-sensitive fold would alias two onto one name here
    assert(df.columns.toSeq.sorted == Seq("a", "c", "x"),
      s"duplicate/missing columns: ${df.columns.toSeq}")
    assert(df.select("x", "a", "c").as[(Int, Int, Int)].head() == ((1, 2, 3)))
    // writes under the new labels round-trip
    TxLog.append(Seq((10, 20, 30)).toDF("x", "a", "c"), dir)
    assert(TxLog.read(spark, dir).select("x", "a", "c")
      .as[(Int, Int, Int)].collect().toSet == Set((1, 2, 3), (10, 20, 30)))
  }

  // ---- streaming drift guard vs dropped columns ----

  test("streaming source over a table with a DROPPED column delivers history without failing") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a", 100)).toDF("id", "v", "x"), dir)
    TxLog.append(Seq((2L, "b", 200)).toDF("id", "v", "x"), dir)
    TxLog.dropColumn(spark, dir, "x")
    // pre-drop segments carry physical x; the drift guard must treat it
    // as history, not as a mid-stream schema change
    val q = spark.readStream.format("txlog").option("path", dir).load()
      .writeStream.format("memory").queryName("txfix_dropped").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("txfix_dropped")
    assert(out.columns.toSet == Set("id", "v", "_commit_version", "_commit_op"))
    assert(out.select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  // ---- staged-segment reclaim on non-conflict failures ----

  test("appendStream reclaims its staged segment when the stats pass fails") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    val before = segDirs(dir)
    intercept[Exception] {
      TxLog.appendStream(Seq((2L, "b")).toDF("id", "v"), dir, batchId = 7L,
        statsCols = Seq("no_such_column"))
    }
    assert(segDirs(dir) == before,
      "failed appendStream leaked a staged segment no entry records")
  }

  // ---- governance gate for blind appends ----

  test("a blind commit staged before ADD CONSTRAINT conflicts loud (governance gate)") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 5)).toDF("id", "n"), dir)
    val g0 = TxLog.govFingerprintOf(dir) // governance the writer staged under
    TxLog.addConstraint(spark, dir, "n_pos", "n > 0")
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.commit(dir, "append", Seq.empty, Seq.empty, requireGov = Some(g0))
    }
    assert(e.getMessage.contains("governance"))
    // with the CURRENT fingerprint the same commit goes through
    TxLog.commit(dir, "append", Seq.empty, Seq.empty,
      requireGov = Some(TxLog.govFingerprintOf(dir)))
  }

  test("a blind commit staged before a RENAME conflicts loud (renames are governance)") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 5L)).toDF("id", "v"), dir)
    val g0 = TxLog.govFingerprintOf(dir) // mapping the writer staged under
    TxLog.renameColumn(spark, dir, "v", "w")
    // a batch staged BEFORE the rename translated labels under the old
    // mapping; committing it after would let a frame labeled `w` write
    // a fresh physical column that applyMapping then collides with the
    // renamed one — duplicate/ambiguous columns on every later read
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.commit(dir, "append", Seq.empty, Seq.empty, requireGov = Some(g0))
    }
    assert(e.getMessage.contains("governance"))
    // restaged under the CURRENT mapping, the append lands and reads clean
    TxLog.append(Seq((2L, 6L)).toDF("id", "w"), dir)
    val cols = TxLog.read(spark, dir).columns.toSeq
    assert(cols.count(_ == "w") == 1 && !cols.contains("v"), s"cols=$cols")
    assert(TxLog.read(spark, dir).agg(sum("w")).head().getLong(0) == 11L)
  }

  test("append enforces a constraint added AFTER its staging snapshot (end to end)") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 5)).toDF("id", "n"), dir)
    TxLog.addConstraint(spark, dir, "n_pos", "n > 0")
    // a violating append staged AFTER the constraint exists fails at
    // the staging check itself — the gate covers the in-flight window,
    // the staging check covers everything after
    val before = segDirs(dir)
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, -1)).toDF("id", "n"), dir)
    }
    assert(segDirs(dir) == before, "violating append leaked staging")
  }

  // ---- streaming-sink liveness under unrelated concurrent commits ----

  test("mergeStreamMoR: concurrent DISTINCT batch ids all land (liveness retry)") {
    val dir = freshDir()
    TxLog.append((0L until 8L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    val n = 4
    val latch = new java.util.concurrent.CountDownLatch(n)
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Option[Int]]()
    val threads = (0 until n).map { t =>
      new Thread(() => {
        val updates = Seq((t.toLong, s"u$t"), (100L + t, s"i$t"))
          .toDF("id", "v")
        latch.countDown(); latch.await()
        results.put(t.toLong,
          TxLog.mergeStreamMoR(spark, dir, updates, "id", batchId = 1000L + t))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // every distinct batch id must commit exactly once (no CME escapes)
    assert(results.size == n)
    (0 until n).foreach(t => assert(results.get(t.toLong).isDefined,
      s"batch $t did not commit"))
    val rows = TxLog.read(spark, dir).as[(Long, String)].collect().toMap
    (0 until n).foreach { t =>
      assert(rows(t.toLong) == s"u$t", s"upsert of key $t lost")
      assert(rows(100L + t) == s"i$t", s"insert of batch $t lost")
    }
    assert(rows.size == 8 + n, s"unexpected row count: ${rows.size}")
  }

  // ---- single-job triage for update (the delete/replaceWhere shape) ----

  private def countJobs[T](body: => T): (T, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (sys.env.contains("GRAFT_TRACE_JOBS"))
          println(s"TRACEJOB ${j.jobId}: " +
            j.stageInfos.map(_.name).mkString(" | "))
        jobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(200) // let the listener bus drain
      (r, jobs.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("update triages all segments in O(1) jobs, not a probe job per segment") {
    val dir = freshDir()
    (0 until 6).foreach(i =>
      TxLog.append(Seq((i.toLong, i * 10)).toDF("id", "n"), dir))
    // triage(1) + staged write(1) + a bounded constant of metadata
    // reads — NOT 6+ probe jobs; assert well under one-per-segment
    val (_, jobs) = countJobs(
      TxLog.update(spark, dir, "id = 3", Map("n" -> "n + 1")))
    assert(jobs <= 5,
      s"update ran $jobs jobs over 6 segments — per-segment probes are back")
    assert(TxLog.read(spark, dir).where("id = 3").as[(Long, Int)].head()._2 == 31)
  }

  test("replaceWhere job count is INDEPENDENT of segment count (no per-segment probes)") {
    // the robust form of the O(1)-triage claim: broadcast exchanges and
    // footer reads contribute a CONSTANT number of jobs, so doubling
    // the segment count must not add any
    def run(n: Int): Int = {
      val dir = freshDir()
      (0 until n).foreach(i =>
        TxLog.append(Seq((i.toLong, s"d$i")).toDF("id", "day"), dir))
      val (_, jobs) = countJobs(
        TxLog.replaceWhere(spark, dir, "day = 'd2'",
          Seq((20L, "d2")).toDF("id", "day")))
      assert(TxLog.read(spark, dir).where("day = 'd2'")
        .as[(Long, String)].head()._1 == 20L)
      jobs
    }
    val (j4, j8) = (run(4), run(8))
    assert(j8 <= j4,
      s"replaceWhere jobs grew with segments: $j4 @4 segs -> $j8 @8 segs")
  }

  test("merge job count is INDEPENDENT of candidate segment count") {
    def run(n: Int): Int = {
      val dir = freshDir()
      (0 until n).foreach(i =>
        TxLog.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir))
      val (_, jobs) = countJobs(
        TxLog.merge(spark, dir,
          Seq((3L, "upd"), (1000L, "ins")).toDF("id", "v"), "id"))
      val rows = TxLog.read(spark, dir).as[(Long, String)].collect().toMap
      assert(rows(3L) == "upd" && rows(1000L) == "ins" && rows.size == n + 1)
      jobs
    }
    val (j4, j8) = (run(4), run(8))
    assert(j8 <= j4,
      s"merge jobs grew with segments: $j4 @4 segs -> $j8 @8 segs")
  }
}
