package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** LOGICAL conflict re-check on the conditional commit (Delta's
  * write-serializable re-validation): a snapshot-dependent DML whose
  * slot claim loses to a PURE BLIND APPEND re-claims the next slot
  * with the SAME staged segments — metadata-only, the rewrite job
  * never re-runs — so continuous ingest cannot starve maintenance.
  * Anything else intervening (a rewrite, a DV commit, a governance
  * change) and any op whose contract asserts over appended rows too
  * (overwrite/replaceWhere/restore) still conflicts loud.
  *
  * The injected-commit window uses [[TxLog.testBeforeConditionalCommit]]
  * (runs once, immediately before the first claim attempt) — the
  * deterministic in-process form of a commit landing between an op's
  * `state()` read and its commit. */
class TxLogOccRetrySpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txocc").toString

  private def baseTable(): String = {
    val dir = freshDir()
    TxLog.appendWithStats(spark,
      (0 until 8).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir,
      Seq("id"))
    TxLog.appendWithStats(spark,
      (8 until 16).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir,
      Seq("id"))
    dir
  }

  /** Arms the one-shot hook with `body`, returning the records-read
    * counter value SNAPSHOTTED AFTER the hook ran — everything the
    * DML's retry does after the intervening commit must read zero
    * further records (the re-claim is metadata-only). */
  private def armHook(recs: AtomicLong, after: AtomicLong)(body: => Unit): Unit =
    TxLog.testBeforeConditionalCommit.set(() => {
      body
      Thread.sleep(300) // listener bus drain for the hook's own jobs
      after.set(recs.get())
    })

  private def withRecordsRead[T](body: (AtomicLong) => T): T = {
    val recs = new AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try body(recs)
    finally {
      spark.sparkContext.removeSparkListener(l)
      TxLog.testBeforeConditionalCommit.set(null)
    }
  }

  test("CoW delete lands past a concurrent blind append, zero records re-read") {
    val dir = baseTable()
    withRecordsRead { recs =>
      val after = new AtomicLong(-1)
      armHook(recs, after) {
        TxLog.append(Seq((100L, "late")).toDF("id", "v"), dir)
      }
      val v = TxLog.delete(spark, dir, "id < 4")
      Thread.sleep(300)
      assert(after.get() >= 0, "hook never fired")
      // the retry re-claims with the staged segment: NO job runs after
      // the intervening append — records read since the hook snapshot
      // must be exactly zero
      assert(recs.get() == after.get(),
        s"retry re-read ${recs.get() - after.get()} records")
      // the delete claimed the slot AFTER the append
      assert(v == TxLog.headVersion(dir))
      val out = TxLog.read(spark, dir).select("id").as[Long].collect().sorted
      // serial order ⟨delete, append⟩: ids 0..3 gone, appended row kept
      assert(out.toSeq == ((4L until 16L) :+ 100L))
    }
  }

  test("update and optimize also re-claim past appends; results serialize append-last") {
    val dir = baseTable()
    withRecordsRead { recs =>
      val after = new AtomicLong(-1)
      armHook(recs, after) {
        TxLog.append(Seq((101L, "x")).toDF("id", "v"), dir)
      }
      TxLog.update(spark, dir, "id = 5", Map("v" -> "'upd'"))
      Thread.sleep(300)
      assert(after.get() >= 0 && recs.get() == after.get(),
        s"update retry re-read ${recs.get() - after.get()} records")
    }
    val got = TxLog.read(spark, dir)
      .filter(col("id") === 5L || col("id") === 101L)
      .select("v").as[String].collect().toSet
    assert(got == Set("upd", "x"))
    // optimize (pure rearrangement) past an append: row set unchanged
    TxLog.testBeforeConditionalCommit.set(() =>
      TxLog.append(Seq((102L, "y")).toDF("id", "v"), dir): Unit)
    TxLog.optimize(spark, dir, Seq("id"), 2, statsCols = Seq("id"))
    TxLog.testBeforeConditionalCommit.set(null)
    val ids = TxLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids.contains(102L) && ids.length == 18,
      s"optimize lost rows: ${ids.mkString(",")}")
  }

  test("MoR delete re-claims past an append with the same staged DV") {
    val dir = baseTable()
    withRecordsRead { recs =>
      val after = new AtomicLong(-1)
      armHook(recs, after) {
        TxLog.append(Seq((103L, "z")).toDF("id", "v"), dir)
      }
      TxLog.deleteMoR(spark, dir, "id >= 14 AND id < 16")
      Thread.sleep(300)
      assert(after.get() >= 0 && recs.get() == after.get(),
        s"MoR retry re-read ${recs.get() - after.get()} records")
    }
    val ids = TxLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until 14L) :+ 103L)
  }

  test("a TRUE conflict (overlapping DML) still aborts and reclaims staging") {
    val dir = baseTable()
    TxLog.testBeforeConditionalCommit.set(() =>
      TxLog.delete(spark, dir, "id = 9"): Unit)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, dir, "id < 4")
    }
    TxLog.testBeforeConditionalCommit.set(null)
    // the loser's staged rewrite was reclaimed: every seg dir on disk
    // is recorded by some entry (no orphans vacuum could never find)
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg-"))
      .map(_.getName).toSet
    val recorded = TxLog.allAddedSegments(dir).map(_.split("/").last).toSet
    assert(onDisk.subsetOf(recorded), s"orphans: ${onDisk -- recorded}")
    // and the winner's delete is intact
    val ids = TxLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until 16L).filterNot(_ == 9L))
  }

  test("intervening DV commit / governance change conflict (not pure appends)") {
    val dir = baseTable()
    // a MoR delete writes dv= lines — tombstones a CoW rewrite of the
    // same snapshot would resurrect; must abort
    TxLog.testBeforeConditionalCommit.set(() =>
      TxLog.deleteMoR(spark, dir, "id = 15"): Unit)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, dir, "id < 2")
    }
    // governance: a constraint added mid-DML invalidates the staged
    // batch's validation basis
    TxLog.testBeforeConditionalCommit.set(() =>
      TxLog.addConstraint(spark, dir, "pos", "id >= 0"): Unit)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, dir, "id < 2")
    }
    TxLog.testBeforeConditionalCommit.set(null)
  }

  test("overwrite keeps conflict-loud semantics even for a pure append") {
    val dir = baseTable()
    TxLog.testBeforeConditionalCommit.set(() =>
      TxLog.append(Seq((104L, "w")).toDF("id", "v"), dir): Unit)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.overwrite(Seq((0L, "only")).toDF("id", "v"), dir)
    }
    TxLog.testBeforeConditionalCommit.set(null)
    // nothing replaced: 16 base rows + the hook's append
    assert(TxLog.read(spark, dir).count() == 17)
  }

  test("dv_coalesce conflict never deletes the live segments it re-adds") {
    val dir = baseTable()
    // crowd segment DVs: two narrow MoR deletes on the same segment
    TxLog.deleteMoR(spark, dir, "id = 0")
    TxLog.deleteMoR(spark, dir, "id = 1")
    TxLog.testBeforeConditionalCommit.set(() =>
      TxLog.delete(spark, dir, "id = 2"): Unit)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.coalesceDvs(spark, dir, maxSidecars = 1)
    }
    TxLog.testBeforeConditionalCommit.set(null)
    // the crowded segment (re-add candidate) must still read fine
    val ids = TxLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (3L until 16L))
    // re-crowd (the winner's CoW delete materialized the old DVs away
    // with its rewrite) and a coalesce with no interference succeeds
    TxLog.deleteMoR(spark, dir, "id = 3")
    TxLog.deleteMoR(spark, dir, "id = 4")
    assert(TxLog.coalesceDvs(spark, dir, maxSidecars = 1).nonEmpty)
    assert(TxLog.read(spark, dir).count() == 11)
  }

  test("two-JVM append race: delete→optimize→merge all land past a continuously-appending child") {
    // The race the in-process hook CANNOT run: a separate JVM
    // ([[AppendRaceChild]], own SparkSession, own classloader) blind-
    // appends one-row batches in a tight loop against the SAME table
    // dir, arbitrated only by the log store's putIfAbsent — while this
    // JVM runs the snapshot-dependent maintenance tape. Every op must
    // land within MaxCommitRetries (no ConcurrentModificationException
    // escapes), the retry path must ACTUALLY fire at least once
    // (occRetries counter — wall-clock interleaving alone proves
    // nothing), and the final table must hold exactly the serial-order
    // result: base minus the deletes, merge applied, every child row
    // present.
    val dir = freshDir()
    TxLog.appendWithStats(spark,
      (0 until 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir,
      Seq("id"))
    TxLog.appendWithStats(spark,
      (10000 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir,
      Seq("id"))
    val root = java.nio.file.Files.createTempDirectory("graft-occ2jvm")
    val stopFile = root.resolve("stop"); val countFile = root.resolve("n")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++
      addOpens ++ Seq("-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.AppendRaceChild", dir, stopFile.toString, countFile.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(root.resolve("child.log").toFile)
    val child = pb.start()
    try {
      // wait until the child's first append lands (Spark startup is
      // seconds) so the DMLs genuinely overlap live ingest
      val deadline = System.currentTimeMillis() + 120000
      while (TxLog.headVersion(dir) < 2 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(TxLog.headVersion(dir) >= 2, "child never appended; see child.log")
      val r0 = TxLog.occRetries.get()
      TxLog.delete(spark, dir, "id >= 0 AND id < 1000")
      TxLog.optimize(spark, dir, sortCols = Seq("id"), numSegments = 2,
        statsCols = Seq("id"))
      TxLog.merge(spark, dir,
        (2000 until 2100).map(i => (i.toLong, "merged")).toDF("id", "v"),
        key = "id", statsCols = Seq("id"))
      // the tape above races real ingest, so whether each individual
      // op conflicted is timing; if none did yet, keep slicing deletes
      // (disjoint 1000-id slices) until one provably re-claims
      var slice = 0
      while (TxLog.occRetries.get() == r0 && slice < 8) {
        TxLog.delete(spark, dir,
          s"id >= ${10000 + slice * 1000} AND id < ${11000 + slice * 1000}")
        slice += 1
      }
      assert(TxLog.occRetries.get() > r0,
        s"no DML re-claimed past a child append in ${3 + slice} ops — " +
          "the race never materialized")
      java.nio.file.Files.createFile(stopFile)
      assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child did not exit")
      assert(child.exitValue() == 0, "child failed; see child.log")
      val n = new String(java.nio.file.Files.readAllBytes(countFile),
        "UTF-8").trim.toInt
      assert(n >= 1)
      // serial-order accounting: base minus the deleted slices, merge
      // applied, EVERY child append present exactly once
      val t = TxLog.read(spark, dir)
      assert(t.filter("id >= 1000000").count() == n,
        "a child append was lost or duplicated")
      assert(t.filter("id >= 0 AND id < 1000").count() == 0)
      assert(t.filter(s"id >= 10000 AND id < ${10000 + slice * 1000}")
        .count() == 0)
      assert(t.filter("v = 'merged'").count() == 100)
      assert(t.filter("id < 1000000").count() ==
        20000 - 1000 - slice * 1000)
    } finally {
      try java.nio.file.Files.createFile(stopFile)
      catch { case _: java.nio.file.FileAlreadyExistsException => }
      child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
      child.destroyForcibly()
    }
  }
}
