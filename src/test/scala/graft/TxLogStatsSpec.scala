package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Data skipping + MERGE on the TxLog table format: per-segment min/max
  * stats recorded at append time prune range reads/deletes without
  * opening files; copy-on-write MERGE replaces matched keys and inserts
  * the rest, rewriting only segments that contain a match. */
class TxLogStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txstats").toString

  /** Three appends with disjoint id ranges, stats on (id, v). */
  private def rangedTable(): String = {
    val dir = freshDir()
    TxLog.appendWithStats(spark, Seq((1L, "a"), (5L, "b")).toDF("id", "v"), dir, Seq("id"))
    TxLog.appendWithStats(spark, Seq((10L, "c"), (15L, "d")).toDF("id", "v"), dir, Seq("id"))
    TxLog.appendWithStats(spark, Seq((20L, "e"), (25L, "f")).toDF("id", "v"), dir, Seq("id"))
    dir
  }

  test("optimizeWhere re-clusters only stats-intersecting segments; the rest carry by reference") {
    val dir = rangedTable() // id ranges [1,5], [10,15], [20,25]
    val before = TxLog.liveSegments(dir).toSet
    // frame [12, 22] intersects the 2nd and 3rd segments only
    val v = TxLog.optimizeWhere(spark, dir, "id", "12", "22",
      sortCols = Seq("id"), numSegments = 1, statsCols = Seq("id"))
    assert(v.isDefined && TxLog.commitOp(dir, v.get) == "optimize_where")
    val after = TxLog.liveSegments(dir).toSet
    assert((before intersect after).size == 1,
      s"exactly the [1,5] segment must survive by reference: $before -> $after")
    assert(after.size == 2, "two candidates re-clustered into one segment")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)]
      .collect().map(_._1).toList == List(1L, 5L, 10L, 15L, 20L, 25L),
      "optimizeWhere is a logical no-op")
    // the rewritten segment recorded fresh stats: pruning still works
    val (kept, pruned) = TxLog.pruneRange(dir, "id", Some("1"), Some("5"))
    assert(kept.size == 1 && pruned.size == 1)
    // a frame no segment intersects is a no-op
    assert(TxLog.optimizeWhere(spark, dir, "id", "90", "99",
      sortCols = Seq("id"), numSegments = 1).isEmpty)
  }

  test("pruneRange skips exactly the segments whose [min,max] excludes the range") {
    val dir = rangedTable()
    val (kept, pruned) = TxLog.pruneRange(dir, "id", Some("10"), Some("15"))
    assert(kept.size == 1 && pruned.size == 2,
      s"expected 1 kept / 2 pruned, got kept=$kept pruned=$pruned")
    // unbounded-low range
    val (k2, p2) = TxLog.pruneRange(dir, "id", None, Some("5"))
    assert(k2.size == 1 && p2.size == 2)
    // range touching two segments
    val (k3, _) = TxLog.pruneRange(dir, "id", Some("15"), Some("20"))
    assert(k3.size == 2)
  }

  test("readRange equals the unpruned filtered read, including empty-range") {
    val dir = rangedTable()
    val got = TxLog.readRange(spark, dir, "id", Some("10"), Some("20"))
      .orderBy("id").as[(Long, String)].collect().toList
    assert(got == List((10L, "c"), (15L, "d"), (20L, "e")))
    // a range no segment intersects: schema-preserving empty result
    val none = TxLog.readRange(spark, dir, "id", Some("100"), Some("200"))
    assert(none.columns.toList == List("id", "v") && none.isEmpty)
  }

  test("a segment without stats is conservatively kept, never pruned") {
    val dir = rangedTable()
    TxLog.append(Seq((1000L, "nostats")).toDF("id", "v"), dir) // plain append: no stats
    val (kept, _) = TxLog.pruneRange(dir, "id", Some("10"), Some("15"))
    assert(kept.size == 2, s"statless segment must stay in the scan set: $kept")
    assert(TxLog.readRange(spark, dir, "id", Some("10"), Some("15"))
      .count() == 2)
  }

  test("float/double stats compare as doubles, not decimal strings") {
    val dir = freshDir()
    TxLog.appendWithStats(spark, Seq((1L, 0.1)).toDF("id", "x"), dir, Seq("x"))
    // 0.1's recorded repr "0.1" reads as a DECIMAL below the true binary
    // value 0.1000...0555; a BigDecimal compare against this lo (between
    // the two) would falsely prune the segment while the residual filter
    // (which casts lo to the SAME double 0.1) matches the row
    val lo = "0.10000000000000000555"
    val (kept, _) = TxLog.pruneRange(dir, "x", Some(lo), None)
    assert(kept.size == 1, "false prune on a float/double stats boundary")
    assert(TxLog.readRange(spark, dir, "x", Some(lo), None).count() == 1)
  }

  test("NaN stats keep the segment conservatively instead of crashing") {
    val dir = freshDir()
    TxLog.appendWithStats(spark,
      Seq((1L, Double.NaN), (2L, 5.0)).toDF("id", "x"), dir, Seq("x"))
    // Spark max propagates NaN into the recorded stats: every range
    // comparison must come back false (keep), never NumberFormatException
    val (kept, pruned) = TxLog.pruneRange(dir, "x", Some("100"), Some("200"))
    assert(kept.size == 1 && pruned.isEmpty)
    assert(TxLog.readRange(spark, dir, "x", Some("4"), Some("6")).count() == 1)
  }

  test("empty-string stats survive the log round trip and still prune") {
    val dir = freshDir()
    TxLog.appendWithStats(spark, Seq((1L, "")).toDF("id", "v"), dir, Seq("v"))
    // a trailing empty max field must not be dropped by the line parse
    val (_, pruned) = TxLog.pruneRange(dir, "v", Some("a"), Some("b"))
    assert(pruned.size == 1,
      "empty-string stats were lost in the commit-entry round trip")
  }

  test("model-based: a 24-op DML sequence tracks an in-memory reference exactly") {
    val dir = freshDir()
    // reference model: id -> x, updated in lockstep with every TxLog op
    var model = Map.empty[Long, Long]
    var nextId = 0L
    val rnd = new scala.util.Random(42) // seeded: deterministic sequence
    def table(): Map[Long, Long] =
      TxLog.read(spark, dir).as[(Long, Long)].collect().toMap
    def appendBatch(n: Int): Unit = {
      val rows = (0 until n).map { _ => nextId += 1; (nextId, rnd.nextInt(100).toLong) }
      TxLog.append(rows.toDF("id", "x"), dir)
      model ++= rows
    }
    appendBatch(5)
    for (step <- 1 to 24) {
      rnd.nextInt(6) match {
        case 0 => appendBatch(1 + rnd.nextInt(3))
        case 1 => // CoW delete of a random residue class
          val r = rnd.nextInt(4)
          TxLog.delete(spark, dir, s"id % 4 = $r")
          model = model.filter { case (id, _) => id % 4 != r }
        case 2 => // update a band
          val t = rnd.nextInt(50)
          TxLog.update(spark, dir, s"x < $t", Map("x" -> "x + 1000"))
          model = model.map { case (id, x) => id -> (if (x < t) x + 1000 else x) }
        case 3 => // merge: bump one existing id (if any) + insert one new
          val upd = model.keys.toSeq.sorted.headOption.map(id => (id, 777L)).toSeq
          nextId += 1
          val rows = upd :+ (nextId, 55L)
          TxLog.merge(spark, dir, rows.toDF("id", "x"), "id")
          model ++= rows
        case 4 => // maintenance: compact or optimize — logical no-ops
          if (rnd.nextBoolean()) TxLog.compact(spark, dir)
          else TxLog.optimize(spark, dir, Seq("id"), 2, Seq("id"))
        case 5 => // restore to a random earlier version = replay the log;
          // easiest exact model: re-read via time travel and adopt it
          val v = rnd.nextInt(TxLog.headVersion(dir) + 1)
          if (TxLog.liveSegments(dir, v)
              .forall(s0 => new java.io.File(dir, s0).isDirectory)) {
            TxLog.restore(dir, v)
            model =
              if (TxLog.liveSegments(dir, v).isEmpty) Map.empty
              else TxLog.read(spark, dir, asOf = v).as[(Long, Long)].collect().toMap
          }
      }
      if (TxLog.liveSegments(dir).nonEmpty || model.nonEmpty)
        assert(table() == model, s"divergence after step $step")
      // log always dense + parseable
      assert(TxLog.history(spark, dir).count() == TxLog.headVersion(dir) + 1)
    }
  }

  test("appends racing a retrying OPTIMIZE lose no rows and leak no segments") {
    val dir = freshDir()
    TxLog.append(Seq((0L, "seed")).toDF("id", "v"), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    try {
      // 4 writers x 4 appends each, racing one optimizer that retries
      // on every conflict — the realistic maintenance-vs-ingest race
      val writers = (1 to 4).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 4).foreach { i =>
            TxLog.append(Seq((w * 100L + i, s"w$w-$i")).toDF("id", "v"), dir)
          }
        })
      }
      val optimizer = pool.submit(new Runnable {
        def run(): Unit = (0 until 3).foreach { _ =>
          var done = false
          var attempts = 0
          while (!done && attempts < 50) {
            attempts += 1
            try { TxLog.optimize(spark, dir, Seq("id"), 2, Seq("id")); done = true }
            catch { case _: java.util.ConcurrentModificationException => () }
          }
          assert(done, "optimize starved: 50 consecutive conflicts")
        }
      })
      (writers :+ optimizer).foreach(_.get())
    } finally pool.shutdown()
    // no data loss: every appended row present exactly once
    val rows = TxLog.read(spark, dir).as[(Long, String)].collect().toList
    assert(rows.size == 17 && rows.toSet.size == 17,
      s"row loss/duplication under race: ${rows.size} rows")
    // no leaked bytes: every on-disk segment is recorded by some commit
    val recorded = (0 to TxLog.headVersion(dir))
      .flatMap(v => TxLog.liveSegments(dir, v)).toSet
    val onDisk = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("seg-")).toSet
    assert(onDisk subsetOf recorded,
      s"conflicted commits leaked segments: ${onDisk -- recorded}")
    // the log is dense: versions 0..head all parse
    assert(TxLog.history(spark, dir).count() == TxLog.headVersion(dir) + 1)
  }

  test("history reports one row per commit with op and segment counts") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    TxLog.append(Seq((3L, "c")).toDF("id", "v"), dir)
    TxLog.delete(spark, dir, "id = 2")
    TxLog.compact(spark, dir)
    val got = TxLog.history(spark, dir).orderBy("version")
      .as[(Long, String, Long, Long)].collect().toList
    assert(got == List(
      (0L, "append", 1L, 0L), (1L, "append", 1L, 0L),
      (2L, "delete", 1L, 1L), (3L, "compact", 1L, 2L)))
  }

  test("readChangesSince emits only post-version rows, tagged with commit metadata") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)            // v0
    TxLog.append(Seq((2L, "b")).toDF("id", "v"), dir)            // v1
    TxLog.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), dir) // v2
    TxLog.delete(spark, dir, "id = 3")                           // v3 rewrite
    val got = TxLog.readChangesSince(spark, dir, fromVersion = 0)
      .select("id", "_commit_version", "_commit_op")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (2L, 1L, "append"), (3L, 2L, "append"), (4L, 2L, "append"),
      (4L, 3L, "delete"))) // the rewrite output row, op-tagged
    // a poll with nothing new: schema-preserving EMPTY, never an error
    val idle = TxLog.readChangesSince(spark, dir, fromVersion = 3)
    assert(idle.isEmpty &&
      idle.columns.toSet == Set("id", "v", "_commit_version", "_commit_op"))
  }

  test("readChangesSince unions across an add-column schema evolution") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)                 // v0
    TxLog.append(Seq((2L, "b", 9L)).toDF("id", "v", "w"), dir)        // v1 evolves
    val got = TxLog.readChangesSince(spark, dir, fromVersion = -1)
      .select("id", "w", "_commit_version")
      .as[(Long, Option[Long], Long)].collect().toSet
    assert(got == Set((1L, None, 0L), (2L, Some(9L), 1L)),
      "pre-evolution rows must surface null for the added column")
  }

  test("bloom filters prune point lookups range stats cannot") {
    val dir = freshDir()
    // interleaved values: every segment's [min,max] covers every key,
    // so range stats prune NOTHING — only the bloom can
    TxLog.appendWithStats(spark, Seq((1L, "x"), (100L, "y")).toDF("id", "v"),
      dir, Seq("id"), bloomCols = Seq("id"))
    TxLog.appendWithStats(spark, Seq((2L, "x"), (99L, "y")).toDF("id", "v"),
      dir, Seq("id"), bloomCols = Seq("id"))
    TxLog.appendWithStats(spark, Seq((3L, "x"), (98L, "y")).toDF("id", "v"),
      dir, Seq("id"), bloomCols = Seq("id"))
    val (kept, pruned) = TxLog.prunePoint(dir, "id", "99")
    assert(kept.size == 1 && pruned.size == 2,
      s"bloom should isolate the one segment holding 99: kept=$kept pruned=$pruned")
    assert(TxLog.readPoint(spark, dir, "id", "99")
      .as[(Long, String)].collect().toList == List((99L, "y")))
    // absent key: all segments pruned, schema-preserving empty result
    val none = TxLog.readPoint(spark, dir, "id", "55")
    assert(none.columns.toList == List("id", "v") && none.isEmpty)
    // a segment without a bloom is conservatively kept
    TxLog.append(Seq((1000L, "nobloom")).toDF("id", "v"), dir)
    assert(TxLog.prunePoint(dir, "id", "99")._1.size == 2)
  }

  test("readRange(mergeSchema) works on a schema-evolved table") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir) // no column w yet
    TxLog.appendWithStats(spark,
      Seq((2L, "b", 10L), (3L, "c", 99L)).toDF("id", "v", "w"), dir, Seq("w"))
    val got = TxLog.readRange(spark, dir, "w", Some("5"), Some("50"),
        mergeSchema = true)
      .select("id").as[Long].collect().toList
    assert(got == List(2L),
      "range read over the evolved column must see newer segments' schema")
  }

  test("a conflicted conditional commit reclaims its staged segments") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir) // v0
    val staged = "seg-conflict-test"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, staged))
    intercept[java.util.ConcurrentModificationException] {
      TxLog.commitOrReclaim(dir, "optimize", Seq(staged), Seq.empty,
        expectedHead = -1, stats = Map.empty) // stale: head is 0
    }
    assert(!new java.io.File(dir, staged).exists,
      "conflicted commit must delete its staged segment dirs")
  }

  test("string/date stats order lexicographically, numeric stats numerically") {
    val dir = freshDir()
    TxLog.appendWithStats(spark,
      Seq(("1992-03-01", 9L), ("1993-06-01", 100L)).toDF("d", "n"), dir, Seq("d", "n"))
    TxLog.appendWithStats(spark,
      Seq(("1996-01-15", 20L), ("1997-11-30", 3L)).toDF("d", "n"), dir, Seq("d", "n"))
    val (kd, pd) = TxLog.pruneRange(dir, "d", Some("1996-01-01"), Some("1996-12-31"))
    assert(kd.size == 1 && pd.size == 1)
    // numeric: "9" > "100" lexicographically — stats must compare as numbers
    val (kn, pn) = TxLog.pruneRange(dir, "n", Some("99"), Some("200"))
    assert(kn.size == 1 && pn.size == 1,
      s"numeric stats compared lexicographically? kept=$kn pruned=$pn")
  }

  test("deleteRange rewrites only intersecting segments and keeps null rows") {
    val dir = rangedTable()
    TxLog.append(Seq((null.asInstanceOf[java.lang.Long], "null-row"))
      .toDF("id", "v"), dir)
    val before = TxLog.liveSegments(dir).toSet
    TxLog.deleteRange(spark, dir, "id", "10", "15", statsCols = Seq("id"))
    val after = TxLog.liveSegments(dir).toSet
    assert((before intersect after).size == 3,
      s"only the one intersecting segment should be rewritten: before=$before after=$after")
    val got = TxLog.read(spark, dir).select("v").as[String].collect().toSet
    assert(got == Set("a", "b", "e", "f", "null-row"),
      s"null rows must survive a range delete: $got")
  }

  test("merge replaces matched keys, inserts the rest, clean segments survive by reference") {
    val dir = rangedTable()
    val before = TxLog.liveSegments(dir).toSet
    val updates = Seq((10L, "C2"), (42L, "new")).toDF("id", "v")
    TxLog.merge(spark, dir, updates, "id", statsCols = Seq("id"))
    val after = TxLog.liveSegments(dir).toSet
    // segments 1 and 3 contain no matched key: carried over untouched
    assert((before intersect after).size == 2,
      s"clean segments must survive by reference: before=$before after=$after")
    val got = TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect().toList
    assert(got == List((1L, "a"), (5L, "b"), (10L, "C2"), (15L, "d"),
      (20L, "e"), (25L, "f"), (42L, "new")))
    assert(TxLog.commitOp(dir, TxLog.headVersion(dir)) == "merge")
    // no staging leftovers: every on-disk segment is add-recorded or live
    val onDisk = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("seg-")).toSet
    val recorded = (0 to TxLog.headVersion(dir))
      .flatMap(v => TxLog.liveSegments(dir, v)).toSet
    assert(onDisk subsetOf recorded, s"staging segment leaked: ${onDisk -- recorded}")
  }

  test("merge into a table with no matches is a pure insert") {
    val dir = rangedTable()
    TxLog.merge(spark, dir, Seq((100L, "x")).toDF("id", "v"), "id")
    assert(TxLog.read(spark, dir).count() == 7)
    assert(TxLog.liveSegments(dir).size == 4, "no segment should have been rewritten")
  }

  test("appendChecked admits clean batches, rejects violations pre-commit") {
    val dir = freshDir()
    TxLog.appendChecked(spark, Seq((1L, 10L), (2L, 0L)).toDF("id", "v"), dir,
      Seq("v >= 0", "id IS NOT NULL"))
    val ex = intercept[IllegalArgumentException] {
      TxLog.appendChecked(spark, Seq((3L, -5L), (4L, 7L), (5L, -1L)).toDF("id", "v"),
        dir, Seq("v >= 0"))
    }
    assert(ex.getMessage.contains("v >= 0") && ex.getMessage.contains("2 row(s)"),
      s"message must name the constraint and count: ${ex.getMessage}")
    assert(TxLog.headVersion(dir) == 0, "rejected batch must not commit")
    // staged bytes reclaimed: only the committed segment remains on disk
    val onDisk = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("seg-")).toSet
    assert(onDisk == TxLog.liveSegments(dir).toSet,
      s"rejected batch leaked staging: $onDisk")
    // SQL CHECK semantics: NULL predicate result passes (Delta-style)
    TxLog.appendChecked(spark,
      Seq((6L, null.asInstanceOf[java.lang.Long])).toDF("id", "v"), dir,
      Seq("v >= 0"))
    assert(TxLog.read(spark, dir).count() == 3)
  }

  test("appendStream is idempotent per batch id (exactly-once sink contract)") {
    val dir = freshDir()
    assert(TxLog.appendStream(Seq((1L, "a")).toDF("id", "v"), dir, batchId = 0L)
      .contains(0))
    assert(TxLog.appendStream(Seq((2L, "b")).toDF("id", "v"), dir, batchId = 1L)
      .contains(1))
    // replayed batch 0 (at-least-once delivery): skipped, no new version
    assert(TxLog.appendStream(Seq((9L, "dup")).toDF("id", "v"), dir, batchId = 0L)
      .isEmpty)
    assert(TxLog.headVersion(dir) == 1)
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((1L, "a"), (2L, "b")))
    assert(TxLog.commitOp(dir, 0) == "stream-0" && TxLog.commitOp(dir, 1) == "stream-1")
  }

  test("CONCURRENT duplicates of one batch id apply exactly once (append + MoR merge)") {
    // the cross-process at-least-once race: two writers replay the SAME
    // batch id concurrently — the dedup check and the commit run against
    // one snapshot, so the loser either conflicts-and-skips or observes
    // the winner's op; never a double apply
    val dir = freshDir()
    TxLog.append(Seq((0L, "seed")).toDF("id", "v"), dir)
    def race(body: => Option[Int]): Seq[Option[Int]] = {
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[Int]]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val ts = (0 until 2).map(_ => new Thread(() =>
        try { barrier.await(); results.add(body); () }
        catch {
          case _: java.util.ConcurrentModificationException =>
            // loud conflict: the foreachBatch retry model re-runs the
            // batch, which then dedups — simulate that retry here
            results.add(body); ()
          case t: Throwable => errs.add(t); ()
        }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"unexpected failures: ${errs.toArray.toSeq}")
      results.toArray(Array.empty[Option[Int]]).toSeq
    }
    val appendResults = race(
      TxLog.appendStream(Seq((1L, "a")).toDF("id", "v"), dir, batchId = 7L))
    assert(appendResults.count(_.nonEmpty) == 1,
      s"batch 7 must commit exactly once, got $appendResults")
    assert(TxLog.read(spark, dir).filter("id = 1").count() == 1)
    // no orphaned staging segment from the losing duplicate
    val recorded = (0 to TxLog.headVersion(dir))
      .flatMap(v => TxLog.liveSegments(dir, v)).toSet
    val onDisk = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("seg-"))
      .map(_.getName).toSet
    assert(onDisk == recorded, s"leaked segments: ${onDisk -- recorded}")
    val mergeResults = race(
      TxLog.mergeStreamMoR(spark, dir,
        Seq((1L, "a2"), (2L, "c")).toDF("id", "v"), "id", batchId = 8L))
    assert(mergeResults.count(_.nonEmpty) == 1,
      s"batch 8 must merge exactly once, got $mergeResults")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((0L, "seed"), (1L, "a2"), (2L, "c")))
  }

  test("merge against a stale snapshot conflicts instead of double-applying") {
    val dir = rangedTable()
    // merge snapshots internally, so exercise the conditional-commit
    // contract it relies on: a commit whose expectedHead is stale (a
    // concurrent commit landed after the snapshot) must conflict.
    intercept[java.util.ConcurrentModificationException] {
      TxLog.commit(dir, "merge", Seq.empty, Seq.empty,
        expectedHead = Some(TxLog.headVersion(dir) - 1))
    }
  }

  test("analyze backfills stats and blooms metadata-only, idempotently") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (5L, "b")).toDF("id", "v"), dir)   // no stats
    TxLog.append(Seq((10L, "c"), (15L, "d")).toDF("id", "v"), dir) // no stats
    assert(TxLog.pruneRange(dir, "id", Some("10"), Some("15"))._2.isEmpty)
    assert(TxLog.prunePoint(dir, "id", "15")._2.isEmpty)
    val segsBefore = TxLog.liveSegments(dir).toSet
    assert(TxLog.analyze(spark, dir, Seq("id"), Seq("id")).contains(2))
    assert(TxLog.liveSegments(dir).toSet == segsBefore,
      "analyze must not touch the segment set")
    assert(TxLog.pruneRange(dir, "id", Some("10"), Some("15"))._2.size == 1)
    assert(TxLog.prunePoint(dir, "id", "15")._2.size == 1)
    // idempotent: everything covered -> no new commit
    assert(TxLog.analyze(spark, dir, Seq("id"), Seq("id")).isEmpty)
    // a later statless append re-arms it
    TxLog.append(Seq((99L, "e")).toDF("id", "v"), dir)
    assert(TxLog.analyze(spark, dir, Seq("id")).contains(4))
  }

  test("restore re-references an old version without rewriting history") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir) // v0
    TxLog.append(Seq((3L, "c")).toDF("id", "v"), dir)            // v1
    TxLog.delete(spark, dir, "id = 2")                           // v2
    val v = TxLog.restore(dir, toVersion = 1)                    // v3
    assert(v == 3 && TxLog.commitOp(dir, 3) == "restore")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((1L, "a"), (2L, "b"), (3L, "c")),
      "restored head must undo the delete")
    // the deleted state remains time-travelable
    assert(TxLog.read(spark, dir, asOf = 2).orderBy("id")
      .as[(Long, String)].collect().toList == List((1L, "a"), (3L, "c")))
    // restore re-references: no new segment directory was written
    assert(TxLog.liveSegments(dir, 3).toSet == TxLog.liveSegments(dir, 1).toSet)
    // restoring to a vacuumed version fails loud, not silently empty
    TxLog.vacuum(dir, keepVersions = 1)
    intercept[IllegalArgumentException] { TxLog.restore(dir, toVersion = 2) }
  }

  test("update applies SET only to matching rows, rewrites only dirty segments") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), dir)
    TxLog.append(Seq((10L, 100L), (11L, 110L)).toDF("id", "x"), dir)
    val before = TxLog.liveSegments(dir).toSet
    TxLog.update(spark, dir, "id = 10", Map("x" -> "x + 1"))
    val after = TxLog.liveSegments(dir).toSet
    assert((before intersect after).size == 1,
      s"clean segment must survive by reference: $before -> $after")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, Long)].collect()
      .toList == List((1L, 10L), (2L, 20L), (10L, 101L), (11L, 110L)))
    assert(TxLog.commitOp(dir, TxLog.headVersion(dir)) == "update")
    // no-match update: metadata-only commit, contents untouched
    TxLog.update(spark, dir, "id = 999", Map("x" -> "0"))
    assert(TxLog.read(spark, dir).count() == 4)
  }

  test("update evaluates predicate and SET against the PRE-update row") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L, 100L), (2L, 20L, 200L)).toDF("id", "x", "y"), dir)
    // SQL swap semantics: both RHS read the old row, and the predicate
    // must not observe the mutated x
    TxLog.update(spark, dir, "x = 10", Map("x" -> "y", "y" -> "x"))
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, Long, Long)]
      .collect().toList == List((1L, 100L, 10L), (2L, 20L, 200L)))
    // SET to a value that would un-match the predicate: still applied
    // to every originally-matching row exactly once
    TxLog.update(spark, dir, "y = 10", Map("y" -> "0", "x" -> "x + 1"))
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, Long, Long)]
      .collect().toList == List((1L, 101L, 0L), (2L, 20L, 200L)))
    intercept[IllegalArgumentException] {
      TxLog.update(spark, dir, "id = 1", Map("nope" -> "0"))
    }
  }

  test("update and optimize preserve an evolved column") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    TxLog.append(Seq((2L, "b", 9L)).toDF("id", "v", "w"), dir) // evolved
    // update across the evolution boundary: old rows read w as null
    TxLog.update(spark, dir, "id >= 1", Map("v" -> "concat(v, 'x')"))
    val got = TxLog.read(spark, dir, mergeSchema = true).orderBy("id")
      .as[(Long, String, Option[Long])].collect().toList
    assert(got == List((1L, "ax", None), (2L, "bx", Some(9L))))
    // optimize must carry the evolved column, not drop it on a
    // single-footer schema inference
    TxLog.optimize(spark, dir, Seq("id"), numSegments = 1, statsCols = Seq("id"))
    val after = TxLog.read(spark, dir).orderBy("id")
      .as[(Long, String, Option[Long])].collect().toList
    assert(after == got, "optimize dropped or mangled the evolved column")
  }

  test("optimizeBy(zorder) makes BOTH dimensions prunable") {
    val dir = freshDir()
    // a 2D grid where every original segment spans both full ranges
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    TxLog.append(grid.filter(g => (g._1 + g._2) % 2 == 0).toDF("x", "y"), dir)
    TxLog.append(grid.filter(g => (g._1 + g._2) % 2 == 1).toDF("x", "y"), dir)
    assert(TxLog.pruneRange(dir, "x", Some("0"), Some("3"))._2.isEmpty,
      "nothing should prune before clustering (and no stats exist yet)")
    TxLog.optimizeBy(spark, dir,
      graft.sources.Warehouse.zorder2(col("x"), col("y"), bits = 4),
      numSegments = 4, statsCols = Seq("x", "y"))
    val px = TxLog.pruneRange(dir, "x", Some("0"), Some("3"))._2
    val py = TxLog.pruneRange(dir, "y", Some("0"), Some("3"))._2
    assert(px.nonEmpty && py.nonEmpty,
      s"z-order should prune on both dims: x pruned=${px.size}, y pruned=${py.size}")
    assert(TxLog.readRange(spark, dir, "x", Some("0"), Some("3")).count() == 64)
    assert(TxLog.readRange(spark, dir, "y", Some("0"), Some("3")).count() == 64)
  }

  test("optimize re-clusters into N stats-bearing segments without logical change") {
    val dir = freshDir()
    // two appends with INTERLEAVED ids: no range pruning possible on id
    TxLog.appendWithStats(spark,
      Seq((1L, "a"), (100L, "z"), (50L, "m")).toDF("id", "v"), dir, Seq("id"))
    TxLog.appendWithStats(spark,
      Seq((2L, "b"), (99L, "y"), (51L, "n")).toDF("id", "v"), dir, Seq("id"))
    assert(TxLog.pruneRange(dir, "id", Some("90"), Some("100"))._2.isEmpty,
      "interleaved layout must not be prunable yet")
    val before = TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect().toList
    TxLog.optimize(spark, dir, Seq("id"), numSegments = 3, statsCols = Seq("id"))
    val after = TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect().toList
    assert(after == before, "optimize must not change logical contents")
    assert(TxLog.liveSegments(dir).size == 3,
      s"expected 3 clustered segments, got ${TxLog.liveSegments(dir)}")
    // the re-clustered layout IS prunable on the sort key
    val (k1, p1) = TxLog.pruneRange(dir, "id", Some("90"), Some("100"))
    assert(k1.size == 1 && p1.size == 2,
      s"clustered layout should prune 2 of 3: kept=$k1 pruned=$p1")
    assert(TxLog.commitOp(dir, TxLog.headVersion(dir)) == "optimize")
    // no staging leftovers on disk
    val onDisk = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("seg-")).toSet
    val recorded = (0 to TxLog.headVersion(dir))
      .flatMap(v => TxLog.liveSegments(dir, v)).toSet
    assert(onDisk subsetOf recorded, s"staging leaked: ${onDisk -- recorded}")
  }

  test("stats survive delete/merge rewrites when statsCols is passed") {
    val dir = rangedTable()
    TxLog.merge(spark, dir, Seq((10L, "C2")).toDF("id", "v"), "id",
      statsCols = Seq("id"))
    // the rewritten segment re-records stats: the range read still prunes
    val (kept, pruned) = TxLog.pruneRange(dir, "id", Some("20"), Some("25"))
    assert(pruned.size == 2, s"rewrite lost stats: kept=$kept pruned=$pruned")
  }
}
