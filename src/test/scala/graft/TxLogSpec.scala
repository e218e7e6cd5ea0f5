package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

class TxLogSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txlog").toString

  private def segsOf(dir: String, asOf: Int = -1): Set[String] =
    TxLog.liveSegments(dir, asOf).toSet

  test("append/overwrite/delete/compact replay to the expected contents") {
    val dir = freshDir()
    val v0 = TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val v1 = TxLog.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), dir)
    val v2 = TxLog.delete(spark, dir, "id = 2")
    val v3 = TxLog.compact(spark, dir)
    assert(Seq(v0, v1, v2, v3) == Seq(0, 1, 2, 3))
    def rows(asOf: Int) = TxLog.read(spark, dir, asOf)
      .orderBy("id").as[(Long, String)].collect().toList
    assert(rows(0) == List((1L, "a"), (2L, "b")))
    assert(rows(1) == List((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(rows(2) == List((1L, "a"), (3L, "c"), (4L, "d")))
    assert(rows(3) == rows(2), "compact must not change logical contents")
    assert(TxLog.liveSegments(dir).size == 1, "compact leaves one segment")
  }

  test("copy-on-write delete rewrites ONLY segments containing matches") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    TxLog.append(Seq((10L, "x"), (11L, "y")).toDF("id", "v"), dir)
    val before = segsOf(dir)
    TxLog.delete(spark, dir, "id = 10")
    val after = segsOf(dir)
    // the first segment (no matches) must survive BY REFERENCE
    assert((before intersect after).size == 1,
      s"clean segment not carried over: before=$before after=$after")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((1L, "a"), (2L, "b"), (11L, "y")))
  }

  test("replaceWhere: all-match drops wholesale, no-match carries by reference, straddler rewrites") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "d1"), (2L, "d1")).toDF("id", "day"), dir) // all-match
    TxLog.append(Seq((3L, "d2"), (4L, "d2")).toDF("id", "day"), dir) // no-match
    TxLog.append(Seq((5L, "d1"), (6L, "d2")).toDF("id", "day"), dir) // straddler
    val before = segsOf(dir)
    val v = TxLog.replaceWhere(spark, dir, "day = 'd1'",
      Seq((7L, "d1"), (8L, "d1")).toDF("id", "day"))
    val after = segsOf(dir)
    assert((before intersect after).size == 1,
      s"exactly the no-match segment must survive by reference: before=$before after=$after")
    assert(TxLog.commitOp(dir, v) == "replace_where")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect().toList ==
      List((3L, "d2"), (4L, "d2"), (6L, "d2"), (7L, "d1"), (8L, "d1")))
    // empty replacement = pure frame delete, still one commit
    TxLog.replaceWhere(spark, dir, "day = 'd1'",
      Seq.empty[(Long, String)].toDF("id", "day"))
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect().toList ==
      List((3L, "d2"), (4L, "d2"), (6L, "d2")))
  }

  test("replaceWhere rejects incoming rows outside the predicate frame, leaking nothing") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "d1")).toDF("id", "day"), dir)
    intercept[IllegalArgumentException] {
      TxLog.replaceWhere(spark, dir, "day = 'd1'", Seq((2L, "d2")).toDF("id", "day"))
    }
    assert(TxLog.headVersion(dir) == 0, "failed replaceWhere must not commit")
    assert(TxLog.read(spark, dir).count() == 1)
  }

  test("replaceWhere does not resurrect MoR-tombstoned rows in a straddler") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "d1"), (2L, "d2"), (3L, "d2")).toDF("id", "day"), dir)
    TxLog.deleteMoR(spark, dir, "id = 3") // DV lands on the straddling segment
    TxLog.replaceWhere(spark, dir, "day = 'd1'", Seq((9L, "d1")).toDF("id", "day"))
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect().toList ==
      List((2L, "d2"), (9L, "d1")))
  }

  test("a pinned snapshot is immune to later commits (snapshot isolation)") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    val pinned = TxLog.read(spark, dir, asOf = 0) // segment list resolved NOW
    TxLog.overwrite(Seq((9L, "z")).toDF("id", "v"), dir)
    TxLog.append(Seq((10L, "w")).toDF("id", "v"), dir)
    assert(pinned.as[(Long, String)].collect().toList == List((1L, "a")),
      "pinned snapshot must keep reading its version's segments")
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((9L, "z"), (10L, "w")))
    // time travel back across the overwrite still works: bytes remain
    assert(TxLog.read(spark, dir, asOf = 0).as[(Long, String)].collect()
      .toList == List((1L, "a")))
  }

  test("racing committers serialize onto distinct versions (CAS retry)") {
    val dir = freshDir()
    TxLog.append(Seq((0L, "seed")).toDF("id", "v"), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = TxLog.append(Seq((i.toLong, s"t$i")).toDF("id", "v"), dir)
        })
      }
      val versions = futures.map(_.get()).toList
      assert(versions.toSet.size == 8, s"duplicate versions claimed: $versions")
      assert(versions.toSet == (1 to 8).toSet)
    } finally pool.shutdown()
    assert(TxLog.read(spark, dir).count() == 9)
  }

  test("a snapshot-dependent commit against a stale head conflicts, not double-applies") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)   // v0
    val snap = TxLog.headVersion(dir)                   // compact/delete snapshot
    TxLog.append(Seq((2L, "b")).toDF("id", "v"), dir)   // concurrent append -> v1
    // the stale conditional commit must fail WITHOUT claiming a slot
    intercept[java.util.ConcurrentModificationException] {
      TxLog.commit(dir, "compact", Seq("seg-x"), Seq("seg-y"), Some(snap))
    }
    assert(TxLog.headVersion(dir) == 1, "failed commit must leave no entry")
    assert(TxLog.read(spark, dir).count() == 2)
    // a fresh snapshot succeeds
    assert(TxLog.compact(spark, dir) == 2)
  }

  test("a crashed commit's temp file never becomes visible") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    // simulate a writer that died after staging its entry
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_txlog", ".commit-dead.tmp"),
      "op=append\nadd=seg-ghost\n".getBytes("UTF-8"))
    assert(TxLog.headVersion(dir) == 0)
    assert(TxLog.read(spark, dir).count() == 1)
    // and the next real commit is unaffected
    assert(TxLog.append(Seq((2L, "b")).toDF("id", "v"), dir) == 1)
  }

  test("readCommit returns exactly one commit's added segments") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    TxLog.append(Seq((3L, "c")).toDF("id", "v"), dir)
    TxLog.delete(spark, dir, "id = 1")
    assert(TxLog.readCommit(spark, dir, 1).as[(Long, String)].collect()
      .toList == List((3L, "c")))
    // a delete commit's add set is its rewrite output, flagged by op
    assert(TxLog.commitOp(dir, 2) == "delete")
    assert(TxLog.readCommit(spark, dir, 2).orderBy("id")
      .as[(Long, String)].collect().toList == List((2L, "b")))
    intercept[IllegalArgumentException] { TxLog.readCommit(spark, dir, 9) }
  }

  test("schema evolution: mergeSchema read surfaces new columns, old rows null") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    TxLog.append(Seq((2L, "b", "x")).toDF("id", "v", "extra"), dir)
    val got = TxLog.read(spark, dir, mergeSchema = true)
      .orderBy("id").select("id", "v", "extra")
      .as[(Long, String, Option[String])].collect().toList
    assert(got == List((1L, "a", None), (2L, "b", Some("x"))))
    // old segments were NOT rewritten by the evolution
    assert(TxLog.liveSegments(dir).size == 2)
  }

  test("vacuum reclaims only segments outside the retention horizon") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)      // v0
    TxLog.overwrite(Seq((2L, "b")).toDF("id", "v"), dir)   // v1: v0 seg dead
    TxLog.append(Seq((3L, "c")).toDF("id", "v"), dir)      // v2
    // DRY RUN first: reports the same reclaim set, deletes nothing
    val preview = TxLog.vacuum(dir, keepVersions = 2, dryRun = true)
    assert(preview.size == 1, s"dry run must report the v0 segment: $preview")
    assert(TxLog.read(spark, dir, asOf = 0).count() == 1,
      "dry run must not delete anything")
    val deleted = TxLog.vacuum(dir, keepVersions = 2)      // retain v1..v2
    assert(deleted == preview, "the real run reclaims exactly the preview")
    assert(deleted.size == 1, s"expected the v0 segment gone, got $deleted")
    // retained versions still replay exactly
    assert(TxLog.read(spark, dir, asOf = 1).as[(Long, String)].collect()
      .toList == List((2L, "b")))
    assert(TxLog.read(spark, dir).orderBy("id").as[(Long, String)].collect()
      .toList == List((2L, "b"), (3L, "c")))
    // time travel past the horizon now fails at scan time (bytes gone)
    intercept[Exception] { TxLog.read(spark, dir, asOf = 0).count() }
  }

  test("reading a nonexistent version fails loud") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] { TxLog.read(spark, dir, asOf = 5) }
  }

  test("vacuumRetain keeps the snapshot current at the window edge, reclaims older") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)      // v0
    Thread.sleep(5)
    TxLog.overwrite(Seq((2L, "b")).toDF("id", "v"), dir)   // v1: v0 seg dead
    Thread.sleep(5)
    TxLog.overwrite(Seq((3L, "c")).toDF("id", "v"), dir)   // v2: v1 seg dead
    val Seq(t0, t1, t2) = (0 to 2).map(v => TxLog.commitTimestamp(dir, v))
    // window reaching back before the first commit retains everything
    assert(TxLog.vacuumRetain(dir, retainMillis = t2 - t0 + 1000,
      asOfMillis = t2).isEmpty)
    assert(TxLog.read(spark, dir, asOf = 0).count() == 1)
    // cutoff lands ON v1's instant: v1 was current then → v1..head kept,
    // only v0's segment reclaimed
    val gone = TxLog.vacuumRetain(dir, retainMillis = t2 - t1, asOfMillis = t2)
    assert(gone.size == 1, s"expected v0's segment only, got $gone")
    assert(TxLog.read(spark, dir, asOf = 1).as[(Long, String)].collect()
      .toList == List((2L, "b")))
    // zero retention at the head instant keeps only the head snapshot
    // (the return re-reports all log-dead segments — vacuum is
    // idempotent — so assert inclusion, not count)
    val liveSeg = TxLog.liveSegments(dir).toSet
    val gone2 = TxLog.vacuumRetain(dir, retainMillis = 0, asOfMillis = t2)
    assert(gone2.size == 2 && !gone2.exists(liveSeg),
      s"expected both dead segments reported, live kept; got $gone2")
    assert(TxLog.read(spark, dir).as[(Long, String)].collect()
      .toList == List((3L, "c")))
    intercept[Exception] { TxLog.read(spark, dir, asOf = 1).count() }
  }

  test("time travel to a vacuumed version fails with a typed retention error") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)          // v0
    TxLog.overwrite(Seq((2L, "b")).toDF("id", "v"), dir)       // v1
    TxLog.vacuum(dir, keepVersions = 1)                        // v0 bytes gone
    val e = intercept[IllegalStateException] {
      TxLog.read(spark, dir, asOf = 0)
    }
    assert(e.getMessage.contains("vacuumed") &&
      e.getMessage.contains("retention"), s"wrong error: ${e.getMessage}")
    val e2 = intercept[IllegalStateException] {
      TxLog.readCommit(spark, dir, 0)
    }
    assert(e2.getMessage.contains("vacuumed"), s"wrong error: ${e2.getMessage}")
    // the head read never pays the probe and stays exact
    assert(TxLog.read(spark, dir).select(col("id")).as[Long].head() == 2L)
  }
}
