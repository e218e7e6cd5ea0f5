package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Size-tiered small-file compaction: only the small tail is
  * rewritten; the bulk carries by reference. */
class TxLogCompactSmallSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txsmall").toString

  private def rows(lo: Int, hi: Int) =
    spark.range(lo.toLong, hi.toLong).select(col("id"),
      concat(lit("pad-"), col("id"), lit("-"),
        lit("x" * 64)).as("v")) // padding so sizes scale with rows

  test("compactSmall merges only the small tail; the bulk carries by reference") {
    val dir = freshDir()
    TxLog.append(rows(0, 2000), dir)              // the bulk
    TxLog.append(rows(2000, 2010), dir)           // 3 micro-batch segments
    TxLog.append(rows(2010, 2025), dir)
    TxLog.append(rows(2025, 2030), dir)
    val big = TxLog.liveSegments(dir, 0).head
    def bytes(seg: String): Long =
      new java.io.File(dir, seg).listFiles.map(_.length).sum
    val bigBytes = bytes(big)
    val v = TxLog.compactSmall(spark, dir, smallBytes = bigBytes)
    assert(v.contains(4) && TxLog.commitOp(dir, 4) == "compact_small")
    val live = TxLog.liveSegments(dir).toSet
    assert(live.contains(big) && live.size == 2,
      s"expected {bulk, merged-tail}, got $live")
    assert(TxLog.read(spark, dir).count() == 2030)
    // pre-compaction layout stays time-travelable
    assert(TxLog.read(spark, dir, asOf = 3).count() == 2030)
    assert(TxLog.liveSegments(dir, 3).size == 4)
  }

  test("bin-packing: a long small tail rewrites as ONE multi-task job into multiple size-targeted segments") {
    val dir = freshDir()
    TxLog.append(rows(0, 4000), dir) // the bulk
    (0 until 12).foreach(i => // a streaming-ingest-shaped small tail
      TxLog.append(rows(4000 + i * 50, 4000 + (i + 1) * 50), dir))
    val big = TxLog.liveSegments(dir, 0).head
    def bytes(seg: String): Long =
      new java.io.File(dir, seg).listFiles.map(_.length).sum
    val total = TxLog.liveSegments(dir).filterNot(_ == big).map(bytes).sum
    val target = total / 3
    val expBins = ((total + target - 1) / target).toInt
    assert(expBins > 1, s"scenario must force multiple bins, got $expBins")
    // listener: the write stage of the compaction job must run with
    // one task PER BIN — the single-task coalesce(1) funnel this op
    // replaced would show numTasks == 1 everywhere
    val sawBinWidth = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.numTasks == expBins) sawBinWidth.set(true)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val v = TxLog.compactSmall(spark, dir, smallBytes = bytes(big),
        targetBytes = target)
      assert(v.nonEmpty && TxLog.commitOp(dir, v.get) == "compact_small")
      val live = TxLog.liveSegments(dir)
      assert(live.contains(big), "the bulk must carry by reference")
      val packed = live.filterNot(_ == big)
      assert(packed.size == expBins,
        s"expected $expBins size-targeted bins, got ${packed.size}")
      // every bin holds data (round-robin repartition fills all bins)
      packed.foreach(seg => assert(bytes(seg) > 0))
      assert(TxLog.read(spark, dir).count() == 4600)
      // pre-compaction layout stays time-travelable
      assert(TxLog.liveSegments(dir, 12).size == 13)
      // listener events are async — bounded wait
      val deadline = System.currentTimeMillis() + 10000
      while (!sawBinWidth.get && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(sawBinWidth.get,
        s"no stage ran with numTasks == $expBins: the rewrite did not " +
          "parallelize across bins")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("fewer than 2 small segments is a no-op; DV tombstones materialize away") {
    val dir = freshDir()
    TxLog.append(rows(0, 1000), dir)
    TxLog.append(rows(1000, 1005), dir)
    // only ONE small segment → nothing to gain, no commit
    assert(TxLog.compactSmall(spark, dir, smallBytes = 4096).isEmpty)
    assert(TxLog.headVersion(dir) == 1)
    // tombstone a row in each small-ish segment, then compact them:
    // the merged segment must carry the deletions applied
    TxLog.append(rows(1005, 1012), dir)
    TxLog.deleteMoR(spark, dir, "id IN (1001, 1006)")
    val big = TxLog.liveSegments(dir, 0).head
    def bytes(seg: String): Long =
      new java.io.File(dir, seg).listFiles.map(_.length).sum
    val v = TxLog.compactSmall(spark, dir, smallBytes = bytes(big))
    assert(v.nonEmpty)
    assert(TxLog.read(spark, dir).count() == 1010)
    assert(TxLog.read(spark, dir).filter("id IN (1001, 1006)").count() == 0)
    // the dead DV sidecar is reclaimable once the horizon passes
    TxLog.vacuum(dir, keepVersions = 1)
    assert(new java.io.File(dir).listFiles
      .count(_.getName.startsWith("dv-")) == 0)
    assert(TxLog.read(spark, dir).count() == 1010)
  }
}
