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
