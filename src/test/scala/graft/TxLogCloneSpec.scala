package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Zero-copy SHALLOW CLONE: the clone references the source's segments
  * in place, diverges independently, localizes on rewrite, and neither
  * side's maintenance can delete storage it doesn't own. */
class TxLogCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txclone").toString

  private def sampleDF(n: Int) =
    spark.range(n.toLong).select(col("id"), (col("id") % 10).as("k"),
      concat(lit("r"), col("id")).as("v"))

  private def dataDirs(dir: String): Set[String] =
    new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName != "_txlog").map(_.getName).toSet

  test("clone copies zero data bytes and reads identically, including DVs") {
    val src = freshDir(); val clone = freshDir() + "/c"
    TxLog.appendWithStats(spark, sampleDF(100).filter(col("id") < 50), src,
      Seq("id"))
    TxLog.appendWithStats(spark, sampleDF(100).filter(col("id") >= 50), src,
      Seq("id"))
    TxLog.deleteMoR(spark, src, "k = 4") // clone must see the tombstones
    val v = TxLog.cloneShallow(src, clone)
    assert(v == 0 && TxLog.commitOp(clone, 0) == "clone")
    assert(dataDirs(clone).isEmpty, "shallow clone must copy no data")
    assert(TxLog.read(spark, clone).orderBy("id").collect().toSeq ==
      TxLog.read(spark, src).orderBy("id").collect().toSeq)
    assert(TxLog.read(spark, clone).count() == 90)
    // carried stats still prune on the clone (value-based, portable)
    val (_, pruned) = TxLog.pruneRange(clone, "id", Some("10"), Some("19"))
    assert(pruned.nonEmpty, "clone lost the source's range-skipping stats")
  }

  test("clone is a snapshot: later source commits do not leak in, and vice versa") {
    val src = freshDir(); val clone = freshDir() + "/c"
    TxLog.append(sampleDF(40), src)
    TxLog.cloneShallow(src, clone)
    TxLog.append(sampleDF(100).filter(col("id") >= 90), src) // source moves on
    TxLog.append(sampleDF(210).filter(col("id") >= 200), clone) // clone moves on
    assert(TxLog.read(spark, src).count() == 50)
    assert(TxLog.read(spark, clone).count() == 50)
    assert(TxLog.read(spark, clone).filter("id >= 90 and id < 100").count() == 0)
    assert(TxLog.read(spark, src).filter("id >= 200").count() == 0)
  }

  test("DML on the clone writes only into the clone; MoR attribution crosses the boundary") {
    val src = freshDir(); val clone = freshDir() + "/c"
    TxLog.append(sampleDF(60), src)
    TxLog.cloneShallow(src, clone)
    val srcHead = TxLog.headVersion(src)
    // MoR delete on the CLONE: tombstones attribute to the EXTERNAL
    // segment reference (bare-name translation) — no resurrection
    TxLog.deleteMoR(spark, clone, "k = 3")
    assert(TxLog.read(spark, clone).count() == 54)
    assert(TxLog.read(spark, clone).filter("k = 3").count() == 0)
    // CoW update on the clone rewrites into the clone's own dir
    TxLog.update(spark, clone, "k = 5", Map("v" -> "'up'"))
    assert(TxLog.read(spark, clone).filter("v = 'up'").count() == 6)
    assert(TxLog.headVersion(src) == srcHead, "clone DML moved the source head")
    assert(TxLog.read(spark, src).count() == 60, "clone DML changed source data")
    // the update localized the dirty segment: its output is owned
    assert(dataDirs(clone).exists(_.startsWith("seg-")))
  }

  test("rewrites localize the clone; vacuum never deletes borrowed storage") {
    val src = freshDir(); val clone = freshDir() + "/c"
    TxLog.append(sampleDF(30).filter(col("id") < 15), src)
    TxLog.append(sampleDF(30).filter(col("id") >= 15), src)
    TxLog.cloneShallow(src, clone)
    TxLog.compact(spark, clone) // localize: rewrite output is owned
    assert(TxLog.read(spark, clone).count() == 30)
    // the external refs are now dead history in the clone's log; vacuum
    // drops them from the log but must NOT reach into the source
    TxLog.vacuum(clone, keepVersions = 1)
    assert(TxLog.read(spark, src).count() == 30, "clone vacuum deleted source bytes")
    assert(TxLog.read(spark, clone).count() == 30)
    // fully severed: the clone now reads from owned storage only
    assert(TxLog.liveSegments(clone).forall(s => !s.startsWith("/") ||
      s.startsWith(new java.io.File(clone).getAbsolutePath)))
  }

  test("clone guards: empty source and non-empty target fail loud") {
    val src = freshDir(); val clone = freshDir() + "/c"
    intercept[IllegalArgumentException] { TxLog.cloneShallow(src, clone) }
    TxLog.append(sampleDF(5), src)
    TxLog.cloneShallow(src, clone)
    intercept[IllegalArgumentException] { TxLog.cloneShallow(src, clone) }
  }
}
