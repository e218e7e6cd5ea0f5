package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Protocol (reader/writer format floors) — Delta's protocol action:
  * feature-using commits auto-record the floor they need, and a client
  * below a table's floor fails loud instead of misreading mapped
  * columns / resurrecting DV-tombstoned rows (reader) or committing a
  * rewrite that drops future-format metadata it never parsed (writer). */
class TxLogProtocolSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txproto").toString

  private def writeEntry(dir: String, v: Int, lines: String*): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(f"$dir/_txlog/$v%08d.txt"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("fresh tables are 1|1; the first DV commit auto-bumps to 2|2 in the same commit") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    assert(TxLog.protocolOf(dir) == ((1, 1)))
    TxLog.deleteMoR(spark, dir, "id = 2") // first deletion vector
    assert(TxLog.protocolOf(dir) == ((2, 2)))
    // the floor is versioned state: time travel before the bump sees 1|1
    assert(TxLog.protocolOf(dir, asOf = 0) == ((1, 1)))
    assert(TxLog.read(spark, dir).as[(Long, String)].collect().toList ==
      List((1L, "a")))
  }

  test("column-mapping commits auto-bump; explicit upgrade is monotonic") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    TxLog.renameColumn(spark, dir, "v", "w")
    assert(TxLog.protocolOf(dir) == ((2, 2)))
    intercept[IllegalArgumentException] {
      TxLog.upgradeProtocol(dir, 1, 1) // downgrade refused
    }
    assert(TxLog.commitOp(dir, TxLog.upgradeProtocol(dir, 2, 2)) ==
      "upgrade_protocol")
  }

  test("a future READER floor fails every read loud, including as-of reads past it") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    writeEntry(dir, 1, "op=upgrade_protocol", "protocol=99|99")
    val e = intercept[UnsupportedOperationException] {
      TxLog.read(spark, dir).count()
    }
    assert(e.getMessage.contains("reader protocol 99"))
    // pre-floor time travel is still safe: the floor wasn't in force
    assert(TxLog.read(spark, dir, asOf = 0).count() == 1)
  }

  test("a future WRITER-only floor keeps reads working but refuses commits") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a")).toDF("id", "v"), dir)
    writeEntry(dir, 1, "op=upgrade_protocol", "protocol=1|99")
    assert(TxLog.read(spark, dir).as[(Long, String)].collect().toList ==
      List((1L, "a")))
    val e = intercept[UnsupportedOperationException] {
      TxLog.append(Seq((2L, "b")).toDF("id", "v"), dir)
    }
    assert(e.getMessage.contains("writer protocol 99"))
    assert(TxLog.headVersion(dir) == 1, "refused append must not commit")
  }

  test("the floor survives checkpointing: replay from checkpoint alone keeps 2|2") {
    val dir = freshDir()
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir) // v0
    TxLog.deleteMoR(spark, dir, "id = 2")                        // v1: bump
    (2 to 9).foreach(i =>                                        // v2..v9
      TxLog.append(Seq((10L + i, s"t$i")).toDF("id", "v"), dir))
    val cp = java.nio.file.Paths.get(f"$dir/_txlog/${9}%08d.checkpoint")
    assert(java.nio.file.Files.exists(cp), "expected a checkpoint at v9")
    // sever the pre-checkpoint entries: state must come from the
    // checkpoint fold alone, so a dropped protocol line would surface
    (0 to 8).foreach(v =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(f"$dir/_txlog/$v%08d.txt")))
    assert(TxLog.protocolOf(dir) == ((2, 2)))
    assert(TxLog.read(spark, dir).count() == 9)
  }

  test("a shallow clone carries its source's protocol floor") {
    val dir = freshDir(); val tgt = freshDir() + "/clone"
    TxLog.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    TxLog.deleteMoR(spark, dir, "id = 2")
    TxLog.cloneShallow(dir, tgt)
    assert(TxLog.protocolOf(tgt) == ((2, 2)))
    assert(TxLog.read(spark, tgt).as[(Long, String)].collect().toList ==
      List((1L, "a")))
  }

  test("a shallow clone carries constraints, defaults, and generated contracts") {
    val dir = freshDir(); val tgt = freshDir() + "/clone"
    TxLog.append(Seq((1L, 10L, 1L)).toDF("id", "cents", "bucket"), dir)
    TxLog.addConstraint(spark, dir, "nonneg", "cents >= 0")
    TxLog.setColumnDefault(dir, "src", "'cloned'")
    TxLog.addGeneratedColumn(spark, dir, "bucket", "CAST(cents / 10 AS BIGINT)")
    TxLog.cloneShallow(dir, tgt)
    assert(TxLog.constraintsOf(tgt) == Map("nonneg" -> "cents >= 0"))
    assert(TxLog.defaultsOf(tgt) == Map("src" -> "'cloned'"))
    assert(TxLog.generatedOf(tgt) ==
      Map("bucket" -> "CAST(cents / 10 AS BIGINT)"))
    // governance is LIVE in the clone, not just copied metadata
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, -5L)).toDF("id", "cents"), tgt)
    }
    TxLog.append(Seq((3L, 30L)).toDF("id", "cents"), tgt)
    assert(TxLog.read(spark, tgt, mergeSchema = true).filter("id = 3")
      .select("src", "bucket").as[(String, Long)].head() == (("cloned", 3L)))
  }
}
