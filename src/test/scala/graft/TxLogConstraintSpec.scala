package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Persistent table CHECK constraints (Delta's table constraints):
  * recorded in table metadata by ALTER-style commits, enforced at the
  * segment-staging choke point on every row-adding write, and gated
  * behind writer protocol 3 so a pre-constraint writer refuses to
  * append rows it never knew to check. */
class TxLogConstraintSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txcons").toString

  test("addConstraint validates existing rows and bumps the writer floor only") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "cents"), dir)
    // existing data violates -> refused, nothing committed
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, dir, "big", "cents >= 15")
    }
    assert(TxLog.headVersion(dir) == 0)
    val v = TxLog.addConstraint(spark, dir, "nonneg", "cents >= 0")
    assert(TxLog.commitOp(dir, v) == "add_constraint")
    assert(TxLog.constraintsOf(dir) == Map("nonneg" -> "cents >= 0"))
    assert(TxLog.protocolOf(dir) == ((1, 3)),
      "constraints are a WRITER feature: reader floor must stay 1")
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, dir, "nonneg", "cents >= 1") // duplicate name
    }
  }

  test("every row-adding write path enforces; NULL passes (SQL CHECK semantics)") {
    val dir = freshDir()
    TxLog.append(Seq((1L, Some(10L))).toDF("id", "cents"), dir)
    TxLog.addConstraint(spark, dir, "nonneg", "cents >= 0")
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, Some(-5L))).toDF("id", "cents"), dir)
    }
    assert(e.getMessage.contains("nonneg"))
    // NULL is not FALSE: admitted, like Delta/SQL CHECK
    TxLog.append(Seq((3L, None: Option[Long])).toDF("id", "cents"), dir)
    // UPDATE rewrites are new segments too: a violating update is refused
    intercept[IllegalArgumentException] {
      TxLog.update(spark, dir, "id = 1", Map("cents" -> "cents - 100"))
    }
    // overwrite and merge funnel through the same staging choke point
    intercept[IllegalArgumentException] {
      TxLog.overwrite(Seq((9L, Some(-1L))).toDF("id", "cents"), dir)
    }
    assert(TxLog.read(spark, dir).orderBy("id")
      .as[(Long, Option[Long])].collect().toList ==
      List((1L, Some(10L)), (3L, None)),
      "refused writes must leave contents untouched")
    // staged bytes of refused writes are reclaimed, not leaked
    val leaked = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("seg-") && f.isDirectory)
    assert(leaked.length == TxLog.liveSegments(dir).size,
      s"orphaned staged segments: ${leaked.map(_.getName).toList}")
  }

  test("dropConstraint restores writability; constraints survive checkpoints and restore") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L)).toDF("id", "cents"), dir) // v0
    TxLog.addConstraint(spark, dir, "nonneg", "cents >= 0") // v1
    (2 to 9).foreach(i => TxLog.append(Seq((i.toLong, i * 10L)).toDF("id", "cents"), dir))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(f"$dir/_txlog/${9}%08d.checkpoint")))
    // replay THROUGH the checkpoint keeps the constraint
    (0 to 8).foreach(v =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(f"$dir/_txlog/$v%08d.txt")))
    assert(TxLog.constraintsOf(dir) == Map("nonneg" -> "cents >= 0"))
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((99L, -1L)).toDF("id", "cents"), dir)
    }
    TxLog.dropConstraint(dir, "nonneg")
    assert(TxLog.constraintsOf(dir).isEmpty)
    TxLog.append(Seq((99L, -1L)).toDF("id", "cents"), dir) // admitted now
    assert(TxLog.read(spark, dir).count() == 10)
  }

  test("restore rolls constraint metadata back to the target version's set") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L)).toDF("id", "cents"), dir)      // v0
    TxLog.addConstraint(spark, dir, "nonneg", "cents >= 0")    // v1
    TxLog.dropConstraint(dir, "nonneg")                        // v2
    TxLog.addConstraint(spark, dir, "small", "cents < 1000")   // v3
    TxLog.restore(dir, toVersion = 1)                          // v4
    assert(TxLog.constraintsOf(dir) == Map("nonneg" -> "cents >= 0"),
      "restore must re-record the target's constraints and drop later adds")
    intercept[IllegalArgumentException] {
      TxLog.append(Seq((2L, -1L)).toDF("id", "cents"), dir)
    }
  }
}
