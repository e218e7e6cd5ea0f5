package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Generated columns (Delta's GENERATED ALWAYS AS): an expression
  * contract on a column — computed at staging when a batch omits it,
  * equality-validated (null-safe) when a batch provides it, retrofit
  * allowed only when every existing row already satisfies it. */
class TxLogGeneratedSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txgen").toString

  test("omitted -> computed, provided-correct -> admitted, provided-wrong -> refused") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 25L, 2L)).toDF("id", "cents", "bucket"), dir)
    val v = TxLog.addGeneratedColumn(spark, dir, "bucket",
      "CAST(cents / 10 AS BIGINT)")
    assert(TxLog.commitOp(dir, v) == "add_generated")
    assert(TxLog.generatedOf(dir) ==
      Map("bucket" -> "CAST(cents / 10 AS BIGINT)"))
    assert(TxLog.protocolOf(dir) == ((1, 3)))
    TxLog.append(Seq((2L, 70L)).toDF("id", "cents"), dir) // computed
    TxLog.append(Seq((3L, 30L, 3L)).toDF("id", "cents", "bucket"), dir)
    val e = intercept[IllegalArgumentException] {
      TxLog.append(Seq((4L, 40L, 9L)).toDF("id", "cents", "bucket"), dir)
    }
    assert(e.getMessage.contains("generated:bucket"))
    assert(TxLog.read(spark, dir).orderBy("id")
      .select("id", "bucket").as[(Long, Long)].collect().toList ==
      List((1L, 2L), (2L, 7L), (3L, 3L)))
  }

  test("retrofit requires every existing row to satisfy the expression") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 25L, 99L)).toDF("id", "cents", "bucket"), dir)
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, dir, "bucket", "CAST(cents / 10 AS BIGINT)")
    }
    assert(TxLog.headVersion(dir) == 0)
    // and a table whose segments LACK the column is refused outright
    val dir2 = freshDir()
    TxLog.append(Seq((1L, 25L)).toDF("id", "cents"), dir2)
    intercept[IllegalArgumentException] {
      TxLog.addGeneratedColumn(spark, dir2, "bucket", "CAST(cents / 10 AS BIGINT)")
    }
  }

  test("generated and default are mutually exclusive; drop lifts the contract") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L, 1L)).toDF("id", "cents", "bucket"), dir)
    TxLog.addGeneratedColumn(spark, dir, "bucket", "CAST(cents / 10 AS BIGINT)")
    intercept[IllegalArgumentException] {
      TxLog.setColumnDefault(dir, "bucket", "0")
    }
    TxLog.dropGeneratedColumn(dir, "bucket")
    assert(TxLog.generatedOf(dir).isEmpty)
    TxLog.append(Seq((2L, 10L, 77L)).toDF("id", "cents", "bucket"), dir)
    assert(TxLog.read(spark, dir).count() == 2)
  }

  test("rewrites revalidate cheaply and pass; restore rolls the contract back") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("id", "cents", "bucket"), dir)
    TxLog.addGeneratedColumn(spark, dir, "bucket", "CAST(cents / 10 AS BIGINT)") // v1
    TxLog.delete(spark, dir, "id = 1") // rewrite revalidates, passes
    TxLog.compact(spark, dir)
    assert(TxLog.read(spark, dir).select("id", "bucket")
      .as[(Long, Long)].collect().toList == List((2L, 2L)))
    TxLog.dropGeneratedColumn(dir, "bucket") // v4
    TxLog.restore(dir, toVersion = 3)        // back when the contract held
    assert(TxLog.generatedOf(dir) ==
      Map("bucket" -> "CAST(cents / 10 AS BIGINT)"))
  }
}
