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

  test("generated referencing a defaulted column fills deterministically (defaults first)") {
    val dir = freshDir()
    // first row provides everything (retrofit validation needs it)
    TxLog.append(Seq((1L, 1L, 2L, 3L, 103L, 3L))
      .toDF("id", "z1", "z2", "z3", "a_gen", "b_gen"), dir)
    Seq("z1" -> "1", "z2" -> "2", "z3" -> "3").foreach { case (c, n) =>
      TxLog.setColumnDefault(dir, c, s"CAST($n AS BIGINT)") }
    TxLog.addGeneratedColumn(spark, dir, "a_gen", "z3 + CAST(100 AS BIGINT)")
    TxLog.addGeneratedColumn(spark, dir, "b_gen", "z1 + z2")
    // 5 absent fill targets (3 defaults + 2 generated, above Map's
    // ordered-small-map threshold): a batch missing ALL of them must
    // fill defaults strictly BEFORE generated — a single unordered fold
    // would evaluate `z3 + 100` before z3 exists whenever hash order
    // put a_gen first, a nondeterministic spurious AnalysisException
    TxLog.append(Seq(Tuple1(2L)).toDF("id"), dir)
    val row = TxLog.read(spark, dir).filter(col("id") === 2L)
      .select("z1", "z2", "z3", "a_gen", "b_gen")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(row == ((1L, 2L, 3L, 103L, 3L)), s"filled row: $row")
  }
}
