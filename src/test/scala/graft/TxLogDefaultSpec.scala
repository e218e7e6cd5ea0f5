package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Column DEFAULT values (Delta's defaultColumns writer feature):
  * metadata-recorded; a row-adding batch that LACKS the column gets
  * the expression materialized at staging. Defaults shape NEW writes
  * only — rows written before the default existed keep reading null,
  * including through rewrites (delete/update/compact must not
  * back-fill). */
class TxLogDefaultSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txdef").toString

  test("a batch lacking the column is filled; existing rows keep null; writer floor -> 3") {
    val dir = freshDir()
    TxLog.append(Seq(1L, 2L).toDF("id"), dir)                 // pre-default
    val v = TxLog.setColumnDefault(dir, "src", "'backfill'")
    assert(TxLog.commitOp(dir, v) == "set_default")
    assert(TxLog.defaultsOf(dir) == Map("src" -> "'backfill'"))
    assert(TxLog.protocolOf(dir) == ((1, 3)))
    TxLog.append(Seq(3L).toDF("id"), dir)                     // filled
    TxLog.append(Seq((4L, "explicit")).toDF("id", "src"), dir) // supplied wins
    assert(TxLog.read(spark, dir, mergeSchema = true).orderBy("id")
      .as[(Long, Option[String])].collect().toList ==
      List((1L, None), (2L, None), (3L, Some("backfill")),
        (4L, Some("explicit"))))
  }

  test("rewrites never back-fill: delete and compact keep pre-default rows null") {
    val dir = freshDir()
    TxLog.append(Seq(1L, 2L, 3L).toDF("id"), dir)
    TxLog.setColumnDefault(dir, "src", "'backfill'")
    TxLog.append(Seq(9L).toDF("id"), dir) // filled, so the column exists
    TxLog.delete(spark, dir, "id = 2")    // rewrites the pre-default segment
    def rows() = TxLog.read(spark, dir, mergeSchema = true).orderBy("id")
      .as[(Long, Option[String])].collect().toList
    assert(rows() == List((1L, None), (3L, None), (9L, Some("backfill"))),
      "a CoW rewrite must not invent default values for old rows")
    TxLog.compact(spark, dir)
    assert(rows() == List((1L, None), (3L, None), (9L, Some("backfill"))))
  }

  test("defaults compose with constraints and unset; restore rolls the metadata back") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 5L, "apac")).toDF("id", "cents", "region"), dir) // v0
    TxLog.setColumnDefault(dir, "region", "'emea'")                        // v1
    TxLog.addConstraint(spark, dir, "has_region", "region IS NOT NULL")    // v2
    // the constraint sees the FILLED value: a region-less batch passes
    TxLog.append(Seq((2L, 6L)).toDF("id", "cents"), dir)                   // v3
    assert(TxLog.read(spark, dir).filter("id = 2")
      .select("region").as[String].head() == "emea")
    TxLog.unsetColumnDefault(dir, "region")                                // v4
    assert(TxLog.defaultsOf(dir).isEmpty)
    TxLog.restore(dir, toVersion = 3)                                      // v5
    assert(TxLog.defaultsOf(dir) == Map("region" -> "'emea'"),
      "restore must re-record the target version's defaults")
  }

  test("a default expression can reference other columns of the batch") {
    val dir = freshDir()
    TxLog.append(Seq((1L, 10L)).toDF("id", "cents"), dir)
    TxLog.setColumnDefault(dir, "bucket", "CAST(cents / 10 AS BIGINT)")
    TxLog.append(Seq((2L, 70L)).toDF("id", "cents"), dir)
    assert(TxLog.read(spark, dir, mergeSchema = true).orderBy("id")
      .select("id", "bucket").as[(Long, Option[Long])].collect().toList ==
      List((1L, None), (2L, Some(7L))))
  }
}
