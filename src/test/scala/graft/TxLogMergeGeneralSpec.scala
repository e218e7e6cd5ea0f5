package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.sources.TxLog

/** General MERGE shapes ([[TxLog.mergeGeneral]] + the
  * [[graft.sources.txlog.TxLogSqlDml]] SQL route): conditional /
  * multiple / partial-SET matched clauses, matched DELETE, conditional
  * inserts, NOT MATCHED BY SOURCE — everything the full-row upsert
  * fast path refuses. Covers first-match-wins ordering, the route
  * split (upsert shape still plans the probe-pruned fast path),
  * rewrite scoping (match-bearing segments only, unless NMBS forces
  * all), CDF decomposition off the action-tagged staging, and the loud
  * contracts (duplicate source keys, empty table). */
class TxLogMergeGeneralSpec extends SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txmg").toString

  import org.apache.spark.sql.functions._

  /** target: ids 0..9, cents = id*10; returns dir. */
  private def seed(tbl: String): String = {
    val dir = freshDir()
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"""CREATE TABLE $tbl USING txlog OPTIONS (path '$dir') AS
      SELECT CAST(id AS INT) AS id, id * 10 AS cents FROM range(10)""")
    dir
  }

  private def srcView(name: String): Unit =
    spark.sql(s"""CREATE OR REPLACE TEMP VIEW $name AS
      SELECT CAST(id AS INT) AS id, id * 100 AS cents
      FROM range(6, 14)""")

  private def rows(df: DataFrame): Seq[(Int, Long)] =
    df.orderBy("id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

  test("SQL MERGE: all four general clause families in one statement") {
    val dir = seed("mg_all")
    srcView("mg_src")
    spark.sql("""MERGE INTO mg_all t USING mg_src s ON t.id = s.id
      WHEN MATCHED AND t.id % 2 = 0 THEN UPDATE SET cents = s.cents
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED AND s.id < 12 THEN
        INSERT (id, cents) VALUES (s.id, s.cents + 1)
      WHEN NOT MATCHED BY SOURCE AND t.id = 3 THEN UPDATE SET cents = -1
      WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN DELETE""")
    // matched evens 6,8 updated; matched odds 7,9 deleted; 10,11
    // inserted (+1), 12,13 dropped by the insert condition; id 3
    // NMBS-updated, id 4 NMBS-deleted, the rest untouched
    assert(rows(spark.table("mg_all")) == Seq(
      0 -> 0L, 1 -> 10L, 2 -> 20L, 3 -> -1L, 5 -> 50L,
      6 -> 600L, 8 -> 800L, 10 -> 1001L, 11 -> 1101L))
    // one MERGE = one commit
    assert(TxLog.headVersion(dir) == 1)
    assert(TxLog.commitOp(dir, 1) == "merge")
  }

  test("first-match-wins among matched clauses (SQL order, not best fit)") {
    seed("mg_order")
    srcView("mg_src2")
    spark.sql("""MERGE INTO mg_order t USING mg_src2 s ON t.id = s.id
      WHEN MATCHED AND t.id >= 0 THEN UPDATE SET cents = 1
      WHEN MATCHED THEN UPDATE SET cents = 2""")
    // both conditions hold for every matched row — the FIRST applies
    assert(rows(spark.table("mg_order")).filter(_._1 >= 6)
      .filter(_._1 <= 9).forall(_._2 == 1L))
  }

  test("partial SET keeps unassigned columns; SET may reference both sides") {
    val dir = freshDir()
    spark.sql("DROP TABLE IF EXISTS mg_part")
    spark.sql(s"""CREATE TABLE mg_part USING txlog OPTIONS (path '$dir') AS
      SELECT CAST(id AS INT) AS id, id * 10 AS cents, 'keep' AS status
      FROM range(10)""")
    srcView("mg_src3")
    spark.sql("""MERGE INTO mg_part t USING mg_src3 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET cents = t.cents + s.cents""")
    val r = spark.table("mg_part").orderBy("id").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getString(2))).toSeq
    assert(r.forall(_._3 == "keep"), "unassigned column must survive")
    assert(r.filter(t => t._1 >= 6 && t._1 <= 9).map(_._2) ==
      Seq(660L, 770L, 880L, 990L))
    assert(r.count(_ => true) == 10, "no inserts were requested")
  }

  test("the full-row upsert shape still plans the probe-pruned fast path") {
    seed("mg_fast")
    srcView("mg_src4")
    val fast = spark.sql("""EXPLAIN MERGE INTO mg_fast t USING mg_src4 s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").head().getString(0)
    assert(fast.contains("TxLogMergeCommand") &&
      !fast.contains("TxLogMergeGeneralCommand"),
      s"upsert must keep the fast path, planned:\n$fast")
    val gen = spark.sql("""EXPLAIN MERGE INTO mg_fast t USING mg_src4 s
      ON t.id = s.id
      WHEN MATCHED AND t.cents < s.cents THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").head().getString(0)
    assert(gen.contains("TxLogMergeGeneralCommand"),
      s"a conditional matched clause must route general, planned:\n$gen")
  }

  test("rewrite scope: match-bearing segments only; NMBS forces all live") {
    import spark.implicits._
    val dir = freshDir()
    // two stats-carrying segments with disjoint id ranges
    TxLog.appendWithStats(spark,
      (0 to 9).map(i => (i, i * 10L)).toDF("id", "cents"), dir, Seq("id"))
    TxLog.appendWithStats(spark,
      (100 to 109).map(i => (i, i * 10L)).toDF("id", "cents"), dir, Seq("id"))
    val before = TxLog.liveSegments(dir)
    // source hits only the second segment's range
    val src = Seq((105, 1L)).toDF("id", "cents")
    TxLog.mergeGeneral(spark, dir, src, "id",
      matched = Seq(TxLog.MergeUpdateClause(None, Map("cents" -> "s.cents"))))
    val after = TxLog.liveSegments(dir)
    assert(after.contains(before.head),
      "the unmatched segment must carry by reference")
    assert(!after.contains(before(1)), "the matched segment must rewrite")
    // an NMBS clause acts on rows ABSENT from the source — no stats
    // can prune that, so every live segment rewrites
    TxLog.mergeGeneral(spark, dir, src, "id",
      notMatchedBySource = Seq(TxLog.MergeUpdateClause(
        Some("t.id = 0"), Map("cents" -> "t.cents + 1"))))
    val afterNmbs = TxLog.liveSegments(dir)
    assert(afterNmbs.intersect(after).isEmpty,
      "NMBS must rewrite every live segment")
    // and the content is exactly: id0 bumped, everything else kept
    val r = TxLog.read(spark, dir).orderBy("id").collect()
      .map(x => (x.getInt(0), x.getLong(1))).toSeq
    assert(r.head == (0 -> 1L))
    assert(r.count(_ => true) == 20)
    assert(r.contains(105 -> 1L))
  }

  test("CDF decomposes a general merge into exact row-level classes") {
    import spark.implicits._
    val dir = freshDir()
    TxLog.append((0 to 5).map(i => (i, i * 10L)).toDF("id", "cents"), dir)
    TxLog.enableChangeDataFeed(dir)
    val src = Seq((0, 999L), (1, 999L), (50, 500L)).toDF("id", "cents")
    TxLog.mergeGeneral(spark, dir, src, "id",
      matched = Seq(
        TxLog.MergeUpdateClause(Some("t.id = 0"), Map("cents" -> "s.cents")),
        TxLog.MergeDeleteClause(None)),
      notMatched = Seq(TxLog.MergeInsertClause(None,
        Map("id" -> "s.id", "cents" -> "s.cents"))))
    val feed = TxLog.readChangeFeed(spark, dir, 1) // changes after set_cdf
      .select(col("id"), col("cents"), col("_change_type"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(feed == Set(
      (0, 0L, "update_preimage"), (0, 999L, "update_postimage"),
      (1, 10L, "delete"), (50, 500L, "insert")))
  }

  test("loud contracts: duplicate source keys, empty table, matched INSERT") {
    import spark.implicits._
    val dir = freshDir()
    TxLog.append(Seq((1, 1L)).toDF("id", "cents"), dir)
    val dup = Seq((1, 1L), (1, 2L)).toDF("id", "cents")
    val e = intercept[Exception](TxLog.mergeGeneral(spark, dir, dup, "id",
      matched = Seq(TxLog.MergeDeleteClause(None))))
    assert(e.getMessage.contains("unique"),
      s"duplicate keys must be loud, got: ${e.getMessage}")
    val empty = freshDir()
    val e2 = intercept[Exception](TxLog.mergeGeneral(spark, empty,
      Seq((1, 1L)).toDF("id", "cents"), "id",
      matched = Seq(TxLog.MergeDeleteClause(None))))
    assert(e2.getMessage.contains("empty"))
    val e3 = intercept[Exception](TxLog.mergeGeneral(spark, dir,
      Seq((1, 1L)).toDF("id", "cents"), "id",
      matched = Seq(TxLog.MergeInsertClause(None, Map.empty))))
    assert(e3.getMessage.contains("UPDATE/DELETE"))
  }

  test("ON t.key = s.otherName joins the named source column, not a decoy") {
    import spark.implicits._
    val dir = seed("mg_skey")
    // the source's join key is customer_id; it ALSO carries an
    // unrelated column named `id` (the target key's name) with decoy
    // values — joining by name would match nothing real and corrupt
    // the matched/not-matched classification
    spark.sql("""CREATE OR REPLACE TEMP VIEW mg_skey_src AS
      SELECT CAST(id AS INT) AS customer_id,
             CAST(id + 1000 AS INT) AS id,
             id * 100 AS cents
      FROM range(8, 12)""")
    spark.sql("""MERGE INTO mg_skey t USING mg_skey_src s
      ON t.id = s.customer_id
      WHEN MATCHED THEN UPDATE SET cents = s.cents
      WHEN NOT MATCHED THEN INSERT (id, cents) VALUES (s.customer_id, s.cents)""")
    val want = (0 to 7).map(i => (i, i * 10L)) ++
      (8 to 11).map(i => (i, i * 100L))
    assert(rows(spark.table("mg_skey")) == want,
      "8,9 update in place; 10,11 insert under their customer_id — " +
        "never under the decoy id")
  }

  test("MERGE into a freshly created EMPTY table: inserts append, matched/NMBS are vacuous") {
    import spark.implicits._
    val dir = freshDir()
    spark.sql("DROP TABLE IF EXISTS mg_boot")
    spark.sql(s"""CREATE TABLE mg_boot (id INT, cents BIGINT)
      USING txlog OPTIONS (path '$dir')""")
    srcView("mg_boot_src")
    // a general shape (conditional insert + matched/NMBS clauses that
    // CANNOT fire — no target rows): the post-CREATE bootstrap pattern
    spark.sql("""MERGE INTO mg_boot t USING mg_boot_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET cents = s.cents
      WHEN NOT MATCHED AND s.id % 2 = 0 THEN
        INSERT (id, cents) VALUES (s.id, s.cents)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rows(spark.table("mg_boot")) ==
      Seq(6, 8, 10, 12).map(i => (i, i * 100L)))
    // API route: targetSchema unlocks the same bootstrap
    val dirA = freshDir()
    TxLog.mergeGeneral(spark, dirA,
      Seq((1, 5L), (2, 6L)).toDF("id", "cents"), "id",
      notMatched = Seq(TxLog.MergeInsertClause(None,
        Map("id" -> "s.id", "cents" -> "s.cents"))),
      targetSchema = Some(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cents",
          org.apache.spark.sql.types.LongType)))))
    assert(rows(TxLog.read(spark, dirA)) == Seq((1, 5L), (2, 6L)))
  }

  test("SQL parity: the same general merge through SQL and the API agree") {
    import spark.implicits._
    val (dirS, dirA) = (freshDir(), freshDir())
    val base = (0 to 9).map(i => (i, i * 10L))
    spark.sql("DROP TABLE IF EXISTS mg_par")
    TxLog.append(base.toDF("id", "cents"), dirS)
    spark.sql(s"CREATE TABLE mg_par USING txlog LOCATION '$dirS'")
    TxLog.append(base.toDF("id", "cents"), dirA)
    srcView("mg_src5")
    spark.sql("""MERGE INTO mg_par t USING mg_src5 s ON t.id = s.id
      WHEN MATCHED AND s.cents > 700 THEN DELETE
      WHEN MATCHED THEN UPDATE SET cents = s.cents
      WHEN NOT MATCHED AND s.id % 2 = 0 THEN
        INSERT (id, cents) VALUES (s.id, 0)""")
    TxLog.mergeGeneral(spark, dirA,
      spark.table("mg_src5"), "id",
      matched = Seq(
        TxLog.MergeDeleteClause(Some("s.cents > 700")),
        TxLog.MergeUpdateClause(None, Map("cents" -> "s.cents"))),
      notMatched = Seq(TxLog.MergeInsertClause(Some("s.id % 2 = 0"),
        Map("id" -> "s.id", "cents" -> "0"))))
    assert(rows(spark.table("mg_par")) == rows(TxLog.read(spark, dirA)))
    assert(rows(spark.table("mg_par")) == Seq(
      0 -> 0L, 1 -> 10L, 2 -> 20L, 3 -> 30L, 4 -> 40L, 5 -> 50L,
      6 -> 600L, 7 -> 700L, 10 -> 0L, 12 -> 0L))
  }
}
