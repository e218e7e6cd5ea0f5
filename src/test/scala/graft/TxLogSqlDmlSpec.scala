package graft

import org.apache.spark.sql.SparkSession
import graft.sources.TxLog

/** SQL row-level DML on txlog catalog tables — `DELETE FROM` /
  * `UPDATE` / `MERGE INTO` — proven BIT-IDENTICAL to the Scala API
  * they bridge into ([[TxLog.delete]]/[[TxLog.update]]/
  * [[TxLog.merge]]): twin tables driven through both surfaces end in
  * the same content and the same commit count. Covers both routes
  * (Spark-native `SupportsDelete` for filter-translatable deletes;
  * the [[graft.sources.txlog.TxLogSqlDml]] rule for everything else),
  * a DV'd + renamed table, the OCC concurrent-append retry through
  * SQL, and the loud rejections (unsupported MERGE shapes, subquery
  * predicates, time-travel relations, DML without the extensions). */
class TxLogSqlDmlSpec extends SparkTestBase {

  /** The shared test session carries `GraftExtensions` (the
    * library-user configuration) — UPDATE / MERGE / arbitrary-
    * predicate DELETE resolve through its injected DML rule. */
  private def dml: SparkSession = spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txdml").toString

  /** Seed a table with 3 commits × 20 rows of (id, grp, cents,
    * status) through the given surface. */
  private def seedSql(s: SparkSession, tbl: String, dir: String): Unit = {
    s.sql(s"""CREATE TABLE $tbl USING txlog OPTIONS (path '$dir') AS
      SELECT id, CAST(id % 7 AS INT) AS grp,
             CAST(id * 10 AS BIGINT) AS cents,
             CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS status
      FROM range(20)""")
    (1 to 2).foreach { k =>
      s.sql(s"""INSERT INTO $tbl
        SELECT id, CAST(id % 7 AS INT), CAST(id * 10 AS BIGINT),
               CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END
        FROM range(${k * 20}, ${k * 20 + 20})""")
    }
  }

  private def seedApi(s: SparkSession, dir: String): Unit =
    (0 to 2).foreach { k =>
      TxLog.append(s.sql(
        s"""SELECT id, CAST(id % 7 AS INT) AS grp,
                   CAST(id * 10 AS BIGINT) AS cents,
                   CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS status
            FROM range(${k * 20}, ${k * 20 + 20})"""), dir)
    }

  private val mergeSourceSql =
    """SELECT id, CAST(id % 7 AS INT) AS grp, CAST(999 AS BIGINT) AS cents,
              'M' AS status FROM range(45, 70)"""

  test("SQL DELETE/UPDATE/MERGE ≡ the Scala API on twin tables") {
    val (dirS, dirA) = (freshDir(), freshDir())
    val tbl = "graft_dml_parity"
    dml.sql(s"DROP TABLE IF EXISTS $tbl")
    seedSql(dml, tbl, dirS)
    seedApi(dml, dirA)

    // translatable → native SupportsDelete; modulo → the rule's command
    dml.sql(s"DELETE FROM $tbl WHERE grp = 5")
    dml.sql(s"DELETE FROM $tbl WHERE id % 11 = 3")
    dml.sql(s"UPDATE $tbl SET cents = cents + 5, " +
      s"status = concat(status, 'x') WHERE grp = 2")
    dml.sql(s"""MERGE INTO $tbl t USING ($mergeSourceSql) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")

    TxLog.delete(dml, dirA, "grp = 5")
    TxLog.delete(dml, dirA, "id % 11 = 3")
    TxLog.update(dml, dirA, "grp = 2",
      Map("cents" -> "cents + 5", "status" -> "concat(status, 'x')"))
    TxLog.merge(dml, dirA, dml.sql(mergeSourceSql), "id")

    val got = dml.table(tbl).orderBy("id").collect().toSeq
    val want = TxLog.read(dml, dirA)
      .select("id", "grp", "cents", "status").orderBy("id").collect().toSeq
    assert(got == want, s"SQL table diverged from API twin")
    assert(got.nonEmpty && got.size < 70)
    // same number of commits on both logs (CTAS+2 inserts = 3 appends)
    assert(TxLog.headVersion(dirS) == TxLog.headVersion(dirA),
      s"${TxLog.headVersion(dirS)} vs ${TxLog.headVersion(dirA)}")
  }

  test("route pins: translatable DELETE plans native, modulo plans the command") {
    val dir = freshDir()
    val tbl = "graft_dml_routes"
    dml.sql(s"DROP TABLE IF EXISTS $tbl")
    seedSql(dml, tbl, dir)
    val native = dml.sql(s"EXPLAIN DELETE FROM $tbl WHERE grp = 5")
      .collect().head.getString(0)
    assert(native.contains("DeleteFromTable") &&
      !native.contains("TxLogDeleteCommand"),
      s"translatable DELETE left the native path:\n$native")
    val ruled = dml.sql(s"EXPLAIN DELETE FROM $tbl WHERE id % 11 = 3")
      .collect().head.getString(0)
    assert(ruled.contains("TxLogDeleteCommand"),
      s"modulo DELETE missed the rule:\n$ruled")
    val upd = dml.sql(s"EXPLAIN UPDATE $tbl SET cents = 0 WHERE grp = 1")
      .collect().head.getString(0)
    assert(upd.contains("TxLogUpdateCommand"), s"no update command:\n$upd")
    val mrg = dml.sql(s"""EXPLAIN MERGE INTO $tbl t USING ($mergeSourceSql) s
      ON t.id = s.id WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""").collect().head.getString(0)
    assert(mrg.contains("TxLogMergeCommand"), s"no merge command:\n$mrg")
  }

  test("SQL DML on a DV'd + renamed table matches the relational replay") {
    val dir = freshDir()
    seedApi(dml, dir)
    // MoR delete → live deletion vectors; rename → column mapping
    TxLog.deleteMoR(dml, dir, "id % 13 = 2")
    TxLog.renameColumn(dml, dir, "grp", "bucket")
    val tbl = "graft_dml_maint"
    dml.sql(s"DROP TABLE IF EXISTS $tbl")
    dml.sql(s"CREATE TABLE $tbl USING txlog OPTIONS (path '$dir')")
    dml.sql(s"UPDATE $tbl SET cents = cents + 100 WHERE bucket = 1")
    dml.sql(s"DELETE FROM $tbl WHERE bucket = 4")
    val got = dml.table(tbl).orderBy("id").collect().toSeq
    val want = dml.sql(
      """SELECT id, CAST(id % 7 AS INT) AS bucket,
                CAST(id * 10 AS BIGINT)
                  + CASE WHEN id % 7 = 1 THEN 100 ELSE 0 END AS cents,
                CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS status
         FROM range(60)
         WHERE NOT (id % 13 = 2) AND NOT (id % 7 = 4)
         ORDER BY id""").collect().toSeq
    assert(got == want, "DV'd+renamed SQL DML diverged from the replay")
  }

  test("a SQL DELETE racing a concurrent append retries past it (OCC)") {
    val dir = freshDir()
    val tbl = "graft_dml_occ"
    dml.sql(s"DROP TABLE IF EXISTS $tbl")
    seedSql(dml, tbl, dir) // commits 0..2
    val late = dml.sql(
      """SELECT id, CAST(id % 7 AS INT) AS grp, CAST(7 AS BIGINT) AS cents,
                'B' AS status FROM range(100, 103)""")
    TxLog.testBeforeConditionalCommit.set(() => TxLog.append(late, dir): Unit)
    try dml.sql(s"DELETE FROM $tbl WHERE status = 'B'")
    finally TxLog.testBeforeConditionalCommit.set(null)
    // injected append took v3; the delete re-claimed v4
    assert(TxLog.headVersion(dir) == 4,
      s"expected the delete to land at v4, head=${TxLog.headVersion(dir)}")
    // serial order ⟨delete, append⟩: the late 'B' rows survive
    val rows = dml.table(tbl).collect()
    assert(rows.count(_.getString(3) == "B") == 3 &&
      rows.count(_.getString(3) == "A") == 30)
  }

  test("unsupported shapes fail loud with the supported shape named") {
    val dir = freshDir()
    val tbl = "graft_dml_loud"
    dml.sql(s"DROP TABLE IF EXISTS $tbl")
    seedSql(dml, tbl, dir)

    // conditional / DELETE merge shapes route to the GENERAL merge
    // since r14 (TxLogMergeGeneralSpec owns them) — what stays loud is
    // what no engine path represents: a non-equi ON condition
    val nonEqui = intercept[UnsupportedOperationException] {
      dml.sql(s"""MERGE INTO $tbl t USING ($mergeSourceSql) s
        ON t.id < s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(nonEqui.getMessage.contains("ON condition"))

    val sub = intercept[UnsupportedOperationException] {
      dml.sql(s"DELETE FROM $tbl WHERE id IN " +
        s"(SELECT id FROM $tbl WHERE grp = 3)")
    }
    assert(sub.getMessage.contains("subquer"))

    // a time-travel registration takes no DML
    val tv = "graft_dml_tv"
    dml.sql(s"DROP TABLE IF EXISTS $tv")
    dml.sql(s"CREATE TABLE $tv USING txlog OPTIONS (path '$dir', asOf '0')")
    val tt = intercept[UnsupportedOperationException] {
      dml.sql(s"UPDATE $tv SET cents = 0 WHERE grp = 1")
    }
    assert(tt.getMessage.contains("time-travel"))
  }

  test("TRUNCATE TABLE and unconditional DELETE empty the table through the commit log") {
    val dir = freshDir()
    val tbl = "graft_dml_trunc"
    dml.sql(s"DROP TABLE IF EXISTS $tbl")
    seedSql(dml, tbl, dir)
    val headBefore = TxLog.headVersion(dir)
    // TRUNCATE routes through TruncatableTable → deleteWhere(true) →
    // TxLog.delete — a logged, time-travelable commit, not an rm -rf
    dml.sql(s"TRUNCATE TABLE $tbl")
    assert(dml.table(tbl).count() == 0)
    assert(TxLog.headVersion(dir) == headBefore + 1,
      "TRUNCATE must land as one commit")
    assert(TxLog.read(dml, dir, asOf = headBefore).count() == 60,
      "pre-truncate versions stay time-travelable")
    // refill, then DELETE with no WHERE — same path, same contract
    dml.sql(s"INSERT INTO $tbl SELECT id, CAST(id % 7 AS INT), " +
      "CAST(id AS BIGINT), 'A' FROM range(5)")
    dml.sql(s"DELETE FROM $tbl")
    assert(dml.table(tbl).count() == 0)
  }

  test("without the extensions: native DELETE works, UPDATE fails loud") {
    // a BARE session (no GraftExtensions) on the shared SparkContext —
    // what a user gets without the spark.sql.extensions line
    val base = SparkTestBase.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val bare =
      try SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    assert(bare ne base, "builder must create a fresh bare session")
    val dir = freshDir()
    val tbl = "graft_dml_noext"
    bare.sql(s"DROP TABLE IF EXISTS $tbl")
    seedSql(bare, tbl, dir)
    // filter-translatable DELETE needs only SupportsDelete — no rule
    bare.sql(s"DELETE FROM $tbl WHERE grp = 5")
    assert(bare.table(tbl).filter("grp = 5").count() == 0)
    assert(bare.table(tbl).count() > 0)
    // beyond filter translation, stock Spark rejects (its own error);
    // the extensions session is the supported surface for these
    intercept[Exception] {
      bare.sql(s"DELETE FROM $tbl WHERE id % 11 = 3")
    }
    intercept[Exception] {
      bare.sql(s"UPDATE $tbl SET cents = 0 WHERE grp = 1")
    }
  }
}
