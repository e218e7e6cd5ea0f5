package graft

import org.apache.spark.sql.SparkSession

/** The config-time integration path: a session built with
  * `withExtensions(new GraftExtensions())` (equivalently
  * `spark.sql.extensions=graft.GraftExtensions`) resolves the engine's
  * SQL functions with NO runtime `Functions.register` call. */
class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects minhash_md5, wiki_pages and topk3 at build time") {
    val base = SparkTestBase.session // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses base's SparkContext; a fresh session gets the extensions
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne base, "builder must create a NEW session for injection")

      val mh = s2.sql("SELECT minhash_md5(array('a','b','c'), 0) AS h").collect()
      assert(mh.length == 1 && mh.head.get(0) != null)

      val titles = s2.sql(
        """SELECT p.title FROM
             (SELECT '<page><title>T</title><id>1</id><text>x</text></page>' AS xml)
           LATERAL VIEW wiki_pages(xml) p AS title, id, text, links""")
        .collect().map(_.getString(0))
      assert(titles.toSeq == Seq("T"))

      val tk = s2.sql(
        "SELECT topk3(v, t) AS top FROM VALUES (3.0D,'a'),(1.0D,'b'),(2.0D,'c') AS x(v, t)")
        .collect().head.getString(0)
      assert(tk == "a,c,b")

      val sh = s2.sql("SELECT simhash60(array('spark', 'join')) AS sig")
        .collect().head.getLong(0)
      assert(sh > 0L) // 60-bit signature is strictly positive by design

      // zorder2 in SQL builds the same bit interleave as the Column API
      val z = s2.sql("SELECT zorder2(3, 5, 10) AS z").collect().head.getLong(0)
      assert(z == ((1L) | (1L << 2) | (1L << 1) | (1L << 5))) // morton(3,5)=39
      assert(s2.sql("SELECT zorder2(1, 0) AS z").collect().head.getLong(0) == 1L)

      // planner strategy injection: build the custom logical node
      // directly (bypassing AsOfMergeJoin.asOf's lazy extraStrategies
      // registration) — only the injected strategy can plan it
      import org.apache.spark.sql.graftshim.ColumnShim
      val l = s2.range(3).selectExpr("id", "id AS k", "id * 10 AS t")
      val r = s2.range(2).selectExpr("id AS k", "id * 10 AS t",
        "concat('p', id) AS p")
      val asof = ColumnShim.ofRows(s2, graft.plans.AsOfJoinPlan(
        l.queryExecution.analyzed, r.queryExecution.analyzed, "k", "t"))
      assert(asof.count() == 3L)
      assert(asof.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
