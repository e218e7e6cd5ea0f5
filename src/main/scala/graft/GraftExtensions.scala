package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{Functions, MinHashMd5, WikiPageParse}

/** Library integration point: the engine's custom SQL functions injected
  * at session build time, the standard way a Spark library ships its
  * surface to users who never call Scala code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   -- or --
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * After which `minhash_md5`, `wiki_pages` (a LATERAL VIEW generator) and
  * `topk3` resolve in plain SQL. Shares its builders with the runtime
  * [[graft.functions.Functions.register]] path so the two never drift.
  *
  * The deployment's second half is the session-catalog extension
  * (`spark.sql.catalog.spark_catalog=graft.sources.txlog.GraftCatalog`,
  * Delta's exact two-conf shape) — SQL time travel (`VERSION AS OF` /
  * `TIMESTAMP AS OF`) and `CALL system.<proc>` maintenance procedures
  * on txlog tables resolve at the catalog, not here ([[graft.sources
  * .txlog.GraftCatalog]] explains why stock Spark cannot route them).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator surface: the as-of merge-scan plan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // custom plans are opaque to Catalyst's own pushdown — restore it
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOf)
    // SQL row-level DML on txlog tables (UPDATE / MERGE INTO / the
    // DELETE shapes filter translation can't express) — resolved into
    // the engine's own commit machinery; see TxLogSqlDml for why this
    // bridge beats the generic SupportsRowLevelOperations rewrite here
    ext.injectPostHocResolutionRule(_ => graft.sources.txlog.TxLogSqlDml)
    // the bare maintenance statements (OPTIMIZE / VACUUM / DESCRIBE
    // HISTORY, Delta's spellings) — parser-level sugar that rewrites
    // to CALL system.<proc> text and re-parses, so statements and
    // procedures are ONE implementation (GraftSqlParser)
    ext.injectParser((_, delegate) =>
      new graft.sources.txlog.GraftSqlParser(delegate))
    ext.injectFunction((FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5"),
      Functions.minhashMd5Builder))
    ext.injectFunction((FunctionIdentifier("wiki_pages"),
      new ExpressionInfo(classOf[WikiPageParse].getName, "wiki_pages"),
      Functions.wikiPagesBuilder))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[graft.functions.SimHashPortable].getName, "simhash60"),
      Functions.simhash60Builder))
    ext.injectFunction((FunctionIdentifier("topk3"),
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "topk3"),
      Functions.topk3Builder))
    ext.injectFunction((FunctionIdentifier("zorder2"),
      new ExpressionInfo(graft.sources.Warehouse.getClass.getName, "zorder2"),
      Functions.zorder2Builder))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName, "jaro_winkler"),
      Functions.jaroWinklerBuilder))
  }
}
