package graft.sources.txlog

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The bare maintenance STATEMENTS (`OPTIMIZE` / `VACUUM` /
  * `DESCRIBE HISTORY` — the spellings Delta users type) as
  * parser-level sugar: each recognized statement REWRITES to the
  * equivalent `CALL system.<proc>(...)` text and re-parses through the
  * delegate, so the statement surface and the procedure surface are
  * ONE implementation — same argument coercion, same engine entry
  * point, same result relation, nothing to drift. Anything the
  * recognizer does not claim (including every regular statement)
  * passes to the delegate byte-for-byte.
  *
  * Installed by [[graft.GraftExtensions]] via `injectParser`; the
  * procedures themselves resolve through the session-catalog extension
  * ([[GraftCatalog]]'s `ProcedureCatalog`), so this sugar needs both
  * halves of the standard deployment — exactly like Delta, whose
  * parser extension fronts its command surface.
  *
  * Grammar (case-insensitive; `<target>` is a table name, a quoted
  * path `'/dir'`, or the path-addressed spelling `` txlog.`/dir` ``):
  *
  *  - `DESCRIBE HISTORY <target>` → `CALL system.history`
  *  - `VACUUM <target> [KEEP n VERSIONS | RETAIN n HOURS] [DRY RUN]`
  *    → `CALL system.vacuum` (version-based horizon, or Delta's
  *    time-based `RETAIN` via the engine's `vacuumRetain` — the two
  *    are mutually exclusive, rejected loud when combined)
  *  - `OPTIMIZE <target> ZORDER BY (c1, …)` → `CALL system.optimize`
  *    (range-cluster by the named columns)
  *  - `OPTIMIZE <target> WHERE c BETWEEN lo AND hi ZORDER BY (…)` →
  *    `CALL system.optimize` with the where-frame (only
  *    stats-intersecting segments rewrite)
  *  - `OPTIMIZE <target>` (no ZORDER) → `CALL system.compact`
  *    (bin-packing consolidation, Delta's plain-OPTIMIZE meaning)
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(GraftSqlParser.rewrite(sqlText).getOrElse(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private[txlog] object GraftSqlParser {

  // <target>: '/quoted/path' | txlog.`/path` | multipart identifier
  // (each part plain or backquoted)
  private val T =
    """(?:'([^']+)'|(?i:txlog)\.`([^`]+)`|((?:[A-Za-z_][\w]*|`[^`]+`)(?:\.(?:[A-Za-z_][\w]*|`[^`]+`))*))"""

  private val DescHistory =
    s"""(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*$$""".r
  private val Vacuum =
    (s"""(?is)^\\s*VACUUM\\s+$T""" +
      """(?:\s+KEEP\s+(\d+)\s+VERSIONS)?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?""" +
      """(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val Optimize =
    (s"""(?is)^\\s*OPTIMIZE\\s+$T""" +
      """(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val WhereBetween =
    """(?is)^\s*(`[^`]+`|[A-Za-z_]\w*)\s+BETWEEN\s+(?:'([^']*)'|(\S+))\s+AND\s+(?:'([^']*)'|(\S+))\s*$""".r

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The resolved target as a CALL `table` argument: quoted path and
    * `` txlog.`/dir` `` pass the raw dir (the procedures' dirOf treats
    * any '/'-bearing value as a dir), identifiers pass by name. */
  private def targetArg(path: String, tx: String, ident: String): String =
    if (path != null) lit(path)
    else if (tx != null) lit(tx)
    else lit(ident.replace("`", ""))

  private def strip(c: String): String = c.trim.stripPrefix("`").stripSuffix("`")

  /** Some(rewritten CALL text) when the statement is ours. */
  def rewrite(sqlText: String): Option[String] = sqlText match {
    case DescHistory(p, tx, id) =>
      Some(s"CALL system.history(table => ${targetArg(p, tx, id)})")
    case Vacuum(p, tx, id, keep, retain, dry) =>
      if (keep != null && retain != null)
        throw new UnsupportedOperationException(
          "VACUUM takes KEEP n VERSIONS or RETAIN n HOURS, not both")
      val args = Seq(s"table => ${targetArg(p, tx, id)}") ++
        Option(keep).map(k => s"keep_versions => $k") ++
        Option(retain).map(h => s"retain_hours => CAST($h AS DOUBLE)") ++
        (if (dry != null) Seq("dry_run => true") else Nil)
      Some(s"CALL system.vacuum(${args.mkString(", ")})")
    case Optimize(p, tx, id, where, zorder) =>
      val table = targetArg(p, tx, id)
      (Option(where), Option(zorder)) match {
        case (None, None) =>
          Some(s"CALL system.compact(table => $table)")
        case (w, Some(z)) =>
          val cols = z.split(',').map(strip).filter(_.nonEmpty)
          if (cols.isEmpty) throw new UnsupportedOperationException(
            "OPTIMIZE ... ZORDER BY () names no columns")
          val frame = w.map {
            case WhereBetween(c, loQ, loB, hiQ, hiB) =>
              val lo = if (loQ != null) loQ else loB
              val hi = if (hiQ != null) hiQ else hiB
              s", where_col => ${lit(strip(c))}, where_lo => ${lit(lo)}, " +
                s"where_hi => ${lit(hi)}"
            case other => throw new UnsupportedOperationException(
              s"OPTIMIZE ... WHERE supports `col BETWEEN lo AND hi` " +
                s"(the stats-frame shape), got '$other' — for anything " +
                "else use CALL system.optimize(...) directly")
          }.getOrElse("")
          Some(s"CALL system.optimize(table => $table, " +
            s"sort_cols => ${lit(cols.mkString(","))}$frame)")
        case (Some(_), None) => throw new UnsupportedOperationException(
          "OPTIMIZE ... WHERE requires ZORDER BY (the where-frame " +
            "selects which segments re-cluster); plain consolidation " +
            "is OPTIMIZE <table> or CALL system.compact(...)")
      }
    case _ => None
  }
}
