package graft.sources.txlog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.{sources => vf}

import graft.sources.TxLog

/** SQL row-level DML on txlog tables — `DELETE FROM` / `UPDATE` /
  * `MERGE INTO` — as a BRIDGE into the exact engine entry points the
  * Scala API uses ([[TxLog.delete]]/[[TxLog.update]]/[[TxLog.merge]]:
  * stats-pre-pruned triage, CoW rewrite, CDF sidecars, OCC slot
  * retry), the same way the write half bridged `INSERT INTO` through
  * `V1Write` — ONE commit path per operation, no parallel machinery.
  *
  * Two routes, by condition shape:
  *
  *  - `DELETE FROM t WHERE <filter-translatable>` runs through Spark's
  *    NATIVE `SupportsDelete` planning: the planner translates the
  *    condition to source filters and [[TxLogTable.deleteWhere]]
  *    renders them back to predicate SQL. No extensions required.
  *  - Everything else — arbitrary DELETE predicates, `UPDATE`,
  *    `MERGE INTO` — resolves through THIS analyzer rule, registered
  *    by [[graft.GraftExtensions]] (`spark.sql.extensions=
  *    graft.GraftExtensions`, the same library switch that ships the
  *    SQL functions). The rule compiles the resolved Catalyst
  *    condition / assignments back to predicate SQL (qualifiers
  *    stripped; `Expression.sql` round-trips through the engine's
  *    `expr()` surface) and emits a command that calls the Scala API.
  *
  * Spark's own generic path for these statements is
  * `SupportsRowLevelOperations` — a group-based rewrite planned by the
  * engine through a v2 `BatchWrite`. That shape would bolt a SECOND
  * physical write path onto the connector (the v2 writer moves rows
  * through `DataWriter`s, not through the `V1Write` DataFrame bridge
  * every other txlog commit uses) and would bypass the stats-pruned
  * triage that makes one-slice DML O(slice) at 100k segments. Delta
  * reaches the same conclusion: its DML resolves via injected analyzer
  * rules into engine commands, not via the generic rewrite.
  *
  * Shape contract (loud, never silent): MERGE must be the full-row
  * upsert the engine's merge implements — `ON t.k = s.k WHEN MATCHED
  * THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` (star-expanded
  * assignments; matched and not-matched values must agree per column)
  * — anything else (action conditions, partial SET, DELETE actions,
  * NOT MATCHED BY SOURCE, schema evolution) raises with the supported
  * shape and the programmatic escape hatch named. Like the API,
  * `MERGE` assumes the source is key-unique (the usual contract;
  * duplicate source keys multiply matched rows instead of raising).
  * DML through a time-travel (`asOf`) relation raises. */
object TxLogSqlDml extends Rule[LogicalPlan] with PredicateHelper {

  /** The target-relation matcher: any alias/subquery wrapping peeled,
    * a DSv2 relation whose Table is the txlog connector. */
  private object TxLogRel {
    def unapply(plan: LogicalPlan): Option[TxLogTable] =
      EliminateSubqueryAliases(plan) match {
        case r: DataSourceV2Relation => r.table match {
          case t: TxLogTable => Some(t)
          case _             => None
        }
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(TxLogRel(t), cond) if d.resolved =>
      requireCurrent(t, "DELETE FROM")
      // filter-translatable conditions stay on Spark's native
      // SupportsDelete path (planner-translated, deleteWhere renders)
      // — this rule claims only what that path cannot express
      if (nativeDeletable(cond)) d
      else TxLogDeleteCommand(t.dir, exprSql(cond, "DELETE condition"))

    case u @ UpdateTable(TxLogRel(t), assignments, cond) if u.resolved =>
      requireCurrent(t, "UPDATE")
      val sets = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"txlog UPDATE: only top-level columns can be SET, got " +
              s"'${other.sql}' — nested-field updates are not supported " +
              "(rewrite the whole column, or use the TxLog.update API)")
        }
        name -> exprSql(a.value, s"UPDATE SET $name")
      }
      TxLogUpdateCommand(t.dir,
        cond.map(exprSql(_, "UPDATE condition")).getOrElse("true"),
        sets.toMap)

    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case TxLogRel(t) =>
          requireCurrent(t, "MERGE INTO")
          planMerge(t, m)
        case _ => m
      }

    case _ => plan
  }

  private def requireCurrent(t: TxLogTable, op: String): Unit =
    if (t.asOf >= 0) throw new UnsupportedOperationException(
      s"cannot $op a time-travel (asOf=${t.asOf}) txlog relation — " +
        "DML applies to the current table version only")

  /** True iff every conjunct of `cond` both translates to a v1 source
    * filter AND renders back to predicate SQL — exactly the set
    * [[TxLogTable.canDeleteWhere]] will accept, so a condition left on
    * the native path can never dead-end there. */
  private def nativeDeletable(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).forall(c =>
      ColumnShim.translateFilter(c)
        .exists(f => filterToSql(f).isDefined))

  /** Resolved Catalyst expression → predicate SQL for the engine's
    * `expr()` surface: qualifiers stripped (the engine resolves
    * against the table's own columns; a `t.`/`spark_catalog.db.t.`
    * prefix would dangle), subqueries rejected loud (the predicate
    * DML API is scalar — correlated rewrites need the read+overwrite
    * composition, not a silent mis-translation). */
  private[txlog] def exprSql(e: Expression, what: String): String = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"txlog $what: subqueries are not supported in DML " +
          "predicates — materialize the subquery (e.g. an anti-join " +
          "into TxLog.overwrite / replaceWhere) instead")
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql
  }

  /** v1 source filter → predicate SQL, total over every filter shape
    * Spark's translation emits; None = not renderable (the caller
    * keeps such conditions off the native path). The value side rides
    * Catalyst's own typed literal rendering (`Literal(v).sql` —
    * `DATE '…'`, escaped strings), so the round-trip through `expr()`
    * preserves types. */
  private[txlog] def filterToSql(f: vf.Filter): Option[String] = {
    def col(n: String): Option[String] =
      // a dot inside ONE backtick pair parses as a name containing a
      // dot (not a struct path), so flat names round-trip; names with
      // backticks escape by doubling
      if (n.isEmpty) None else Some("`" + n.replace("`", "``") + "`")
    def valSql(v: Any): Option[String] =
      try Some(Literal(v).sql) catch { case _: Exception => None }
    def bin(a: String, v: Any, op: String): Option[String] =
      for (c <- col(a); l <- valSql(v)) yield s"($c $op $l)"
    f match {
      case vf.AlwaysTrue()  => Some("true")
      case vf.AlwaysFalse() => Some("false")
      case vf.EqualTo(a, v)            => bin(a, v, "=")
      case vf.EqualNullSafe(a, v)      => bin(a, v, "<=>")
      case vf.GreaterThan(a, v)        => bin(a, v, ">")
      case vf.GreaterThanOrEqual(a, v) => bin(a, v, ">=")
      case vf.LessThan(a, v)           => bin(a, v, "<")
      case vf.LessThanOrEqual(a, v)    => bin(a, v, "<=")
      case vf.IsNull(a)    => col(a).map(c => s"($c IS NULL)")
      case vf.IsNotNull(a) => col(a).map(c => s"($c IS NOT NULL)")
      case vf.In(a, vs) =>
        if (vs.isEmpty) Some("false")
        else for {
          c <- col(a)
          ls <- vs.foldLeft(Option(Seq.empty[String])) { (acc, v) =>
            for (s <- acc; l <- valSql(v)) yield s :+ l }
        } yield s"($c IN (${ls.mkString(", ")}))"
      case vf.StringStartsWith(a, v) =>
        for (c <- col(a); l <- valSql(v)) yield s"startswith($c, $l)"
      case vf.StringEndsWith(a, v) =>
        for (c <- col(a); l <- valSql(v)) yield s"endswith($c, $l)"
      case vf.StringContains(a, v) =>
        for (c <- col(a); l <- valSql(v)) yield s"contains($c, $l)"
      case vf.And(l, r) =>
        for (a <- filterToSql(l); b <- filterToSql(r)) yield s"($a AND $b)"
      case vf.Or(l, r) =>
        for (a <- filterToSql(l); b <- filterToSql(r)) yield s"($a OR $b)"
      case vf.Not(c) => filterToSql(c).map(s => s"(NOT $s)")
      case _ => None
    }
  }

  /** MERGE shape validation + compilation to [[TxLogMergeCommand]]:
    * the upsert contract ([[TxLog.merge]]) is "matched target rows are
    * REPLACED by the source row, unmatched source rows are INSERTED",
    * so the SQL shape must pin exactly that — one unconditional
    * UPDATE SET * + one unconditional INSERT *, per-column agreement
    * between the two, ON a plain key equality. */
  private def planMerge(t: TxLogTable, m: MergeIntoTable): LogicalPlan = {
    def unsupported(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"txlog MERGE INTO supports the full-row upsert shape only — " +
          "ON target.key = source.key WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT * — but " + why + ". For " +
          "conditional/partial merges, compose the TxLog API " +
          "(merge/mergeMoR, update, replaceWhere) instead.")
    if (m.withSchemaEvolution)
      unsupported("WITH SCHEMA EVOLUTION was requested (txlog MERGE " +
        "keeps the target schema; evolve via append/alter first)")
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE actions are present")
    val target = EliminateSubqueryAliases(m.targetTable)
    val source = m.sourceTable
    val (tKey, sKey) = m.mergeCondition match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: AttributeReference, b: AttributeReference) =>
        if (target.outputSet.contains(a) && source.outputSet.contains(b))
          (a, b)
        else if (target.outputSet.contains(b) && source.outputSet.contains(a))
          (b, a)
        else unsupported("the ON condition's sides do not split into " +
          "one target column and one source column")
      case other => unsupported("the ON condition is " +
        s"'${other.sql}', not a plain target.key = source.key equality")
    }
    val uAssigns = m.matchedActions match {
      case Seq(UpdateAction(None, as, _)) => as
      case Seq(UpdateAction(Some(_), _, _)) =>
        unsupported("the WHEN MATCHED UPDATE carries a condition")
      case as => unsupported(s"the matched actions are " +
        s"${as.map(_.getClass.getSimpleName).mkString("[", ", ", "]")}" +
        ", not exactly one unconditional UPDATE")
    }
    val iAssigns = m.notMatchedActions match {
      case Seq(InsertAction(None, as)) => as
      case Seq(InsertAction(Some(_), _)) =>
        unsupported("the WHEN NOT MATCHED INSERT carries a condition")
      case as => unsupported(s"the not-matched actions are " +
        s"${as.map(_.getClass.getSimpleName).mkString("[", ", ", "]")}" +
        ", not exactly one unconditional INSERT")
    }
    def byColumn(as: Seq[Assignment], what: String): Map[String, Expression] =
      as.map { a =>
        a.key match {
          case ar: AttributeReference => ar.name -> a.value
          case other => unsupported(s"the $what assigns " +
            s"'${other.sql}', not a top-level target column")
        }
      }.toMap
    val uBy = byColumn(uAssigns, "UPDATE")
    val iBy = byColumn(iAssigns, "INSERT")
    val cols = target.output.map(_.name)
    val values: Seq[(String, Expression)] = cols.map { c =>
      val vu = uBy.getOrElse(c, unsupported(
        s"the UPDATE does not assign column '$c' (partial SET — the " +
          "upsert replaces whole rows)"))
      val vi = iBy.getOrElse(c, unsupported(
        s"the INSERT does not assign column '$c'"))
      if (!vu.semanticEquals(vi))
        unsupported(s"column '$c' takes '${vu.sql}' when matched but " +
          s"'${vi.sql}' when not matched — the upsert writes ONE " +
          "source row either way")
      if (!vu.references.subsetOf(source.outputSet))
        unsupported(s"column '$c' is assigned '${vu.sql}', which " +
          "references the TARGET row — upsert values must come from " +
          "the source")
      c -> vu
    }
    values.find(_._1 == tKey.name).foreach { case (_, v) =>
      if (!v.semanticEquals(sKey))
        unsupported(s"the key column '${tKey.name}' is assigned " +
          s"'${v.sql}', not the ON condition's source key " +
          s"'${sKey.name}' — the join key and the written key must " +
          "agree")
    }
    val updates = Project(
      values.map { case (n, v) => Alias(v, n)() }, source)
    TxLogMergeCommand(t.dir, tKey.name, updates)
  }
}

/** `DELETE FROM` with a condition Spark's filter translation cannot
  * express — compiled to predicate SQL, committed by [[TxLog.delete]]
  * (stats-pruned CoW + OCC retry, identical to the Scala API). */
case class TxLogDeleteCommand(dir: String, predicate: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.delete(session, dir, predicate)
    Seq.empty
  }
}

/** `UPDATE … SET … [WHERE …]` → [[TxLog.update]]: every SET expression
  * evaluates against the PRE-update row (SQL UPDATE semantics — the
  * engine applies all assignments in one projection, so
  * `SET x = y, y = x` swaps), only match-bearing segments rewrite. */
case class TxLogUpdateCommand(dir: String, predicate: String,
                              sets: Map[String, String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.update(session, dir, predicate, sets)
    Seq.empty
  }
}

/** Full-row-upsert `MERGE INTO` → [[TxLog.merge]]: `updates` is the
  * source projected to the target's columns (validated by the rule);
  * matched keys replace rows in exactly the match-bearing segments,
  * unmatched keys append. */
case class TxLogMergeCommand(dir: String, key: String,
                             updates: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(updates)
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.merge(session, dir, ColumnShim.ofRows(session, updates), key)
    Seq.empty
  }
}
