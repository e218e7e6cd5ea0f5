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
  * MERGE routes by shape, TWO paths into the engine: a statement that
  * is provably the whole-row upsert — one unconditional `UPDATE SET *`
  * plus one unconditional `INSERT *`, matched and not-matched values
  * agreeing per column, all source-side — compiles to [[TxLog.merge]]
  * (the probe-pruned replace-or-insert fast path). EVERY other
  * supported shape — conditional / multiple / partial-SET matched
  * clauses, matched DELETE, conditional inserts, NOT MATCHED BY
  * SOURCE UPDATE/DELETE — compiles to [[TxLog.mergeGeneral]]'s
  * action-tagged rewrite. Both demand `ON target.key = source.key`
  * (one equi-key; the source side may be a differently-named column)
  * and a key-unique source (the fast path overwrites on duplicates,
  * the general path rejects them loud). Still loud, never silent:
  * WITH SCHEMA EVOLUTION, non-equi ON conditions, nested-field
  * assignments, and subqueries in clauses raise with the supported
  * shape named. DML through a time-travel (`asOf`) relation raises. */
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
      else TxLogDeleteCommand(t.dir, exprSql(cond, "DELETE condition"),
        t.dmlMor)

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
        sets.toMap, t.dmlMor)

    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case TxLogRel(t) =>
          requireCurrent(t, "MERGE INTO")
          planMerge(t, m)
        case _ => m
      }

    // INSERT OVERWRITE under partitionOverwriteMode=dynamic: Spark's
    // OverwritePartitionsDynamicExec has NO V1Write fallback (unlike
    // append/overwrite-by-filter), so the statement bridges here into
    // TxLog.overwriteDynamic — touched partitions replace wholesale,
    // the rest carry untouched — keeping ONE physical write path
    case o @ OverwritePartitionsDynamic(TxLogRel(t), query, _, _, _)
        if o.resolved =>
      requireCurrent(t, "INSERT OVERWRITE (dynamic partitions)")
      TxLogDynamicOverwriteCommand(t.dir, query)

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

  /** MERGE shape validation + compilation. The full-row upsert — one
    * unconditional UPDATE SET * + one unconditional INSERT *,
    * per-column agreement between the two — compiles to
    * [[TxLogMergeCommand]] ([[TxLog.merge]]: the probe-pruned
    * replace-or-insert fast path). EVERY other supported shape —
    * conditional / multiple / partial-SET matched clauses, matched
    * DELETE, conditional inserts, NOT MATCHED BY SOURCE — compiles to
    * [[TxLogMergeGeneralCommand]] ([[TxLog.mergeGeneral]]'s
    * action-tagged rewrite). Both demand `ON target.key = source.key`
    * (the engine's merge key contract — stats pruning and the
    * match-probe hang off one equi-key). */
  private def planMerge(t: TxLogTable, m: MergeIntoTable): LogicalPlan = {
    def unsupported(why: String): Nothing =
      throw new UnsupportedOperationException(
        s"txlog MERGE INTO: $why. Supported: ON target.key = source.key " +
          "with WHEN MATCHED [AND cond] THEN UPDATE SET …|DELETE, " +
          "WHEN NOT MATCHED [AND cond] THEN INSERT …, " +
          "WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …|DELETE.")
    if (m.withSchemaEvolution)
      unsupported("WITH SCHEMA EVOLUTION was requested (txlog MERGE " +
        "keeps the target schema; evolve via append/alter first)")
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
    def byColumn(as: Seq[Assignment], what: String): Map[String, Expression] =
      as.map { a =>
        a.key match {
          case ar: AttributeReference => ar.name -> a.value
          case other => unsupported(s"the $what assigns " +
            s"'${other.sql}', not a top-level target column (nested " +
            "fields are not mergeable)")
        }
      }.toMap
    // The upsert FAST PATH fires only when the statement is provably
    // the whole-row replace-or-insert: one unconditional UPDATE + one
    // unconditional INSERT, both assigning every column the SAME
    // source-only value, key written = key joined. Anything else —
    // including a partial SET or target-referencing value that the
    // upsert could not honor — routes to the general action-tagged
    // merge instead of erroring.
    val upsert = (m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions) match {
      case (Seq(UpdateAction(None, uAssigns, _)),
            Seq(InsertAction(None, iAssigns)), Nil) =>
        val uBy = byColumn(uAssigns, "UPDATE")
        val iBy = byColumn(iAssigns, "INSERT")
        val cols = target.output.map(_.name)
        val values: Option[Seq[(String, Expression)]] =
          cols.foldLeft(Option(Seq.empty[(String, Expression)])) {
            (acc, c) => acc.flatMap { vs =>
              (uBy.get(c), iBy.get(c)) match {
                case (Some(vu), Some(vi))
                    if vu.semanticEquals(vi) &&
                       vu.references.subsetOf(source.outputSet) =>
                  Some(vs :+ (c -> vu))
                case _ => None
              }
            }
          }.filter(_.find(_._1 == tKey.name)
            .forall { case (_, v) => v.semanticEquals(sKey) })
        values.map(vs =>
          TxLogMergeCommand(t.dir, tKey.name,
            Project(vs.map { case (n, v) => Alias(v, n)() }, source),
            t.dmlMor))
      case _ => None
    }
    upsert.getOrElse(
      planMergeGeneral(t, m, target, source, tKey, sKey, byColumn _,
        why => unsupported(why)))
  }

  /** The general shapes → [[TxLogMergeGeneralCommand]]: each resolved
    * action's condition/assignments render to SQL with TWO-SIDED
    * qualifiers — an attribute from the target's output renders as
    * `t`.`col`, one from the source's as `s`.`col` — which is exactly
    * the reference language [[TxLog.mergeGeneral]] resolves its
    * clauses in (the joined frame aliases its sides `t` and `s`).
    * Catalyst has already enforced side-correctness (insert values
    * reference the source only, NOT MATCHED BY SOURCE the target
    * only); the rendering just preserves it. */
  private def planMergeGeneral(t: TxLogTable, m: MergeIntoTable,
      target: LogicalPlan, source: LogicalPlan,
      tKey: AttributeReference, sKey: AttributeReference,
      byColumn: (Seq[Assignment], String) => Map[String, Expression],
      unsupported: String => Nothing): LogicalPlan = {
    val targetIds = target.outputSet
    val sourceIds = source.outputSet
    def sided(e: Expression, what: String): String = {
      if (e.exists(_.isInstanceOf[SubqueryExpression]))
        throw new UnsupportedOperationException(
          s"txlog MERGE $what: subqueries in clause conditions/values " +
            "are not supported — materialize them into the source")
      e.transform {
        case a: AttributeReference if targetIds.contains(a) =>
          a.withQualifier(Seq("t"))
        case a: AttributeReference if sourceIds.contains(a) =>
          a.withQualifier(Seq("s"))
      }.sql
    }
    def updateOf(cond: Option[Expression], as: Seq[Assignment],
                 what: String): TxLog.MergeUpdateClause =
      TxLog.MergeUpdateClause(cond.map(sided(_, what)),
        byColumn(as, what).map { case (c, v) => c -> sided(v, what) })
    val matched = m.matchedActions.map {
      case UpdateAction(c, as, _) => updateOf(c, as, "WHEN MATCHED UPDATE")
      case DeleteAction(c) =>
        TxLog.MergeDeleteClause(c.map(sided(_, "WHEN MATCHED DELETE")))
      case other => unsupported(s"unsupported WHEN MATCHED action $other")
    }
    val notMatched = m.notMatchedActions.map {
      case InsertAction(c, as) =>
        TxLog.MergeInsertClause(c.map(sided(_, "WHEN NOT MATCHED INSERT")),
          byColumn(as, "INSERT").map { case (col, v) =>
            col -> sided(v, "INSERT value") })
      case other => unsupported(s"unsupported WHEN NOT MATCHED action $other")
    }
    val bySource = m.notMatchedBySourceActions.map {
      case UpdateAction(c, as, _) =>
        updateOf(c, as, "WHEN NOT MATCHED BY SOURCE UPDATE")
      case DeleteAction(c) => TxLog.MergeDeleteClause(
        c.map(sided(_, "WHEN NOT MATCHED BY SOURCE DELETE")))
      case other =>
        unsupported(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
    }
    // the SOURCE-side key name rides along (ON t.id = s.customer_id
    // joins t.`id` = s.`customer_id`, NOT t.`id` = s.`id` — the source
    // may legitimately also carry an unrelated column named `id`), and
    // the catalog-declared target schema makes the post-CREATE
    // bootstrap MERGE (empty table, insert-only in effect) land as an
    // append instead of rejecting
    TxLogMergeGeneralCommand(t.dir, tKey.name, sKey.name, source,
      org.apache.spark.sql.types.StructType(
        target.output.map(a =>
          org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))),
      matched, notMatched, bySource)
  }
}

/** `DELETE FROM` with a condition Spark's filter translation cannot
  * express — compiled to predicate SQL, committed by [[TxLog.delete]]
  * (stats-pruned CoW + OCC retry, identical to the Scala API) — or by
  * [[TxLog.deleteMoR]] (tombstone sidecar, no rewrite) when the table
  * carries `dmlMode=mor`. */
case class TxLogDeleteCommand(dir: String, predicate: String,
                              mor: Boolean = false)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (mor) TxLog.deleteMoR(session, dir, predicate)
    else TxLog.delete(session, dir, predicate)
    Seq.empty
  }
}

/** `UPDATE … SET … [WHERE …]` → [[TxLog.update]] (or
  * [[TxLog.updateMoR]] under `dmlMode=mor`): every SET expression
  * evaluates against the PRE-update row (SQL UPDATE semantics — the
  * engine applies all assignments in one projection, so
  * `SET x = y, y = x` swaps), only match-bearing segments rewrite. */
case class TxLogUpdateCommand(dir: String, predicate: String,
                              sets: Map[String, String],
                              mor: Boolean = false)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (mor) TxLog.updateMoR(session, dir, predicate, sets)
    else TxLog.update(session, dir, predicate, sets)
    Seq.empty
  }
}

/** Full-row-upsert `MERGE INTO` → [[TxLog.merge]]: `updates` is the
  * source projected to the target's columns (validated by the rule);
  * matched keys replace rows in exactly the match-bearing segments,
  * unmatched keys append. */
case class TxLogMergeCommand(dir: String, key: String,
                             updates: LogicalPlan, mor: Boolean = false)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(updates)
  override def run(session: SparkSession): Seq[Row] = {
    if (mor)
      TxLog.mergeMoR(session, dir, ColumnShim.ofRows(session, updates), key)
    else TxLog.merge(session, dir, ColumnShim.ofRows(session, updates), key)
    Seq.empty
  }
}

/** `INSERT OVERWRITE` in dynamic-partition mode →
  * [[TxLog.overwriteDynamic]]: the batch's present partition tuples
  * replace wholesale, every other partition carries untouched. The
  * query arrives analyzer-aligned to the table's columns. */
case class TxLogDynamicOverwriteCommand(dir: String, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.overwriteDynamic(session, dir, ColumnShim.ofRows(session, query))
    Seq.empty
  }
}

/** General-shape `MERGE INTO` → [[TxLog.mergeGeneral]]: the source
  * plan runs as-is; the clause conditions/assignments arrive as
  * two-sided (`t.`/`s.`) SQL the engine resolves against its
  * action-tagged join. */
case class TxLogMergeGeneralCommand(dir: String, key: String,
    srcKey: String,
    source: LogicalPlan,
    targetSchema: org.apache.spark.sql.types.StructType,
    matched: Seq[TxLog.MergeClause],
    notMatched: Seq[TxLog.MergeInsertClause],
    notMatchedBySource: Seq[TxLog.MergeClause])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    TxLog.mergeGeneral(session, dir, ColumnShim.ofRows(session, source),
      key, matched, notMatched, notMatchedBySource,
      srcKey = Some(srcKey), targetSchema = Some(targetSchema))
    Seq.empty
  }
}
