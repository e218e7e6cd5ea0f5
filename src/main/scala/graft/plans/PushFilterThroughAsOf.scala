package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Filter pushdown THROUGH the custom as-of join node — the §7.3
  * escalation's missing half: a custom `LogicalPlan` is opaque to
  * Catalyst's own `PushPredicateThroughJoin` (it only knows `Join`), so
  * without this rule a `WHERE` above an [[AsOfJoinPlan]] filters AFTER
  * the merge join materializes every left row — at 100 TB that is the
  * difference between shuffling the filtered slice and shuffling the
  * whole fact table into the join.
  *
  * Soundness: the as-of join is LEFT-PRESERVING — every output row
  * corresponds 1:1 to a left input row, and its left-side column values
  * pass through unchanged. A deterministic predicate that references
  * only left-side columns therefore evaluates identically before and
  * after the join, so filtering the left child first keeps exactly the
  * same output rows (spec: plan shape + result equality, plus the rule
  * must NOT move predicates that touch the right payload).
  *
  * Injected via `GraftExtensions.injectOptimizerRule` — runs inside the
  * operator-optimization batch to fixpoint; idempotent because a second
  * match finds no left-only conjuncts left above the join.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
