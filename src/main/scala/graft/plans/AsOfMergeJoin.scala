package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.ColumnShim

/** Whole-operator as-of join as a first-class plan node — the §7.3
  * escalation step (c): Spark has no as-of join, the composed union+window
  * form exists (`graft.ops.AsOfJoin`, kept as the default and as the
  * oracle cross-check), and this is the physical-operator alternative: a
  * co-partitioned per-key merge scan, the same execution shape
  * pandas.merge_asof uses on sorted frames.
  *
  * Cost model vs the union+window form (both are one hash shuffle of each
  * side + sort): the merge scan streams BOTH sides once with O(1) state
  * per key — no unioned wide-row relation (the union form pads every
  * right row with null left columns and vice versa), no window buffer, no
  * post-filter discarding the right-side rows it shuffled. At 100 TB that
  * is roughly half the shuffled bytes for a wide left schema.
  *
  * Semantics (identical to [[graft.ops.AsOfJoin.asOf]], spec-asserted):
  * for each left row, the LATEST right row of the same key with
  * right.ts <= left.ts; right side must be unique per (key, ts); left
  * rows with no preceding right row emit a null payload (left-outer).
  * Right rows are consumed in (key, ts) order so "latest" is
  * deterministic.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        key: String, ts: String)
    extends BinaryNode {
  // key/ts travel as NAMES, not Attributes: analyzer rules that rewrite
  // child exprIds (DeduplicateRelations on self-referencing sides) only
  // remap expression fields of node types they know — a custom node
  // holding Attributes would go stale. Names are re-resolved against the
  // (possibly rewritten) child outputs at planning time.

  /** Left columns + right payload (right key/time excluded — the caller
    * already has them as the left key/time). Payload is nullable: a left
    * row may precede every right row of its key. */
  def rightPayload: Seq[Attribute] =
    right.output.filterNot(a => a.name == key || a.name == ts)
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  // with name-typed key/ts the default (expression-derived) references is
  // empty and ColumnPruning would strip the join columns from the
  // children — claim them explicitly
  override lazy val references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      children.flatMap(_.output.filter(a => a.name == key || a.name == ts)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfMergeJoinExec]]. Registered either via
  * `spark.experimental.extraStrategies` (done lazily by
  * [[AsOfMergeJoin.asOf]]) or `GraftExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      def attr(side: LogicalPlan, n: String): Attribute =
        side.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
          s"as-of column $n not in ${side.output.map(_.name).mkString(",")}"))
      AsOfMergeJoinExec(planLater(p.left), planLater(p.right),
        attr(p.left, p.key), attr(p.left, p.ts),
        attr(p.right, p.key), attr(p.right, p.ts),
        p.rightPayload, p.output) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned, co-sorted merge scan. EnsureRequirements inserts the
  * hash exchanges + (key, time) sorts from the declared requirements —
  * exactly one shuffle per side, the cost class of a SortMergeJoin. */
case class AsOfMergeJoinExec(left: SparkPlan, right: SparkPlan,
                             leftKey: Attribute, leftTime: Attribute,
                             rightKey: Attribute, rightTime: Attribute,
                             rightPayload: Seq[Attribute],
                             output: Seq[Attribute])
    extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  // left rows stream through untouched and in order
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.semanticEquals(leftKey))
    val ltIdx = left.output.indexWhere(_.semanticEquals(leftTime))
    val rkIdx = right.output.indexWhere(_.semanticEquals(rightKey))
    val rtIdx = right.output.indexWhere(_.semanticEquals(rightTime))
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "as-of join columns must come from the respective child outputs")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val payload = rightPayload
    val rightOut = right.output
    val outAttrs = output
    val leftOut = left.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // orderings built per partition: interpreted orderings are not
      // guaranteed serializable
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val payloadProj = UnsafeProjection.create(payload, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, leftOut ++ payload)
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow

      // the next right row, COPIED (unsafe iterators reuse buffers), with
      // its key/time extracted; null-key/time right rows are skipped
      // (they can never satisfy the <= predicate)
      var nextR: InternalRow = null
      var nextRKey: Any = null
      var nextRTime: Any = null
      def fetchRight(): Unit = {
        nextR = null
        while (nextR == null && rIter.hasNext) {
          val r = rIter.next()
          if (!r.isNullAt(rkIdx) && !r.isNullAt(rtIdx)) {
            nextR = r.copy()
            nextRKey = nextR.get(rkIdx, keyType)
            nextRTime = nextR.get(rtIdx, timeType)
          }
        }
      }
      fetchRight()

      // latest right row (already copied) whose key equals the current
      // left key and whose time is <= the current left time
      var matched: InternalRow = null
      var prevKeySet = false
      var prevKey: Any = null

      lIter.map { l =>
        if (l.isNullAt(lkIdx) || l.isNullAt(ltIdx)) {
          // null key/time never matches; do not disturb the cursor state
          joined(l, nullPayload)
        } else {
          val lKey = l.get(lkIdx, keyType)
          val lTime = l.get(ltIdx, timeType)
          if (!prevKeySet || keyOrd.compare(prevKey, lKey) != 0) {
            matched = null
            // key values extracted from a reused left-row buffer: keep a
            // copy for the change test (copying the small key beats
            // copying the row)
            prevKey = InternalRow.copyValue(lKey)
            prevKeySet = true
          }
          var advancing = true
          while (advancing && nextR != null) {
            val c = keyOrd.compare(nextRKey, lKey)
            if (c < 0) fetchRight() // stale key: discard
            else if (c == 0 && timeOrd.compare(nextRTime, lTime) <= 0) {
              matched = nextR // already a copy
              fetchRight()
            } else advancing = false
          }
          joined(l, if (matched != null) payloadProj(matched) else nullPayload)
        }
      }.map(resultProj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfMergeJoin {

  /** Drop-in alternative to [[graft.ops.AsOfJoin.asOf]] backed by the
    * custom operator: same argument contract, same output schema, same
    * left-outer null-payload semantics. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // the pushdown rule travels with the operator: a custom node is
    // opaque to Catalyst's own PushPredicateThroughJoin
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOf
    val lPlan = left.queryExecution.analyzed
    // keep only key/time/payload on the right so the merge state and the
    // shuffle carry nothing else
    val rNarrow = right.selectExpr((Seq(key, ts) ++ rightCols).distinct: _*)
    val rPlan = rNarrow.queryExecution.analyzed
    for ((plan, side) <- Seq((lPlan, "left"), (rPlan, "right"));
         n <- Seq(key, ts))
      require(plan.output.exists(_.name == n), s"column $n missing on $side side")
    ColumnShim.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, key, ts))
  }
}
