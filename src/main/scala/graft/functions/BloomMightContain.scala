package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression — the
  * scan-side half of a runtime semi-join filter.
  *
  * Spark has this machinery internally (`bloom_filter_agg` /
  * `might_contain` feed InjectRuntimeFilter) but keeps both functions out
  * of the public registry, and the rewrite only triggers on its own
  * heuristics. This expression makes the pattern available to any graft
  * pipeline explicitly: build a `BloomFilter` with the public
  * `DataFrame.stat.bloomFilter` (a distributed `treeAggregate`), embed it
  * here, and the probe runs INSIDE WholeStageCodegen on the fact scan —
  * rows that cannot possibly join are dropped before the shuffle. False
  * positives are expected (fpp-bounded) and callers MUST re-verify with an
  * exact semi join on the survivors; false negatives cannot occur, so the
  * composed result is exact (property-tested in SketchesSpec).
  *
  * The filter ships to executors via `ctx.addReferenceObj` on the
  * expression itself (standard Serializable-case-class route, same as the
  * codegen references every literal uses); the deserialized bitset is
  * built lazily once per task, not per row.
  */
case class BloomMightContain(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain needs a BIGINT probe, got ${t.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Public for generated code. */
  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
