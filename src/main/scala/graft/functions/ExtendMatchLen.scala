package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the maximal common substring of `ta` and `tb` obtained by
  * extending a known k-char match at 1-based positions (`pa`, `pb`)
  * left and right while characters agree — the extend-verify kernel of
  * exact-substring dedup: an anchor-gram match proves k shared chars,
  * this measures the full run so a ≥N filter is exact.
  *
  * O(match length) per row with zero allocation beyond the two string
  * decodes; candidate-bounded by construction (only anchor-matched
  * pairs reach it). Codegen stays inline via a static helper call.
  */
case class ExtendMatchLen(ta: Expression, tb: Expression,
                          pa: Expression, pb: Expression, k: Int)
    extends QuaternaryExpression {

  override def first: Expression = ta
  override def second: Expression = tb
  override def third: Expression = pa
  override def fourth: Expression = pb

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "extend_match_len"

  override def checkInputDataTypes(): TypeCheckResult =
    (ta.dataType, tb.dataType, pa.dataType, pb.dataType) match {
      case (StringType, StringType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "extend_match_len needs (string, string, bigint, bigint)")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ExtendMatchLen.extend(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      c.asInstanceOf[Long], d.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.ExtendMatchLen.extend($a, $b, $c, $d, $k)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): ExtendMatchLen =
    copy(ta = f, tb = s, pa = t, pb = q)
}

object ExtendMatchLen {
  /** pa/pb are 1-based gram start positions in CODE POINTS (the SQL
    * substring convention, which [[WinnowAnchorPositions]] also uses —
    * UTF-16 charAt offsets would misalign on supplementary chars). */
  def extend(ta: UTF8String, tb: UTF8String, pa1: Long, pb1: Long, k: Int): Long = {
    val a = ta.toString.codePoints().toArray
    val b = tb.toString.codePoints().toArray
    val pa = pa1.toInt - 1; val pb = pb1.toInt - 1
    var l = 0
    while (pa - l - 1 >= 0 && pb - l - 1 >= 0 &&
        a(pa - l - 1) == b(pb - l - 1)) l += 1
    var r = 0
    while (pa + k + r < a.length && pb + k + r < b.length &&
        a(pa + k + r) == b(pb + k + r)) r += 1
    (k + l + r).toLong
  }
}
