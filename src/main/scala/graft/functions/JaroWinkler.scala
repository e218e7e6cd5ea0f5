package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native expression — the fuzzy
  * equality used by record-linkage / entity-resolution passes where
  * MinHash shingles are too coarse (short attribute strings: names,
  * brands, titles).
  *
  * Semantics match the common boost-threshold formulation (and DuckDB's
  * `jaro_winkler_similarity`, which is the correctness oracle for the
  * `fuzzy_join` key):
  *
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0);
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0 when m = 0;
  *   - Winkler prefix boost jw = jaro + ℓ·0.1·(1−jaro) with ℓ = common
  *     prefix length capped at 4, applied ONLY when jaro > 0.7
  *     (verified against DuckDB: 'aaaaaa'/'aaabbb' → 2/3 unboosted);
  *   - either side empty → 0.0 (DuckDB convention, including ''/'' —
  *     identity short-circuits only for non-empty equal strings).
  *
  * Comparison is at the BYTE level of the UTF-8 encoding — exact for
  * ASCII (all fixture data) and for any pair where one side is ASCII;
  * multi-byte code points compare as their byte sequences, which can
  * differ from code-point-level Jaro on non-ASCII pairs (documented,
  * not hit by the contract surface).
  *
  * Not a UDF: the expression stays inside WholeStageCodegen — codegen
  * emits one static call into [[JaroWinklerAlgo]] (JIT-compiled scalar
  * loop, no serialization, no boxing). Per-row state is two small
  * boolean arrays bounded by the string lengths.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two strings, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** The scalar kernel, separated so generated Java calls it via the
  * Scala static forwarder. */
object JaroWinklerAlgo {

  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (ua.equals(ub)) return 1.0

    val win = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb, i + win + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // transpositions: walk matched positions in order on both sides
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val trans = t / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans) / md) / 3.0
    if (jaro <= 0.7) return jaro

    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
