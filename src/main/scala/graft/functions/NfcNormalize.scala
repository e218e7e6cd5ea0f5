package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step multilingual corpus pipelines run before
  * hashing/dedup (the same text arrives composed from one crawler and
  * decomposed from another; without NFC they hash apart and every
  * downstream exact-dedup / fingerprint / join key silently misses).
  *
  * Spark has no built-in normalization function; the kernel is the
  * JDK's `java.text.Normalizer` (Unicode-conformant NFC), called
  * through the [[NfcAlgo]] static forwarder so generated code stays a
  * single static call inside WholeStageCodegen (the JaroWinkler
  * pattern). DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, which is what makes the cross-engine oracle possible.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a STRING input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcAlgo.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcAlgo.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Scalar kernel behind a Scala static forwarder for generated Java.
  * Fast path: `Normalizer.isNormalized` is a cheap scan that avoids the
  * allocation-heavy normalize call for the (overwhelmingly common)
  * already-NFC input. */
object NfcAlgo {
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
