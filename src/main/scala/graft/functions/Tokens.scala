package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused byte-level tokenizers — the single-pass replacements for the
  * regex tokenize chains in the two hottest per-task code paths
  * (optimization guide §1.2 step 2 / §4.1: make per-task work cheap with
  * codegen-friendly expressions once the job shape is right).
  *
  * [[WsTokens]] ≡ `filter(split(trim(c), "\\s+"), t -> length(t) > 0)`
  * (TextOps.tokenize): maximal runs of non-whitespace bytes, where
  * whitespace is Java regex `\s` = `[ \t\n\x0B\f\r]` — ASCII-only
  * (Pattern without UNICODE_CHARACTER_CLASS does not match U+00A0 etc.),
  * so a byte-level scan is exact: all six whitespace bytes are < 0x80
  * and UTF-8 continuation bytes can never alias them.
  *
  * [[AlphaTokens]] ≡ `tokenize(lower(trim(regexp_replace(c,
  * "[^a-zA-Z]+", " "))))` (InvertedIndex.occurrences): maximal runs of
  * ASCII letters, lowercased. Same byte-level argument; `lower` on
  * pure-ASCII runs is `| 0x20`.
  *
  * Why they exist: the composed forms cost two full regex passes plus
  * two whole-string copies (scrub, lower) per document before the split
  * even allocates its token array — measured as the dominant per-task
  * cost of the GB-scale dump_index leg. The fused scan reads each input
  * byte once and allocates only the emitted token strings (zero-copy
  * UTF8String slices of the input buffer where no case-folding is
  * needed). Equivalence is pinned by TokensSpec against the composed
  * Catalyst forms on adversarial inputs, and every oracle-checked key
  * that tokenizes re-certifies it end-to-end.
  *
  * Both stay inside WholeStageCodegen via the static-forwarder call
  * idiom (NfcNormalize/JaroWinkler pattern).
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens needs a STRING input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TokensAlgo.wsTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensAlgo.wsTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WsTokens {
  def tokens(c: Column): Column = ColumnShim.column(WsTokens(ColumnShim.expression(c)))
}

case class AlphaTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "alpha_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"alpha_tokens needs a STRING input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    TokensAlgo.alphaTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensAlgo.alphaTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AlphaTokens =
    copy(child = newChild)
}

object AlphaTokens {
  def tokens(c: Column): Column = ColumnShim.column(AlphaTokens(ColumnShim.expression(c)))
}

/** Byte-scan kernels behind Scala static forwarders for generated Java.
  * Emitted tokens are zero-copy UTF8String slices over the input byte
  * buffer where possible (UTF8String.fromBytes shares the array; the
  * downstream UnsafeProjection copies token bytes out immediately, so
  * no document-sized buffer outlives the row). */
object TokensAlgo {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  def wsTokens(s: UTF8String): GenericArrayData = {
    if (s == null) return null
    val bytes = s.getBytes // zero-copy when the UTF8String spans its array
    val n = bytes.length
    val out = new ArrayBuffer[AnyRef](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }

  def alphaTokens(s: UTF8String): GenericArrayData = {
    if (s == null) return null
    val bytes = s.getBytes
    val n = bytes.length
    val out = new ArrayBuffer[AnyRef](8)
    var i = 0
    while (i < n) {
      while (i < n && !isAlpha(bytes(i))) i += 1
      val start = i
      var hasUpper = false
      while (i < n && isAlpha(bytes(i))) {
        if (bytes(i) < 'a') hasUpper = true
        i += 1
      }
      if (i > start) {
        if (!hasUpper) out += UTF8String.fromBytes(bytes, start, i - start)
        else {
          val t = java.util.Arrays.copyOfRange(bytes, start, i)
          var k = 0
          while (k < t.length) {
            if (t(k) < 'a') t(k) = (t(k) | 0x20).toByte
            k += 1
          }
          out += UTF8String.fromBytes(t)
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
