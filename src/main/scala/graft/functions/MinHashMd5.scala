package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** min(md5(s"$perm:" ++ shingle)) over a shingle array — a custom Catalyst
  * Expression replacing the built-in composition
  * `array_min(transform(sgl, s => md5(concat(...))))`.
  *
  * Why custom (SURVEY.md §7.3 escalation rule — built-ins first, custom
  * Expression only when they genuinely fall short):
  *  - the built-in Md5 allocates a fresh MessageDigest AND hex-encodes
  *    every shingle; this evaluator reuses one digest per task and
  *    compares RAW digest bytes (unsigned lexicographic byte order ==
  *    lowercase-hex string order, so the result is IDENTICAL), hex-encoding
  *    only the single winning digest per row;
  *  - the transform materializes an intermediate 32-char-string array per
  *    row per permutation; this is a single fused pass, no intermediates.
  *
  * Returns the same lowercase-hex string as the built-in path (and the
  * DuckDB oracle). Null for null/empty arrays (matching array_min/list_min
  * over empty). Evaluated via CodegenFallback: the md5 work dominates, and
  * staying off codegen also keeps JIT pressure down in iterative callers.
  */
case class MinHashMd5(child: Expression, perm: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_md5 needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val digest = MessageDigest.getInstance("MD5")
  @transient private lazy val prefix = s"$perm:".getBytes("UTF-8")

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val data = arr.asInstanceOf[ArrayData]
    val n = data.numElements()
    if (n == 0) return null
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (!data.isNullAt(i)) {
        digest.reset()
        digest.update(prefix)
        digest.update(data.getUTF8String(i).getBytes)
        val h = digest.digest()
        if (min == null || unsignedCompare(h, min) < 0) min = h
      }
      i += 1
    }
    if (min == null) null else UTF8String.fromString(hex(min))
  }

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
}

object MinHashMd5 {
  /** Column-API entry point. */
  def minhashMd5(shingles: Column, perm: Int): Column =
    ColumnShim.column(MinHashMd5(ColumnShim.expression(shingles), perm))
}
