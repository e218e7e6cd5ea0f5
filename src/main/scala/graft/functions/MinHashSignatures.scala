package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature vector in ONE pass over the token array:
  * sig[p] = min over shingles of md5(s"$p:" ++ shingle), p < numPerms.
  *
  * Fuses what the composed form (shingles → array_distinct → per-perm
  * transform+array_min) does in 10+ array materializations:
  *  - shingle strings are built once per position and fed to all perms;
  *  - no shingle array, no distinct (min over a multiset equals min over
  *    its set — distinctness is irrelevant to MinHash), no per-perm
  *    32-hex-string arrays;
  *  - one reused MessageDigest per task, raw-byte minima (byte order ==
  *    lowercase-hex order), hex-encoded only for the numPerms winners.
  *
  * Returns array<string> of length numPerms; null when the doc has fewer
  * than shingleSize tokens (mirrors list_min over an empty list — the
  * band join then drops the doc on both engines).
  */
case class MinHashSignatures(child: Expression, numPerms: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signatures"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signatures needs array<string> tokens, got ${other.catalogString}")
    }

  @transient private lazy val digest = MessageDigest.getInstance("MD5")
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numPerms)(p => s"$p:".getBytes("UTF-8"))

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val words = arr.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < shingleSize) return null
    val mins = new Array[Array[Byte]](numPerms)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - shingleSize) {
      // a window containing a null token contributes no shingle (the
      // input type admits containsNull=true; mirrors MinHashMd5)
      var hasNull = false
      var k = 0
      while (k < shingleSize) {
        if (words.isNullAt(i + k)) { hasNull = true; k = shingleSize }
        else k += 1
      }
      if (!hasNull) {
        sb.setLength(0)
        k = 0
        while (k < shingleSize) {
          if (k > 0) sb.append(' ')
          sb.append(words.getUTF8String(i + k).toString)
          k += 1
        }
        val shingleBytes = sb.toString.getBytes("UTF-8")
        var p = 0
        while (p < numPerms) {
          digest.reset()
          digest.update(prefixes(p))
          digest.update(shingleBytes)
          val h = digest.digest()
          if (mins(p) == null || compareBytes(h, mins(p)) < 0) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    // all windows null-skipped → no shingles → same as a too-short doc
    if (mins(0) == null) return null
    new GenericArrayData(mins.map(m => UTF8String.fromString(hex(m)): AnyRef))
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
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

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatures =
    copy(child = newChild)
}

object MinHashSignatures {
  def minhashSignatures(tokens: Column, numPerms: Int, shingleSize: Int): Column =
    ColumnShim.column(MinHashSignatures(ColumnShim.expression(tokens), numPerms, shingleSize))
}
