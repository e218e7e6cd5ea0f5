package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable SimHash signature in ONE pass over the token array — the
  * fused form of `Dedup.simhashPortableComposed`, byte-identical by
  * construction (spec-asserted):
  * bit `4j+k` of the signature is bit `k` of hex digit `j+1` of
  * `md5(word)`, weighted by the word's occurrence count; a bit is set
  * when its weighted sum is positive.
  *
  * Why fuse: the composed relational form explodes the corpus to one row
  * per token occurrence and shuffles TWICE (count per (doc, word), then
  * 60 conditional sums per doc), with 60 `conv(substr(hex))` expressions
  * per word row. Here the signature is a per-document projection — zero
  * shuffles, one reused MessageDigest per task, nibbles read straight
  * from the digest bytes (hex digit `d` is the high nibble of byte `d/2`
  * when `d` is even, low when odd). At 100 TB the difference is "two
  * corpus-wide shuffles of exploded tokens" vs "none".
  *
  * Returns null for a null or empty token array — mirroring the composed
  * form, where a doc with no token rows vanishes from the aggregation
  * (callers filter nulls, dropping the doc on both engines). Null tokens
  * inside the array are skipped (consistent with MinHashMd5/Signatures).
  */
case class SimHashPortable(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {

  require(nBits > 0 && nBits <= 64, s"nBits must be in 1..64, got $nBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_portable"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_portable needs array<string> tokens, got ${other.catalogString}")
    }

  @transient private lazy val digest = MessageDigest.getInstance("MD5")

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val words = arr.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n == 0) return null
    // occurrence counts per distinct word (the composed form's first
    // aggregation, here a per-row hash map)
    val counts = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    var any = false
    while (i < n) {
      if (!words.isNullAt(i)) {
        counts.merge(words.getUTF8String(i), 1, Integer.sum)
        any = true
      }
      i += 1
    }
    if (!any) return null // all-null array ≡ no token rows
    val sums = new Array[Long](nBits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue.toLong
      digest.reset()
      val h = digest.digest(e.getKey.getBytes)
      var b = 0
      while (b < nBits) {
        val d = b >> 2 // hex digit index (0-based)
        val byte = h(d >> 1)
        val nibble = if ((d & 1) == 0) (byte >> 4) & 0xf else byte & 0xf
        if (((nibble >> (b & 3)) & 1) == 1) sums(b) += cnt else sums(b) -= cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (sums(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashPortable =
    copy(child = newChild)
}

object SimHashPortable {
  def simhash(tokens: Column, nBits: Int): Column =
    ColumnShim.column(SimHashPortable(ColumnShim.expression(tokens), nBits))
}
