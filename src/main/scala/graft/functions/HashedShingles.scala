package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** SORTED DISTINCT 64-bit hashes of a document's word n-gram shingles —
  * the r16 "shuffle hashes, not payloads" form (optimization guide
  * §2.3) of `Dedup.shingles`:
  *
  *   array_distinct(transform(windows, w -> concat_ws(" ", w)))
  *     ≈ sorted distinct xxhash64("w1 w2 … wn")
  *
  * Every downstream consumer of the verify pipelines (document
  * frequency, prefix ranking, bucket keys, pairwise intersections)
  * needs shingle IDENTITY, never shingle text — so an 8-byte hash
  * replaces a ~30-byte string in every shuffle and broadcast, and the
  * per-pair verify becomes the allocation-free sorted-merge
  * [[SortedIntersectCount]] instead of `array_intersect` over string
  * arrays (per-row hash set of strings).
  *
  * Collision posture: two distinct shingles sharing a hash merge, at
  * the same 2⁻⁶⁴-scale probability the engine already accepts wherever
  * xxhash64 keys a dedup decision (passage dedup, embedding bands) —
  * a collision can only nudge one pair's intersection/union counts by
  * one; candidacy is never lost (bucket merges add candidates). The
  * small-corpus oracles compare against text-derived truth and stay
  * bit-green (zero collisions there by construction).
  *
  * Kernel: one pass per window into a reusable byte buffer (tokens
  * joined by 0x20 — byte-identical to the concat_ws form), hashed with
  * Spark's own XXH64 (seed 42, the `xxhash64` function's), then
  * sort + in-place dedup of the primitive long array. Docs with fewer
  * than `n` tokens yield an EMPTY array (the `shingles` guard).
  * Codegen via the static-forwarder idiom (NfcNormalize pattern).
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs an array<string> input and n >= 1, got " +
        s"${t.catalogString}, n=$n")
  }

  override def nullSafeEval(v: Any): Any =
    HashedShinglesAlgo.eval(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShinglesAlgo.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {
  def of(tokens: Column, n: Int): Column =
    ColumnShim.column(HashedShingles(ColumnShim.expression(tokens), n))
}

object HashedShinglesAlgo {
  private val empty = new GenericArrayData(Array.empty[Long])

  def eval(tokens: ArrayData, n: Int): GenericArrayData = {
    if (tokens == null) return null
    val m = tokens.numElements()
    if (m < n) return empty
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val out = new Array[Long](m - n + 1)
    var buf = new Array[Byte](256)
    i = 0
    while (i <= m - n) {
      var len = n - 1 // separators
      var k = 0
      while (k < n) { len += toks(i + k).numBytes(); k += 1 }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var off = 0
      k = 0
      while (k < n) {
        val t = toks(i + k)
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
        off += t.numBytes()
        if (k < n - 1) { buf(off) = ' '; off += 1 }
        k += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }
}
