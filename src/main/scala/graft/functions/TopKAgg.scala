package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k — the typed `Aggregator` (UDAF) surface of
  * SURVEY §2.9, completing the custom-function trio (scalar `Expression`s:
  * MinHashMd5/MinHashSignatures; `Generator` UDTF: WikiPageParse; UDAF:
  * this).
  *
  * Keeps at most k (value, tag) pairs in the aggregation buffer, so a
  * group of ANY size aggregates in O(k) memory and the partial (map-side)
  * combine ships k rows per group per partition — the scale-path
  * alternative to `row_number().over(Window)` top-k, which shuffles and
  * sorts every row of every group. Ordering: value DESC, tag ASC on ties
  * (deterministic, oracle-matched).
  *
  * The buffer is a sorted List (largest first); insert/merge keep it
  * truncated at k. For the k values this engine uses (single digits) the
  * O(k) list insert beats a heap's constant factors.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, String), List[(Double, String)], String] {

  private def insert(buf: List[(Double, String)],
                     e: (Double, String)): List[(Double, String)] = {
    // descending value, ascending tag on ties
    val (before, after) = buf.span(b =>
      b._1 > e._1 || (b._1 == e._1 && b._2 <= e._2))
    val merged = before ::: (e :: after)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Double, String)] = Nil

  override def reduce(buf: List[(Double, String)],
                      in: (Double, String)): List[(Double, String)] =
    if (buf.length == k && buf.last._1 > in._1) buf // common fast reject
    else insert(buf, in)

  override def merge(a: List[(Double, String)],
                     b: List[(Double, String)]): List[(Double, String)] =
    b.foldLeft(a)(insert)

  /** Comma-joined tags, best first. */
  override def finish(buf: List[(Double, String)]): String =
    buf.map(_._2).mkString(",")

  override def bufferEncoder: Encoder[List[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, String)]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object TopKAgg {
  /** Untyped column form: `topK(3)(valueCol, tagCol)`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k))

  def topK(k: Int, value: Column, tag: Column): Column = topK(k)(value, tag)
}
