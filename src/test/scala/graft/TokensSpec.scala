package graft

import org.apache.spark.sql.functions._
import graft.index.InvertedIndex
import graft.ops.TextOps

/** Equivalence pins for the r16 fused byte-scan tokenizers
  * (graft.functions.WsTokens / AlphaTokens) against the composed
  * Catalyst forms they replaced — the optimization-round discipline:
  * an internals change to a tokenizing operator must prove it computes
  * the same thing, on exactly the inputs where a byte-level scan could
  * plausibly diverge from the regex semantics. */
class TokensSpec extends SparkTestBase {
  import spark.implicits._

  /** Adversarial inputs: empties, pure whitespace, every ASCII \s byte,
    * non-ASCII whitespace (U+00A0, U+2028 — Java \s must NOT split on
    * these), multi-byte UTF-8 inside and between tokens, case mixes,
    * digits/punctuation runs, and leading/trailing separators. */
  private val cases: Seq[String] = Seq(
    "", " ", "   ", "\t\n\r ", "a", " a ", "a b", "  a  b   c ",
    "a\tb\nc\rdef", "Hello, World!!2  Ok",
    "ALLCAPS lower MiXeD", "don't STOP-me now123abc",
    " ", "a b", "nb sp end", "line sep",
    "café naïve 中文 mixédCASE",
    "[[P123]] link [[Other|x]]", "  trailing space  ",
    "tab\tseparated\twords", "1234 5678", "__under__score__",
    "😀 emoji😀inside", "A", "Z z aA Zz")

  test("WsTokens ≡ filter(split(trim(c), \\s+)) on adversarial inputs") {
    val df = cases.toDF("v")
    val fused = df.select(TextOps.tokenize(col("v"))).as[Seq[String]].collect()
    val composed = df.select(TextOps.tokenizeComposed(col("v")))
      .as[Seq[String]].collect()
    fused.zip(composed).zip(cases).foreach { case ((f, c), in) =>
      assert(f == c, s"WsTokens diverged on ${in.map(_.toInt.toHexString)}")
    }
    // null in → null out, matching the composed chain
    val nullRow = Seq(Option.empty[String]).toDF("v")
    assert(nullRow.select(TextOps.tokenize(col("v"))).head().isNullAt(0))
    assert(nullRow.select(TextOps.tokenizeComposed(col("v"))).head().isNullAt(0))
  }

  test("AlphaTokens ≡ scrub→lower→tokenize on adversarial inputs") {
    val df = cases.toDF("v")
    val fused = df.select(explode_outer(
        graft.functions.AlphaTokens.tokens(col("v"))).as("w"))
      .as[Option[String]].collect().toSeq
    val composed = df.select(explode_outer(TextOps.tokenizeComposed(
        TextOps.normalizeToken(TextOps.scrubNonAlpha(col("v"))))).as("w"))
      .as[Option[String]].collect().toSeq
    assert(fused.sorted == composed.sorted)
  }

  test("occurrences (fused) ≡ occurrencesComposed on a mixed corpus") {
    val docs = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = InvertedIndex.occurrences(docs, "doc_id", "text")
      .as[(String, Long)].collect().sorted.toSeq
    val composed = InvertedIndex.occurrencesComposed(docs, "doc_id", "text")
      .as[(String, Long)].collect().sorted.toSeq
    assert(fused == composed)
  }

  test("fused tokenizers evaluate identically interpreted and codegen'd") {
    // force the interpreted path (eval) next to the codegen path by
    // evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    cases.foreach { s =>
      val ws = graft.functions.WsTokens(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
      val al = graft.functions.AlphaTokens(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
      val wsGot = ws.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val wsWant = s.split("\\s+").toSeq.filter(_.nonEmpty)
      assert(wsGot == wsWant, s"interpreted WsTokens on '$s'")
      val alGot = al.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val alWant = s.replaceAll("[^a-zA-Z]+", " ")
        .toLowerCase(java.util.Locale.ROOT).trim
        .split("\\s+").toSeq.filter(_.nonEmpty)
      assert(alGot == alWant, s"interpreted AlphaTokens on '$s'")
    }
  }
}
