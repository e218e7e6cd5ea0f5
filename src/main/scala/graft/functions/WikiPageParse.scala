package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (the genuine UDTF surface): one pass over a
  * raw wiki-XML chunk → one output row per `<page>` block, with title,
  * first numeric id, text body, AND the resolved outlink array — fusing
  * what the composed form (`WikiParser.pages` + `outlinks`) does in four
  * DOTALL `regexp_extract(_all)` re-scans of every page plus a per-link
  * lambda pipeline, into a single forward `indexOf` scan that never
  * backtracks and allocates only the row being emitted.
  *
  * Semantics are EXACTLY `WikiParser.pages`/`outlinks` (same oracle):
  *  - page block = first `<page>` to nearest following `</page>`
  *    (non-greedy), scan resumes after the close tag;
  *  - title = first `<title>…</title>` in the block; pages with an empty
  *    or absent title are dropped (the generator emits nothing — the
  *    fused analog of `filter(length(title) > 0)`);
  *  - id = first `<id>` whose content up to the next `</id>` is 1+
  *    digits (the PAGE id, not revision/contributor ids — ref
  *    InvertedIndex.java:93-95 took the last, contradicting README:80);
  *  - text = after the first `<text[^>]*>` (any chars to the first `>`),
  *    up to the next `</text>`; absent → empty string;
  *  - links = `[[…]]` occurrences of the text in order, innermost
  *    segment of nested links (split on `[[`, last part — ref
  *    PageRankAlgorithm.java:245-250), trimmed, empties dropped,
  *    duplicates and self-links kept.
  *
  * Distribution: a Generator runs inside WholeStageCodegen's Generate
  * operator per input row — no shuffle, no driver involvement; with the
  * splittable `</page>` reader each executor parses only its own split.
  */
case class WikiPageParse(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("links", ArrayType(StringType, containsNull = false), nullable = false)))

  override def prettyName: String = "wiki_pages"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wiki_pages needs a string column, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    val out = ArrayBuffer.empty[InternalRow]
    var pos = 0
    while (pos < s.length) {
      val open = s.indexOf("<page>", pos)
      if (open < 0) pos = s.length
      else {
        val close = s.indexOf("</page>", open + 6)
        if (close < 0) pos = s.length
        else {
          parsePage(s, open + 6, close, out)
          pos = close + 7
        }
      }
    }
    out
  }

  /** Parse one block s[from, until) and append a row if it has a title. */
  private def parsePage(s: String, from: Int, until: Int,
                        out: ArrayBuffer[InternalRow]): Unit = {
    val title = firstBetween(s, from, until, "<title>", "</title>")
    if (title == null || title.isEmpty) return
    val id = firstDigitId(s, from, until)
    val text = textBody(s, from, until)
    out += InternalRow(
      UTF8String.fromString(title), UTF8String.fromString(id),
      UTF8String.fromString(text),
      new GenericArrayData(links(text).map(UTF8String.fromString(_): AnyRef)))
  }

  /** First openTag…closeTag content within [from, until), else null. */
  private def firstBetween(s: String, from: Int, until: Int,
                           openTag: String, closeTag: String): String = {
    val i = s.indexOf(openTag, from)
    if (i < 0 || i >= until) return null
    val j = s.indexOf(closeTag, i + openTag.length)
    if (j < 0 || j > until - closeTag.length) return null
    s.substring(i + openTag.length, j)
  }

  /** First `<id>` whose content to the next `</id>` is 1+ digits ("" if
    * none) — equivalent to the first match of `<id>(\d+)</id>`. */
  private def firstDigitId(s: String, from: Int, until: Int): String = {
    var i = s.indexOf("<id>", from)
    while (i >= 0 && i < until) {
      val j = s.indexOf("</id>", i + 4)
      if (j < 0 || j > until - 5) return ""
      val content = s.substring(i + 4, j)
      if (content.nonEmpty && content.forall(c => c >= '0' && c <= '9'))
        return content
      i = s.indexOf("<id>", i + 4)
    }
    ""
  }

  /** First `<text[^>]*>` body to the next `</text>` ("" if none). */
  private def textBody(s: String, from: Int, until: Int): String = {
    var i = s.indexOf("<text", from)
    while (i >= 0 && i < until) {
      val gt = s.indexOf('>', i + 5)
      if (gt < 0 || gt >= until) return ""
      val j = s.indexOf("</text>", gt + 1)
      if (j >= 0 && j <= until - 7) return s.substring(gt + 1, j)
      i = s.indexOf("<text", i + 5)
    }
    ""
  }

  /** `[[…]]` occurrences, innermost segment, trimmed, empties dropped. */
  private def links(text: String): Array[String] = {
    val buf = ArrayBuffer.empty[String]
    var pos = 0
    while (pos < text.length) {
      val open = text.indexOf("[[", pos)
      if (open < 0) pos = text.length
      else {
        val close = text.indexOf("]]", open + 2)
        if (close < 0) pos = text.length
        else {
          // innermost: content after the LAST "[[" inside the capture
          var seg = open + 2
          var k = text.indexOf("[[", seg)
          while (k >= 0 && k < close) { seg = k + 2; k = text.indexOf("[[", seg) }
          val link = text.substring(seg, close).trim
          if (link.nonEmpty) buf += link
          pos = close + 2
        }
      }
    }
    buf.toArray
  }

  override protected def withNewChildInternal(newChild: Expression): WikiPageParse =
    copy(child = newChild)
}

object WikiPageParse {
  /** Column API: explodes into (title, id, text, links) rows. */
  def wikiPages(raw: Column): Column =
    ColumnShim.column(WikiPageParse(ColumnShim.expression(raw)))
}
