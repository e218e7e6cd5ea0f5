package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.functions.{NfcAlgo, NfcNormalize}
import org.apache.spark.unsafe.types.UTF8String

/** All unicode literals as explicit escapes -- a source-encoding
  * normalization pass must not be able to change what this spec tests.
  * (Scala processes \uXXXX escapes in source, so these are real
  * combining characters at runtime.) */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def nfcCol(c: org.apache.spark.sql.Column) =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c)))

  private val composed = "caf\u00e9 \u00fcber"          // 9 chars (precomposed)
  private val decomposed = "cafe\u0301 u\u0308ber"   // 11 chars (combining marks)

  test("composed and decomposed forms normalize to the same bytes") {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
      .select(col("id"), nfcCol(col("s")).as("n"), length(col("s")).as("raw"))
    val rows = df.as[(Long, String, Int)].collect().sortBy(_._1)
    assert(rows(0)._2 === rows(1)._2)             // identical after NFC
    assert(rows(0)._3 === 9 && rows(1)._3 === 11) // raw lengths differ
    assert(rows(0)._2 === composed)               // NFC prefers composed
  }

  test("kernel: idempotent, ASCII pass-through (same reference), null-safe") {
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NfcAlgo.nfc(ascii) eq ascii) // isNormalized fast path, no copy
    val dec = UTF8String.fromString("e\u0301")
    assert(NfcAlgo.nfc(NfcAlgo.nfc(dec)) === NfcAlgo.nfc(dec))
    assert(NfcAlgo.nfc(null) === null)
  }

  test("codegen and interpreted paths agree") {
    val expr = NfcNormalize(ColumnShim.expression(lit("x")))
    val samples = Seq(composed, decomposed, "", "a\u030ab",
      "\u6f22\u5b57")
    val viaDf = samples.toDF("s").select(nfcCol(col("s"))).as[String].collect()
    val viaEval = samples.map(s =>
      expr.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[UTF8String].toString)
    assert(viaDf.toSeq === viaEval)
  }
}
