package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String / regex / tokenize operators — the Spark-native re-expression of
  * the reference's mapper-side string processing
  * (ref: PageRankAlgorithm.java:146-267, InvertedIndex.java:69-110).
  *
  * Everything here is built from `org.apache.spark.sql.functions` so it
  * stays inside whole-stage codegen; no Scala UDFs in the hot path.
  */
object TextOps {

  /** P1 — regex match filter (ref: PageRankAlgorithm.java:148-149,170-175).
    * Keep rows whose `col` matches `pattern`; non-matching rows dropped
    * before any shuffle, exactly like the reference's mapper-side filter —
    * except here Catalyst can additionally push the scan-level parts down
    * to parquet.
    */
  def filterMatching(df: DataFrame, c: Column, pattern: String): DataFrame =
    df.filter(c.isNotNull && length(c) > 0 && c.rlike(pattern))

  /** P2 — regex group extract (ref: PageRankAlgorithm.java:173,235-241;
    * InvertedIndex.java:93-100). */
  def extractGroup(c: Column, pattern: String, group: Int): Column =
    regexp_extract(c, pattern, group)

  /** P3 — regex find-all (ref: PageRankAlgorithm.java:241-259 Matcher.find
    * loop) → ArrayType(StringType) of all matches. */
  def extractAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(0))

  /** P5 — character-class scrub (ref: InvertedIndex.java:100-101):
    * runs of non-alphabetic chars → single space. */
  def scrubNonAlpha(c: Column): Column =
    regexp_replace(c, "[^a-zA-Z]+", " ")

  /** P6 — token normalization (ref: InvertedIndex.java:104). */
  def normalizeToken(c: Column): Column = lower(trim(c))

  /** F2 — tokenize: one row per word occurrence
    * (ref: InvertedIndex.java:102-106 StringTokenizer loop).
    * Whitespace-run splitting with empty tokens dropped, like
    * StringTokenizer — since r16 via the fused single-pass byte scan
    * [[graft.functions.WsTokens]] (one input read, no regex engine, no
    * scrub/lower copies) instead of `filter(split(trim(c), "\\s+"))`.
    * Bit-identical output — pinned by TokensSpec against
    * [[tokenizeComposed]] and by every tokenizing oracle key.
    */
  def tokenize(c: Column): Column = graft.functions.WsTokens.tokens(c)

  /** The pre-r16 composed Catalyst form of [[tokenize]] — kept as the
    * independent cross-check TokensSpec compares the fused scan against. */
  private[graft] def tokenizeComposed(c: Column): Column = {
    val arr = split(trim(c), "\\s+")
    filter(arr, t => length(t) > 0)
  }

  /** F2 as a relation: df + exploded `word` column per occurrence. */
  def explodeTokens(df: DataFrame, c: Column, as: String): DataFrame =
    df.withColumn(as, explode(tokenize(c)))

  /** PII patterns for corpus redaction — the scrub every published LLM
    * pipeline runs before training. Kept to the Java∩RE2 subset (char
    * classes + \b only, no lookaround) so the DuckDB oracle runs the
    * IDENTICAL patterns. Order-safe: the three patterns cannot overlap. */
  val piiEmail: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val piiIp: String    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val piiPhone: String = "\\b555-[0-9]{4}\\b"

  /** Redact emails / IPv4s / phone-shaped tokens to typed placeholders.
    * Pure map-side regexp_replace chain — codegen'd, zero shuffle; at
    * 100 TB this runs at scan speed alongside the quality gates. IP
    * before phone: both match digit runs, and fixing the order makes the
    * composition deterministic even if patterns evolve to overlap. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, piiEmail, "<EMAIL>"),
        piiIp, "<IP>"),
      piiPhone, "<PHONE>")

  /** Per-row PII hit counts (pre-redaction) — the observability feed a
    * privacy pass reports; same zero-shuffle shape. */
  def piiCounts(c: Column): (Column, Column, Column) =
    (size(regexp_extract_all(c, lit(piiEmail), lit(0))).cast("long"),
     size(regexp_extract_all(c, lit(piiIp), lit(0))).cast("long"),
     size(regexp_extract_all(c, lit(piiPhone), lit(0))).cast("long"))

  /** Positional tokenize — (pos, word) pairs; the deterministic form used
    * by shingling (dedup) where token order matters.  posexplode keeps the
    * in-document order as an explicit column instead of relying on row
    * order (which a shuffle would destroy).
    */
  def explodeTokensWithPos(df: DataFrame, c: Column, posAs: String, wordAs: String): DataFrame =
    df.select(df.columns.map(col) :+ posexplode(tokenize(c)).as(Seq(posAs, wordAs)): _*)
}
