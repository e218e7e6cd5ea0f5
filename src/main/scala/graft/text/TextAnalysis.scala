package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Text-quality metrics for training-data curation: quality scoring,
  * token counting, document fingerprinting, language identification.
  * All pure per-row projections (no shuffle) built from codegen'd array
  * expressions — they run at scan speed on a 1000-executor cluster.
  */
object TextAnalysis {

  private val StopWords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Stopword fraction of a token array (shared by [[quality]] and
    * [[curate]] so the two can't drift). */
  private def stopRatio(words: Column): Column =
    round(size(filter(words, w => w.isInCollection(StopWords))).cast("double")
      / size(words), 6)

  /** Quality features per document. Ratios are exact-integer divisions
    * (bit-reproducible across engines). */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = TextOps.tokenize(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(words).cast("long").as("n_tokens"),
      stopRatio(words).as("stop_ratio"),
      round(size(array_distinct(words)).cast("double") / size(words), 6)
        .as("distinct_ratio"),
      // single-spaced text: letters = chars - (tokens-1) separators
      round((length(col(textCol)).cast("double") - (size(words) - lit(1)))
        / size(words), 6).as("mean_word_len"))
  }

  /** Whitespace tokens vs BPE-ish regex tokens (letter runs / digit runs /
    * single other non-space chars) — the cheap token-count estimators a
    * data pipeline uses for budget accounting. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(TextOps.tokenize(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .cast("long").as("re_tokens"))

  /** Corpus vocabulary / exact heavy hitters: top-`k` tokens by total
    * occurrence count (ties broken by token — total order, so the cut is
    * deterministic), with document frequency alongside — the vocab-
    * building pass of a training pipeline.
    *
    * Scale shape: one explode → groupBy shuffle with map-side partial
    * aggregation (token cardinality ≪ occurrence count, so partials
    * collapse hard); `orderBy.limit(k)` plans as TakeOrderedAndProject —
    * per-partition top-k heaps + a k-row driver merge, never a global
    * sort. countDistinct adds the standard two-phase expand; at 100 TB
    * swap it for approx_count_distinct if exact df is not required. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokenize(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("tok"))
      .limit(k)

  /** Corpus-RELATIVE quality cut: keep documents at or above the `q`-th
    * exact percentile of token count — "top (1−q) of the corpus by
    * length", the distribution-aware twin of [[curate]]'s absolute gates.
    *
    * Scale shape: a global percent_rank window would sort the corpus into
    * ONE partition (Spark's unpartitioned Window). Instead: aggregate the
    * scalar threshold (one reduce to a single row), broadcast it back,
    * and filter map-side — two scans of a two-column projection, no wide
    * shuffle, no single-task sort. The exact interpolated percentile over
    * integer token counts reproduces bit for bit in any engine. */
  def qualityCut(docs: DataFrame, idCol: String, textCol: String,
                 q: Double): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"),
      size(TextOps.tokenize(col(textCol))).cast("long").as("n_tokens"))
    val thr = scored.agg(expr(s"percentile(n_tokens, $q)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("n_tokens") >= col("thr"))
      .select(col("doc_id"), col("n_tokens"), round(col("thr"), 6).as("thr"))
  }

  /** Per-source document cap — the domain-cap pass of a web-corpus
    * pipeline (no single domain may dominate the training mix): keep the
    * first `k` docs per source in deterministic (doc id) order.
    *
    * Scale shape: one hash shuffle on the source key + a per-partition
    * sort — the window never sees more than one source's docs in one
    * frame, and source cardinality ≫ executor count keeps partitions
    * balanced. A pathologically hot source is exactly what the cap
    * REMOVES, so the skew self-heals: only k rows per source survive. */
  def sourceCap(docs: DataFrame, idCol: String, srcCol: String,
                k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** TOKEN-budget source mixing: admit each source's docs, in the
    * deterministic md5(doc_id) shuffle order, while the source's token
    * budget is not yet exhausted — the doc that crosses the line is
    * kept (soft cap: a source is never starved because one long doc
    * straddles the boundary). The token-aware form of [[sourceCap]]:
    * LLM mixture recipes are written in tokens per source, not docs.
    *
    * Scale shape: token counts are map-side; one window pass
    * partitioned by source (same caveat as [[sourceCap]]: a hot
    * source's rows land in one partition — at 100 TB, pre-cap hot
    * sources with a coarse doc cap first, then budget exactly). */
  def tokenBudgetCap(docs: DataFrame, idCol: String, srcCol: String,
                     textCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        size(TextOps.tokenize(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  /** Train/eval DECONTAMINATION: train documents sharing any `n`-gram
    * with the eval split (rows where `evalPred` holds), with the count of
    * distinct shared shingles — the standard benchmark-leakage sweep run
    * before training.
    *
    * Scale shape: the eval side is small BY CONSTRUCTION (an eval split
    * is a fixed benchmark, not a corpus), so its distinct shingle set
    * broadcasts and the train side is checked map-side after its shingle
    * explode — the corpus is never self-joined. For a large eval set,
    * drop the broadcast() hint and the same plan becomes a shuffle
    * semi-join. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    evalPred: Column, shingleSize: Int = 5): DataFrame = {
    // r17 (guide §2.3 shuffle/broadcast keys, not payloads): both sides
    // carry 8-byte shingle HASHES instead of ~30-byte shingle strings —
    // HashedShingles emits the SORTED DISTINCT xxhash64 of each doc's
    // n-grams in one byte-scan pass (no per-position string build, no
    // HOF-lambda re-tokenize), so the broadcast eval set and the train
    // explode shrink ~4x and the per-doc distinct in the agg is already
    // done (count(1) == countDistinct over per-doc-distinct hashes).
    // Collision posture: identical to the r16 dedup pipelines (2⁻⁶⁴ —
    // a collision can only merge two shingles); the string-keyed form
    // stays below as [[decontaminateComposed]] for the equivalence spec.
    val hsgl = graft.functions.HashedShingles.of(
      TextOps.tokenize(col(textCol)), shingleSize)
    val evalShingles = docs.filter(evalPred)
      .select(explode(hsgl).as("sgl")).distinct()
    docs.filter(!evalPred)
      .select(col(idCol).as("doc_id"), explode(hsgl).as("sgl"))
      .join(broadcast(evalShingles), Seq("sgl"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The pre-r17 string-shingle formulation of [[decontaminate]] — the
    * equivalence-spec cross-check target (collision-free by
    * construction, so the two must agree exactly on any corpus the
    * specs run). */
  private[graft] def decontaminateComposed(docs: DataFrame, idCol: String,
                                           textCol: String, evalPred: Column,
                                           shingleSize: Int = 5): DataFrame = {
    // The token array must be MATERIALIZED behind a one-row Generate
    // barrier before shingling: CollapseProject would otherwise inline
    // the split() into every element_at inside the shingle lambda, and
    // HOF lambdas are excluded from codegen subexpression elimination —
    // the text re-splits once per shingle position (O(tokens²) per doc;
    // measured 12.6 s → 1.7 s for the train explode at sf0.1). Same
    // idiom as Dedup.minhashSignatures' explode(array(…)) wrapper.
    def withTokens(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"),
        explode(array(TextOps.tokenize(col(textCol)))).as("w"))
    val sgl = graft.dedup.Dedup.shingles(col("w"), shingleSize)
    val evalShingles = withTokens(docs.filter(evalPred))
      .select(explode(sgl).as("sgl")).distinct()
    withTokens(docs.filter(!evalPred))
      .select(col("doc_id"), explode(sgl).as("sgl"))
      .join(broadcast(evalShingles), Seq("sgl"))
      .groupBy("doc_id")
      .agg(countDistinct(col("sgl")).as("n_hits"))
  }

  /** Polynomial rolling hash over characters, mod 1e9+7 — a portable
    * content fingerprint (identical in any engine with a left fold;
    * the classic h = h*31 + c). Codepoint-exact for ASCII corpora. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      aggregate(
        transform(filter(split(col(textCol), ""), c => length(c) > 0),
          c => ascii(c).cast("long")),
        lit(0L), (h, c) => (h * 31 + c) % 1000000007L).as("fp"))

  /** Shared with the generated DuckDB oracle (SparkEntry.oracleSql) so the
    * two engines can never drift on the profile lists. */
  private[graft] val LangStopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"))

  /** N-gram/stopword-profile language ID heuristic. Latin languages score
    * by stopword hits; CJK by han-character count; argmax wins (ties break
    * lexicographically via struct ordering — deterministic). Emits "und"
    * when nothing scores. */
  /** The winning (score, lang) struct for a text column — argmax over the
    * per-language stopword hit counts plus the CJK codepoint branch.
    * Shared by [[langId]] and [[curate]]. */
  private def bestLang(textCol: Column): Column = {
    val words = TextOps.tokenize(lower(textCol))
    val scored = LangStopWords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(words, w => w.isInCollection(sw))).cast("long").as("score"),
        lit(lang).as("lang"))
    } :+ struct(
      (length(textCol) - length(regexp_replace(textCol, "[\\u4e00-\\u9fff]", "")))
        .cast("long").as("score"),
      lit("zh").as("lang"))
    array_max(array(scored: _*))
  }

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val best = bestLang(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("lang_pred"),
      best.getField("score").as("lang_score"))
  }

  /** One-pass corpus curation — the composite filter chain a training-data
    * pipeline runs before tokenization: quality metrics, language ID and
    * the exact-dedup keeper flag computed together.
    *
    * Scale shape: everything except the keeper flag is a per-row
    * projection fused into the scan; the keeper flag is a min-over-window
    * partitioned by the content hash — ONE shuffle, no second scan of the
    * corpus and no keeper-set join (a keeper relation at 100 TB is nearly
    * as large as the corpus, so a semi-join formulation would shuffle
    * twice and scan twice). Callers filter on the emitted columns. */
  /** The STATELESS per-document column set [[curate]] is built from —
    * also the streaming-safe subset ([[graft.streaming.TextStream]] runs
    * exactly these expressions over an unbounded stream; sharing the
    * trees is what makes stream ≡ batch hold by construction). */
  private[graft] def metricCols(idCol: String, textCol: String): Seq[Column] = {
    val words = TextOps.tokenize(col(textCol))
    val best = bestLang(col(textCol))
    Seq(
      col(idCol).as("doc_id"),
      size(words).cast("long").as("n_tokens"),
      stopRatio(words).as("stop_ratio"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
        .as("lang_pred"))
  }

  def curate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val byContent = org.apache.spark.sql.expressions.Window.partitionBy(md5(col(textCol)))
    docs.select(metricCols(idCol, textCol) :+
      (col(idCol) === min(col(idCol)).over(byContent)).as("is_keeper"): _*)
  }

  /** Repetition metrics — the Gopher-style duplicate-fraction filters
    * (repeated boilerplate is the classic low-quality signal): fraction
    * of duplicate tokens and duplicate 2-grams per document. Pure
    * per-row array expressions: zero shuffles, scan speed. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.tokenize(col(textCol))
    val bg = zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => concat(a, lit(" "), b))
    docs.select(
      col(idCol).as("doc_id"),
      size(w).cast("long").as("n_tokens"),
      round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 6)
        .as("dup_token_frac"),
      when(size(w) >= 2,
        round(lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg), 6))
        .otherwise(lit(0.0)).as("dup_2gram_frac"))
  }

  /** Corpus-frequency scoring — the cheap stand-in for LM perplexity in a
    * curation pipeline: mean corpus occurrence count of a document's
    * tokens (rare-word-heavy docs score low) and the fraction of tokens
    * outside the top-`topK` vocabulary.
    *
    * Scale shape: one corpus-wide word count (single shuffle, partial
    * aggregation), the top-k vocabulary is bounded and BROADCAST, and the
    * per-token count re-attach is a plain equi-join — integer sums only,
    * so the per-doc averages are exact rationals. Top-k ties break on the
    * word for determinism. */
  def corpusFrequency(docs: DataFrame, idCol: String, textCol: String,
                      topK: Int = 1000): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokenize(col(textCol))).as("word"))
    val counts = tok.groupBy("word").agg(count(lit(1)).as("wc"))
    val top = counts.orderBy(desc("wc"), asc("word")).limit(topK)
      .select(col("word").as("vword"))
    tok.join(counts, "word")
      .join(broadcast(top), tok("word") === top("vword"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(col("wc")).as("freq_sum"),
        sum(when(col("vword").isNull, 1L).otherwise(0L)).as("oov"))
      .select(col("doc_id"),
        col("n").as("n_tokens"),
        round(col("freq_sum").cast("double") / col("n"), 6).as("mean_word_freq"),
        round(col("oov").cast("double") / col("n"), 6).as("oov_frac"))
  }

  /** [[curate]] plus free data-quality counters via `Dataset.observe`:
    * total docs, dedup keepers, language histogram top slot and token
    * mass, accumulated DURING the pass (no second scan, no count jobs) —
    * the numbers a production curation pipeline alerts on. Read the
    * `Observation` after an action on the returned frame. */
  def curateObserved(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("curation")
    val df = curate(docs, idCol, textCol).observe(obs,
      count(lit(1)).as("n_docs"),
      sum(when(col("is_keeper"), 1L).otherwise(0L)).as("n_keepers"),
      sum(when(col("lang_pred") === "en", 1L).otherwise(0L)).as("n_en"),
      sum(col("n_tokens")).as("token_mass"))
    (df, obs)
  }

  /** Per-document average bigram log-likelihood under the corpus's own
    * MLE bigram LM — the cheap perplexity proxy quality filters rank on
    * (a doc of improbable bigrams reads as noise/boilerplate). The LM is
    * trained on the scored corpus itself, so every bigram is in-vocab
    * and no smoothing constant has to be chosen.
    *
    * Determinism: each bigram's ln P(w2|w1) quantizes to the 1e-6 grid
    * as an exact INTEGER (floor(x·1e6 + 0.5) — exact half-up in any
    * engine), the per-doc sum is integer (order-independent, where a
    * double sum would depend on partial-aggregation order), and the
    * final division is two IEEE ops every engine performs identically —
    * the ivfCentroids fixed-point recipe.
    *
    * Returns (doc_id, n_bigrams, avg_logp), docs with ≥ 2 tokens. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val big = docs
      // Generate barrier: the per-bigram element_at lambda would
      // otherwise inline (and re-run) the tokenize split per element —
      // O(tokens²)/doc (the candidateShingles rule)
      .select(col(idCol).as("doc_id"),
        explode(array(TextOps.tokenize(col(textCol)))).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => concat(col("w")(i), lit(" "), col("w")(i + 1)))).as("bigram"))
      // consumed twice (LM counts + per-doc scoring) — materialize once
      .localCheckpoint()
    val c = big.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val pc = c.groupBy("w1").agg(sum(col("cnt")).as("pcnt"))
    val lm = c.join(pc, "w1")
      .select(col("bigram"),
        floor(log(col("cnt").cast("double") / col("pcnt").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("q"))
    big.join(lm, "bigram")
      .groupBy("doc_id")
      .agg(sum(col("q")).as("qsum"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("qsum").cast("double") / lit(1000000.0)
          / col("n_bigrams").cast("double")).as("avg_logp"))
  }

  /** Overlapping token-window chunking (RAG / context-window packing
    * prep): windows of `chunk` tokens every `stride`, the last window
    * truncated at the document end. Pure per-row Generate + array
    * expressions — no shuffle, scan speed at any corpus size. Each chunk
    * carries an md5 digest of its joined tokens so chunk-level dedup /
    * provenance wiring composes downstream without re-tokenizing. */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   chunk: Int = 64, stride: Int = 32): DataFrame = {
    require(stride > 0 && chunk >= stride, "need 0 < stride <= chunk")
    docs
      .select(col(idCol).as("doc_id"), TextOps.tokenize(col(textCol)).as("w"))
      .withColumn("m", size(col("w")))
      .filter(col("m") > 0)
      // n_chunks = 1 + ceil((m - chunk) / stride) for m > chunk else 1
      .withColumn("n_chunks",
        expr(s"1 + CASE WHEN m <= $chunk THEN 0L " +
          s"ELSE (m - $chunk + ${stride - 1}) div $stride END"))
      .select(col("doc_id"), col("w"), col("m"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start", (col("chunk_id") * stride).cast("int"))
      .withColumn("n_tokens", least(lit(chunk), col("m") - col("start")))
      .select(col("doc_id"), col("chunk_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        md5(concat_ws(" ",
          slice(col("w"), col("start") + 1, col("n_tokens")))).as("digest"))
  }

  /** Frequent-set broadcast gate for [[boilerplateStrip]]: above this
    * many distinct frequent-line hashes (~100 MB of hex strings on the
    * driver at 1M), the driver-side collect is no longer safe and the
    * join fallback takes over. Unlike the IVF centroid collect
    * (numCells-bounded) this set's size is DATA-DEPENDENT — bounded
    * only by total_lines/minDocs, which a 100 TB web corpus can blow
    * past — so the gate is mandatory, not advisory. */
  val BoilerplateBroadcastGate: Int = 1 << 20

  private val HexDigits = "0123456789abcdef".toCharArray
  // MessageDigest is stateful and not thread-safe; one per task thread,
  // reused across rows (allocating per row was a measurable hot-path
  // cost at 100 TB line counts).
  private val Md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Lowercase-hex MD5 of the UTF-8 bytes — byte-identical to Spark
    * SQL's `md5()` so UDF-side probes match plan-side hashes. */
  private def md5Hex(s: String): String = {
    val md = Md5Local.get(); md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** C4-style line-level boilerplate removal: a line occurring in at
    * least `minDocs` DISTINCT documents (nav bars, cookie banners,
    * footers) is stripped from every document; cleaned text preserves
    * the surviving lines in order.
    *
    * Scale shape — the curate_corpus discipline, applied twice:
    *  1. The frequency pass shuffles (md5(line), doc_id) pairs only —
    *     raw line text NEVER crosses the wire.
    *  2. The frequent-hash set is shipped to executors as a TORRENT
    *     BROADCAST, not a plan literal (a typedlit would serialize a
    *     multi-million-element array into every task's plan), and the
    *     rebuild stays a pure map-side filter over a second scan — the
    *     corpus itself is never shuffled.
    *
    * The broadcast is SIZE-GATED (`maxBroadcastHashes`): the frequent
    * set grows with the corpus (total_lines/minDocs is not a
    * driver-safe bound at 100 TB), so when the bounded probe overflows
    * the gate, the strip falls back to a join formulation in which the
    * driver holds nothing: hash every (doc, pos, line) to metrics
    * width, inner-join the frequent relation to find REMOVED positions
    * (typically a tiny fraction of the corpus — boilerplate lines per
    * doc, not all lines), collect_list the removed positions per doc,
    * and rebuild each doc map-side with an indexed array filter over a
    * re-split of the original text. Only (doc_id, pos) pairs of
    * boilerplate occurrences ever shuffle; surviving text never leaves
    * its scan task in either path.
    */
  def boilerplateStrip(docs: DataFrame, idCol: String, textCol: String,
                       minDocs: Long,
                       maxBroadcastHashes: Int = BoilerplateBroadcastGate): DataFrame = {
    // gate+1 below must not overflow to a negative limit()
    require(maxBroadcastHashes >= 0 && maxBroadcastHashes < Int.MaxValue,
      s"maxBroadcastHashes out of range: $maxBroadcastHashes")
    val frequent = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("line"))
      .groupBy(md5(col("line")).as("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    // Bounded probe: fetch at most gate+1 rows in one job. If the set
    // fits, the probe IS the broadcast payload (no second agg run); if
    // it overflows, the join path re-evaluates the frequency agg — one
    // extra metrics-width pass, the price of a bounded driver.
    val probe = frequent.limit(maxBroadcastHashes + 1).collect()
    if (probe.length <= maxBroadcastHashes) {
      val bc = docs.sparkSession.sparkContext.broadcast(
        probe.map(_.getString(0)).toSet)
      // split with limit -1 mirrors Spark SQL split's
      // keep-trailing-empties semantics.
      val strip = udf { text: String =>
        if (text == null) null
        else {
          val hs = bc.value
          val parts = text.split("\n", -1)
          val kept = parts.filterNot(l => hs.contains(md5Hex(l)))
          (kept.mkString("\n"), (parts.length - kept.length).toLong)
        }
      }
      docs.select(col(idCol), strip(col(textCol)).as("s"))
        .select(col(idCol), col("s._1").as("clean_text"),
          col("s._2").as("n_removed"))
    } else {
      val hashed = docs
        .select(col(idCol).as("doc_id"),
          posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
        .select(col("doc_id"), col("pos"), md5(col("line")).as("h"))
      // `frequent` is distinct by construction (groupBy h), so the
      // inner join cannot duplicate a (doc_id, pos).
      val removed = hashed.join(frequent, "h")
        .groupBy("doc_id")
        .agg(collect_list(col("pos")).as("rp"), count(lit(1)).as("nr"))
      docs.join(removed, docs(idCol) === removed("doc_id"), "left")
        .select(docs(idCol),
          when(col(textCol).isNull, lit(null).cast("string"))
            .otherwise(array_join(
              filter(split(col(textCol), "\n"),
                (_, i) => !coalesce(array_contains(col("rp"), i), lit(false))),
              "\n")).as("clean_text"),
          when(col(textCol).isNull, lit(null).cast("long"))
            .otherwise(coalesce(col("nr"), lit(0L))).as("n_removed"))
    }
  }

  /** Per-document Shannon token entropy — the vocabulary-diversity
    * quality signal (near-zero entropy = repeated-token spam; quality
    * filters cut on it alongside [[qualityMetrics]]'s ratios).
    *
    * H = Σ (c/N)·ln(N/c) over the doc's token counts, computed on the
    * bigramLmScore fixed-point grid: each ln quantizes to an exact
    * integer via floor(x·1e6 + 0.5), the per-doc accumulation is an
    * INTEGER sum (order-independent where a double sum is not), and the
    * two final divisions are identical IEEE ops on both engines.
    *
    * Scale shape: one shuffle to (doc, word) counts (map-side partials),
    * then the doc-total window and the final agg share the doc_id
    * partitioning. Never shuffles raw text.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokenize(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
    c.withColumn("n", sum(col("c")).over(Window.partitionBy("doc_id")))
      .select(col("doc_id"), col("n"),
        (col("c") * floor(log(col("n").cast("double") / col("c").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long")).as("q"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_tokens"), sum(col("q")).as("qsum"))
      .select(col("doc_id"), col("n_tokens"),
        (col("qsum").cast("double") / lit(1000000.0)
          / col("n_tokens").cast("double")).as("entropy"))
  }

  /** Corpus-level PMI collocations: the `topK` adjacent word pairs that
    * co-occur far above chance —
    * PMI = ln(B/TB) − ln(U₁/T) − ln(U₂/T) for bigram count B over TB
    * total bigrams and unigram counts U over T total tokens. The phrase
    * detector every tokenizer-training pipeline runs (word2vec-style
    * phrase merging).
    *
    * Determinism: every count is exact; the three ln terms are computed
    * in the SAME op order on both engines and the result quantizes via
    * floor(x·1e6 + 0.5) BEFORE ranking, so ties break on the exact
    * integer grid + (w1, w2).
    *
    * Scale shape: bigram + unigram counts are two map-side-partial
    * aggregations; `minCount` bounds the candidate set BEFORE the
    * unigram attach (broadcast of the filtered candidates), and top-k
    * plans as TakeOrderedAndProject. The corpus shuffles only as
    * (hash-sized) count rows.
    */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Int = 5, topK: Int = 50): DataFrame = {
    // Generate barrier — same O(tokens²) inlining hazard as bigramLmScore
    val toks = docs.select(explode(array(TextOps.tokenize(col(textCol)))).as("w"))
      .filter(size(col("w")) >= 1)
    // Staging discipline: uni feeds THREE consumers (T total, both join
    // sides) and the bigram counts feed two (TB total, candidate set) —
    // unstaged, each consumer re-derived the tokenize scan (5 corpus
    // scans in the plan). Both staged relations are bounded: uni is
    // vocab-sized, bigAll is distinct-bigram-sized (already the shuffle
    // width of its own agg).
    val uni = toks.select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("u"))
      .localCheckpoint(false)
    val bigAll = toks.filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(col("w")(i).as("w1"), col("w")(i + 1).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val big = bigAll.filter(col("n") >= minCount)
    // exact totals: T = Σ unigram counts; TB = Σ per-doc (len-1), which
    // is EXACTLY the pre-filter bigram occurrence total — summing the
    // staged counts spares a third pass over the corpus
    val totals = uni.agg(sum(col("u")).as("t"))
    val tbDf = bigAll.agg(sum(col("n")).as("tb"))
    val u1 = uni.select(col("word").as("w1"), col("u").as("u1"))
    val u2 = uni.select(col("word").as("w2"), col("u").as("u2"))
    big.join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(tbDf))
      .select(col("w1"), col("w2"), col("n"),
        floor((log(col("n").cast("double") / col("tb").cast("double"))
          - log(col("u1").cast("double") / col("t").cast("double"))
          - log(col("u2").cast("double") / col("t").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("pmi_q"))
      .orderBy(desc("pmi_q"), asc("w1"), asc("w2"))
      .limit(topK)
  }
}
