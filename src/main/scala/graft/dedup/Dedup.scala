package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.ops.TextOps

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * n-gram Jaccard verification, and SimHash.
  *
  * Two hash families coexist deliberately:
  *  - `minhashSignatures(portable = true)` uses md5 over salted shingles —
  *    reproducible in ANY engine (the DuckDB oracle mirrors it exactly).
  *  - `portable = false` uses xxhash64 — ~10× cheaper, the 100 TB path
  *    (no hex-string materialization), same statistical behavior.
  *
  * Everything before the LSH self-join is a pure per-row projection
  * (no explode→groupBy shuffle for signatures): signatures fold over the
  * shingle ARRAY with `transform`/`array_min`, so a 1000-executor scan
  * computes them map-side in one pass. The only shuffles are the band-key
  * self-join (bounded: band keys are 2-minhash concatenations, so bucket
  * sizes stay small for non-near-dup corpora) and the final distinct.
  */
object Dedup {

  /** Broadcast gates for the DATA-DEPENDENT relations the verify
    * stages ship to executors. Unlike a dimension table, these grow
    * with the corpus — candidate-doc ids with |candidates| and the
    * shingle-array map with |candidates| × doc length — so at 100 TB
    * an ungated broadcast can overflow the driver. Above the gate the
    * same join runs as a shuffle join: identical pairs, bounded
    * memory (DedupSpec forces both paths). ~16M ids ≈ 128 MB
    * driver-side; ~4M shingle strings ≈ low hundreds of MB. */
  val BroadcastIdGate: Long = 1L << 24
  val BroadcastCellGate: Long = 4L << 20

  /** `df` hinted for broadcast only when a BOUNDED probe (limit
    * gate+1, one job — the boilerplateStrip pattern) shows at most
    * `maxRows` rows; past the gate the un-hinted frame shuffles.
    * Probe cost is one pass over an (already-materialized) candidate
    * relation, never the corpus. */
  private def broadcastIfUnder(df: DataFrame, maxRows: Long): DataFrame = {
    val n = df.limit(math.min(maxRows + 1, Int.MaxValue.toLong).toInt).count()
    if (n <= maxRows) broadcast(df) else df
  }

  /** Exact dedup: group by content hash; keeper = min doc id.
    * One hash-partitioned shuffle on a 32-hex key; at 100 TB prefer
    * xxhash64(text) as the group key (8 bytes vs 32) — md5 kept here for
    * oracle portability. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Distinct word n-gram shingles of the tokenized text, in document
    * order, 1-based to mirror SQL list indexing. Docs with fewer than n
    * tokens get an EMPTY array (Spark's sequence(1, k) is descending for
    * k<1 — must guard). */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      array_distinct(transform(sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(words, i + lit(k))): _*))))
      .otherwise(array().cast("array<string>"))

  /** One MinHash value: min over shingles of hash(perm ++ ":" ++ shingle).
    * Portable: md5 hex string (lexicographic min) via the fused custom
    * Expression (same result as array_min∘transform∘md5, one pass, no
    * per-shingle hex; see graft.functions.MinHashMd5). Fast: xxhash64. */
  private def minhashOne(sgl: Column, perm: Int, portable: Boolean): Column =
    if (portable) graft.functions.MinHashMd5.minhashMd5(sgl, perm)
    else array_min(transform(sgl, s => xxhash64(concat(lit(s"$perm:"), s))))

  /** doc_id + sig0..sig{p-1} columns — map-side only, no shuffle.
    *
    * Portable path: the fused MinHashSignatures expression (one pass over
    * the token array for ALL permutations; see its scaladoc). Fast path:
    * xxhash64 over materialized shingles.
    *
    * The explode(array(…)) wrapper is a deliberate one-row Generate
    * barrier: CollapseProject would otherwise inline the signature
    * expression into all `numPerms` extraction projections, and lambda/
    * fallback expressions are excluded from codegen subexpression
    * elimination — measured 8× recomputation without it. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numPerms: Int = 8, shingleSize: Int = 3,
                        portable: Boolean = true): DataFrame =
    if (portable) {
      val sigsExpr = graft.functions.MinHashSignatures.minhashSignatures(
        TextOps.tokenize(col(textCol)), numPerms, shingleSize)
      docs.select(col(idCol).as("doc_id"), explode(array(sigsExpr)).as("sigs"))
        .select(col("doc_id") +:
          (0 until numPerms).map(p => element_at(col("sigs"), p + 1).as(s"sig$p")): _*)
    } else {
      val sgl = shingles(TextOps.tokenize(col(textCol)), shingleSize)
      val sigs = (0 until numPerms).map(p => minhashOne(col("sgl"), p, portable).as(s"sig$p"))
      docs.select(col(idCol).as("doc_id"), explode(array(sgl)).as("sgl"))
        .select(col("doc_id") +: sigs: _*)
    }

  /** LSH banding: rows (doc_id, band_id, bkey) where bkey concatenates the
    * band's minhashes. A null minhash (no shingles) nulls the band key,
    * and null keys never match in the equi-join — shingle-less docs drop
    * out, matching SQL semantics. */
  def lshBands(sigs: DataFrame, numPerms: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val bandStructs = (0 until numBands).map { b =>
      // concat (not concat_ws): a null minhash means "no shingles" and must
      // null the whole band key so the join drops the doc.
      val key = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}").cast("string"))
        .reduce((a, c) => concat(a, lit("|"), c))
      struct(lit(b).as("band_id"), key.as("bkey"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.bkey").as("bkey"))
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket.
    *
    * NOT a self-join: a DataFrame self-join re-executes the whole
    * signature pipeline for each side (measured 2× the scan cost).
    * Instead: groupBy bucket → expand pairs inside each bucket with an
    * array expression. One scan, one shuffle; the quadratic is local to
    * a bucket (bounded for non-degenerate corpora — and a degenerate
    * bucket would break the self-join formulation just as hard). */
  def lshCandidatePairs(sigs: DataFrame, numPerms: Int = 8, rowsPerBand: Int = 2,
                        maxBucket: Int = 1000): DataFrame =
    bucketPairs(lshBands(sigs, numPerms, rowsPerBand), Seq("band_id", "bkey"), maxBucket)

  /** All intra-bucket id pairs (a < b), distinct across buckets — with a
    * bucket-size cap so a degenerate bucket cannot go quadratic.
    *
    * A boilerplate-heavy real corpus (thousands of near-identical docs
    * sharing one band bucket) would otherwise expand m·(m−1)/2 pairs in a
    * single task (VERDICT r1 task 5). Ids beyond `maxBucket` (after the
    * deterministic ascending sort) skip the quadratic expansion and
    * instead pair ONLY with the bucket's minimum id — a linear "star"
    * that keeps every overflow doc connected to the bucket's keeper, so
    * connected-components dedup still collapses the whole bucket. Output
    * is O(maxBucket² + m) per bucket instead of O(m²). For buckets at or
    * under the cap the result is identical to the uncapped expansion
    * (which is why the small-corpus oracles are unaffected). Overflowing
    * buckets are observable via [[bucketOverflow]]. */
  private[graft] def bucketPairs(banded: DataFrame, bucketCols: Seq[String],
                                 maxBucket: Int = 1000): DataFrame =
    banded
      .groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        s"""concat(
             flatten(transform(slice(ids, 1, $maxBucket), (a, i) ->
               transform(slice(ids, i + 2, $maxBucket - i - 1), b ->
                 named_struct('doc_a', a, 'doc_b', b)))),
             transform(slice(ids, $maxBucket + 1, size(ids)), b ->
               named_struct('doc_a', element_at(ids, 1), 'doc_b', b)))""")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()

  /** Observability side-channel for the [[bucketPairs]] cap: the buckets
    * whose id count exceeds `maxBucket`, with their sizes — run it on the
    * same banded relation to quantify what the cap truncated. */
  def bucketOverflow(banded: DataFrame, bucketCols: Seq[String],
                     maxBucket: Int = 1000): DataFrame =
    banded.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** INCREMENTAL dedup — the continuous-ingest shape: candidate pairs for
    * a NEW batch against an already-deduped corpus without re-mining the
    * corpus. The corpus contributes only its banded signature INDEX
    * (doc_id, band_id, bkey) — the small relation a production pipeline
    * persists between ingests (at 100 TB: a bucketed table on bkey via
    * [[graft.sources.Warehouse]], so this join is shuffle-free on the
    * corpus side and the per-ingest cost scales with the BATCH, not the
    * corpus).
    *
    * Emits intra-batch pairs (capped bucket expansion, as [[bucketPairs]])
    * plus batch×corpus pairs (band-key equi-join). With identical
    * signature parameters the union equals the full-corpus pair mining
    * restricted to pairs touching the batch — which is what the oracle
    * checks. */
  def incrementalPairs(newSigs: DataFrame, corpusBands: DataFrame,
                       numPerms: Int = 8, rowsPerBand: Int = 2,
                       maxBucket: Int = 1000): DataFrame = {
    val newBands = lshBands(newSigs, numPerms, rowsPerBand).localCheckpoint()
    val intra = bucketPairs(newBands, Seq("band_id", "bkey"), maxBucket)
    val cross = newBands
      .join(corpusBands.withColumnRenamed("doc_id", "corpus_id"),
        Seq("band_id", "bkey"))
      .filter(col("doc_id") =!= col("corpus_id"))
      .select(least(col("doc_id"), col("corpus_id")).as("doc_a"),
        greatest(col("doc_id"), col("corpus_id")).as("doc_b"))
    intra.unionByName(cross).distinct()
  }

  /** Exact n-gram Jaccard on LSH candidates: re-attach each side's distinct
    * shingle array and compare with array_intersect — per-pair, map-side
    * after the two (small) joins; integers → the division is reproducible
    * bit-exactly across engines.
    *
    * Execution staging (measured 8.4 s → ~2 s warm at sf0.1):
    *  - the candidate relation is MATERIALIZED eagerly (localCheckpoint):
    *    it feeds three downstream uses (two shingle re-attach joins and
    *    the doc-id prune), each of which would otherwise re-execute the
    *    whole signature+banding pipeline — the standard "stage the
    *    candidate set" step of a production dedup pipeline;
    *  - shingles are computed ONLY for candidate docs (broadcast
    *    semi-join prune before the shingle projection), not the whole
    *    corpus — exact verification cost scales with |candidates|, and
    *    the corpus is never shuffled. */
  /** Shared staging for shingle-verified pair mining: LSH candidates
    * (materialized once) joined to each side's shingle set. The corpus
    * meets only the semi-join prune; the expensive shingle projection
    * runs on candidate docs alone. */
  private def candidateShingles(docs: DataFrame, idCol: String, textCol: String,
                                numPerms: Int, shingleSize: Int,
                                materializeCandidates: Boolean): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numPerms, shingleSize)
    val cands0 = lshCandidatePairs(sigs, numPerms)
    val cands = if (materializeCandidates) cands0.localCheckpoint() else cands0
    // materialized: the broadcast-gate probe and the semi join both
    // read the cached id set instead of re-running the distinct
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
      .localCheckpoint()
    // r16: SORTED DISTINCT shingle HASHES instead of shingle strings
    // (HashedShingles scaladoc — identity is all the verify needs):
    // the re-attach joins ship 8-byte cells instead of ~30-byte
    // strings and the per-pair intersection becomes the sorted merge.
    // The fused kernel consumes the token array once, so the old
    // explode(array(tokenize)) Generate barrier (HOF-lambda re-split
    // protection) has nothing left to protect.
    val sgl = docs
      .join(broadcastIfUnder(candDocs, BroadcastIdGate),
        docs(idCol) === candDocs("doc_id"), "left_semi")
      .select(col(idCol).as("doc_id"),
        graft.functions.HashedShingles.of(
          TextOps.tokenize(col(textCol)), shingleSize).as("sgl"))
    val a = sgl.select(col("doc_id").as("doc_a"), col("sgl").as("sgl_a"))
    val b = sgl.select(col("doc_id").as("doc_b"), col("sgl").as("sgl_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
  }

  /** `|A ∩ B|` of two sorted distinct hash arrays — the codegen'd merge
    * (Triangles' verify kernel), shared by every shingle verify below. */
  private def sortedInter(a: Column, b: Column): Column =
    ColumnShim.column(graft.functions.SortedIntersectCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, numPerms: Int = 8,
                        shingleSize: Int = 3,
                        materializeCandidates: Boolean = true): DataFrame =
    candidateShingles(docs, idCol, textCol, numPerms, shingleSize, materializeCandidates)
      .withColumn("inter", sortedInter(col("sgl_a"), col("sgl_b")))
      .withColumn("uni",
        size(col("sgl_a")).cast("long") + size(col("sgl_b")).cast("long") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .filter(col("inter").cast("double") / col("uni") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** CONTAINMENT-scored near-dup pairs over the same LSH candidates:
    * |A∩B| / min(|A|, |B|) — the asymmetric-length fix for Jaccard,
    * which under-scores a short doc quoted whole inside a long one
    * (|∩|/|∪| shrinks with the big doc's size; containment doesn't).
    * Same staging, same scale shape as [[ngramJaccardPairs]]; only the
    * verify arithmetic differs. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, numPerms: Int = 8,
                       shingleSize: Int = 3,
                       materializeCandidates: Boolean = true): DataFrame =
    candidateShingles(docs, idCol, textCol, numPerms, shingleSize, materializeCandidates)
      .withColumn("inter", sortedInter(col("sgl_a"), col("sgl_b")))
      .withColumn("mn", least(size(col("sgl_a")), size(col("sgl_b"))).cast("long"))
      .withColumn("containment", round(col("inter").cast("double") / col("mn"), 6))
      .filter(col("inter").cast("double") / col("mn") >= threshold)
      .select("doc_a", "doc_b", "containment")

  /** Edit-distance verification on LSH candidates: re-attach each side's
    * raw text and keep pairs whose Levenshtein distance is at most
    * `maxDistPermille`/1000 of the LONGER text — a character-level
    * near-dup check that catches small in-place edits n-gram Jaccard
    * over-penalizes (a shifted word disturbs 3 shingles but only 1 edit).
    *
    * Scale shape: Levenshtein is O(len_a·len_b) PER PAIR, so it must
    * never see the corpus — it runs only on the LSH candidate pairs
    * (same staging as [[ngramJaccardPairs]]: materialized candidates,
    * broadcast semi-join prune before the text re-attach, so the corpus
    * is never shuffled and the quadratic cost scales with |candidates|).
    * The relative threshold is integer math (d·1000 ≤ permille·len):
    * bit-reproducible, no doubles. */
  def editVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDistPermille: Int = 300, numPerms: Int = 8,
                        shingleSize: Int = 3): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numPerms, shingleSize)
    val cands = lshCandidatePairs(sigs, numPerms).localCheckpoint()
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
      .localCheckpoint() // gate probe + semi join share one evaluation
    val txt = docs
      .join(broadcastIfUnder(candDocs, BroadcastIdGate),
        docs(idCol) === candDocs("doc_id"), "left_semi")
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
    val a = txt.select(col("doc_id").as("doc_a"), col("t").as("t_a"))
    val b = txt.select(col("doc_id").as("doc_b"), col("t").as("t_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("edit_dist", levenshtein(col("t_a"), col("t_b")).cast("long"))
      .filter(col("edit_dist") * 1000 <=
        lit(maxDistPermille) * greatest(length(col("t_a")), length(col("t_b"))).cast("long"))
      .select("doc_a", "doc_b", "edit_dist")
  }

  /** 64-bit SimHash per document, occurrence-weighted xxhash64 over words.
    * Two shuffles: (doc, word) term frequencies, then per-doc bit sums —
    * both partial-aggregated map-side by Catalyst. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokenize(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("word")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i")
    }
    val sums = occ.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Portable SimHash: per-word bits from the md5 HEX of the word — bit
    * `4j+k` of the signature is bit `k` of hex digit `j+1` — so any
    * engine with md5 reproduces it digit for digit (the DuckDB oracle
    * does exactly that). 60 bits (15 hex digits) keeps the signature
    * strictly positive in a signed 64-bit integer in every engine.
    *
    * Computed by the fused [[graft.functions.SimHashPortable]]
    * expression: a per-document map-side projection — no token explode,
    * no shuffles (the composed relational form below shuffles twice).
    * Byte-equality of the two forms is spec-asserted. */
  def simhashPortable(docs: DataFrame, idCol: String, textCol: String,
                      nBits: Int = 60): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.SimHashPortable.simhash(
          TextOps.tokenize(col(textCol)), nBits).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The composed relational formulation of [[simhashPortable]] (explode
    * → count per word → 60 conditional sums): kept as the independent
    * cross-check the equivalence spec runs against the fused expression,
    * and as the shape the DuckDB oracle mirrors. */
  private[graft] def simhashPortableComposed(docs: DataFrame, idCol: String, textCol: String,
                                             nBits: Int = 60): DataFrame = {
    val occ = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokenize(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("word")))
    val bitSums = (0 until nBits).map { i =>
      val digit = conv(substring(col("h"), i / 4 + 1, 1), 16, 10).cast("int")
      sum(when(shiftright(digit, i % 4).bitwiseAND(lit(1)) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i")
    }
    val sums = occ.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until nBits)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** 4-band banding of a simhash signature relation: one row per
    * (doc_id, band_id, bkey) where bkey is the `bandBits`-wide slice of
    * the signature. Shared by [[simhashPairs]] (candidate mining) and the
    * bucket-health observability key (`dedup_bucket_overflow`). */
  def simhashBands(sigs: DataFrame, bandBits: Int = 16): DataFrame = {
    val mask = (1L << bandBits) - 1
    sigs.select(col("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bkey"))): _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.bkey").as("bkey"))
  }

  /** Near-dup pairs by SimHash: 4-band bucketing over `bandBits`-wide
    * slices (any equal band → candidate; catches all pairs with Hamming
    * distance ≤ 3 by pigeonhole when ≤ 3 of 4 bands differ), verified
    * with bit_count(xor) ≤ maxHamming after re-attaching the signatures.
    * bandBits = 16 covers the 64-bit [[simhash]]; 15 covers the 60-bit
    * [[simhashPortable]]. */
  def simhashPairs(sigs0: DataFrame, maxHamming: Int,
                   maxBucket: Int = 1000, bandBits: Int = 16): DataFrame = {
    // The signature relation feeds THREE consumers (banding + both
    // re-attach sides) and Spark re-executes a shared lazy subplan per
    // consumer — materialize the tiny (doc_id, simhash) relation once
    // (same staging pattern as ngramVerify's candidate set).
    val sigs = sigs0.localCheckpoint()
    val pairs = bucketPairs(simhashBands(sigs, bandBits), Seq("band_id", "bkey"), maxBucket)
    val a = sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** PASSAGE-level dedup (C4-style): find repeated fixed-width token
    * chunks ACROSS documents — boilerplate paragraphs, license headers,
    * navigation text — and emit every non-keeper occurrence for removal.
    * Chunks are disjoint `chunkTokens`-wide windows (stride = width);
    * only full-width chunks participate (short tails would match
    * trivially). Keeper = first occurrence in (doc_id, chunk_idx) order.
    *
    * Scale shape (the curate_corpus discipline — raw text never
    * shuffles): chunking is map-side fan-out ×(n/width); the ONE
    * corpus-sized shuffle carries only (xxhash64, doc_id, chunk_idx)
    * — ~24 B/row instead of the 20-token string; the repeated-hash
    * keeper relation (distinct boilerplate passages — small by nature)
    * broadcasts back against a map-side re-derivation of the chunks, so
    * the passage text appears only in the final (dupe-only) output.
    * Chunks are derived twice, but both passes are scan-speed map work —
    * at 100 TB recomputing beats materializing corpus-sized chunk text.
    * Hash-collision risk (a non-dupe tagged dupe) is 2⁻⁶⁴-scale and
    * accepted, as everywhere else xxhash64 keys a dedup decision.
    */
  def passageDupes(docs: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int = 20): DataFrame = {
    def chunks: DataFrame = docs
      // Generate barrier: materialize the token array once (HOF slice
      // lambdas would otherwise re-split per chunk — the shingle lesson)
      .select(col(idCol).as("doc_id"),
        explode(array(TextOps.tokenize(col(textCol)))).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0),
          greatest(ceil(size(col("w")) / lit(chunkTokens)).cast("int"), lit(1)) - 1)))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        slice(col("w"), col("pos") * chunkTokens + 1, lit(chunkTokens)).as("chunk"))
      .filter(size(col("chunk")) === chunkTokens)
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", col("chunk")).as("passage"))
    val keepers = chunks
      .select(col("doc_id"), col("chunk_idx"), xxhash64(col("passage")).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("keep"))
      .filter(col("n") > 1)
      .select(col("h"), col("keep.doc_id").as("__kdoc"),
        col("keep.chunk_idx").as("__kidx"))
      // materialized once: the gate probe + the join both consume it
      // without re-running the passage-frequency aggregation
      .localCheckpoint()
    chunks.join(broadcastIfUnder(keepers, BroadcastIdGate),
        xxhash64(col("passage")) === keepers("h"))
      .filter(!(col("doc_id") === col("__kdoc") && col("chunk_idx") === col("__kidx")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("passage"))
  }

  /** PPJoin-style prefix-filtered set-similarity join: ALL pairs with
    * n-gram Jaccard ≥ `threshold` — EXACT (no false negatives), unlike
    * the MinHash-LSH staging of [[ngramJaccardPairs]], which is only as
    * complete as its banding recall.
    *
    * The prefix-filter theorem (Chaudhuri et al. 2006 / Xiao et al.
    * PPJoin 2008): order every doc's shingles by ONE global canonical
    * order — rarest first, here (document-frequency asc, shingle-hash
    * asc; any fixed total order satisfies the theorem) —
    * and keep only each doc's first |d| − ⌈t·|d|⌉ + 1 shingles. Any pair
    * with J ≥ t needs overlap ≥ ⌈t·max(|a|,|b|)⌉, and two sets whose
    * overlap exceeds what they can cover outside their prefixes must
    * share a PREFIX shingle — so candidates = docs sharing ≥1 prefix
    * shingle, everything else is provably below threshold. Rare-first
    * ordering makes those shared-prefix buckets the SMALLEST possible
    * ones: the frequent shingles that create mega-buckets in a plain
    * inverted-index join sort to the suffix and never generate pairs.
    *
    * Scale shape: one word-count shuffle for df, one (doc,shingle)⋈df
    * shuffle to rank, capped bucket expansion on prefix shingles
    * ([[bucketPairs]]), then the usual broadcast-semi-join-pruned exact
    * verify. The corpus text is never shuffled; the quadratic step is
    * bounded per prefix-bucket.
    */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleSize: Int = 3,
                        maxBucket: Int = 1000,
                        idBroadcastGate: Long = BroadcastIdGate,
                        cellBroadcastGate: Long = BroadcastCellGate): DataFrame = {
    // Shingling the WHOLE corpus is the CPU-heavy step and inherits
    // the SCAN's partitioning — a sub-128MB compressed input is one
    // partition, so it ran in ONE task (measured 19.6 s of the key's
    // 24 s at sf0.1). Repartitioning the raw text first is a trivially
    // small shuffle that fans the compute across the session's
    // parallelism; no-op when the scan already splits (the 100 TB case).
    val conf = docs.sparkSession.sessionState.conf
    val src =
      if (docs.rdd.getNumPartitions < conf.numShufflePartitions)
        docs.repartition(conf.numShufflePartitions)
      else docs
    // r16: SORTED DISTINCT shingle HASHES end to end (HashedShingles
    // scaladoc): the df shuffle, prefix ranking and bucket keys carry
    // 8-byte longs instead of ~30-byte strings, and the verify is the
    // allocation-free sorted merge. The prefix-filter theorem needs
    // ONE global canonical order — (document-frequency asc, hash asc)
    // is as valid as (df asc, text asc); the exactness guarantee
    // comes from the verify, which is unchanged in structure. The
    // fused kernel consumes the token array once, so the old
    // explode(array(tokenize)) Generate barrier is gone with the HOF
    // lambdas it protected against.
    val sh = src
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.HashedShingles.of(
          graft.ops.TextOps.tokenize(col(textCol)), shingleSize).as("sgl"))
      .filter(size(col("sgl")) > 0)
      .localCheckpoint() // consumed 3×: df count, prefix ranking, verify
    val df = sh.select(explode(col("sgl")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
    val prefixes = sh.select(col("doc_id"), explode(col("sgl")).as("s"))
      .join(df, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("rs"))
      .select(col("doc_id"), explode(expr(
        s"""transform(
              slice(rs, 1, CAST(size(rs) - ceil($threshold * size(rs)) + 1 AS INT)),
              x -> x.s)""")).as("s"))
    val cands = bucketPairs(prefixes, Seq("s"), maxBucket).localCheckpoint()
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
      .localCheckpoint() // gate probe + semi join share one evaluation
    // LAZY: each verify-join side rebuilds the semi join from the
    // cached `sh` blocks (a map-side broadcast semi join) — cheaper
    // than materializing the multi-KB array payload through the block
    // store a third time; the cell probe below reads only size(sgl),
    // column-pruned off the same cache
    val pruned = sh.join(broadcastIfUnder(candDocs, idBroadcastGate),
      Seq("doc_id"), "left_semi")
    // BROADCAST the array side of both verify joins: the candidate-pair
    // relation can be orders of magnitude larger than the doc set (409k
    // pairs vs 5k docs at sf0.1), and a shuffle join would move every
    // pair WITH two multi-KB shingle arrays attached (measured ~29 s of
    // the key's 33 s). Broadcasting the bounded doc-array map keeps the
    // pairs map-side; the arrays exist once per executor, not per pair.
    // GATED on the probed total shingle-cell count (the array payload
    // grows with |candidates| × doc length — a low threshold on a big
    // corpus can overflow the driver); past the gate the same joins
    // shuffle: identical pairs, bounded memory. The probe is one
    // column-pruned agg over checkpointed `sh` semi-joined to the
    // materialized candidate set, not a corpus pass.
    // explode(array(…)) Generate barrier around the intersection (the
    // minhashSignatures trick), kept defensively: CollapseProject would
    // otherwise inline the merge into uni + jaccard + the filter (the
    // string form measured 24 s -> 4 s on the 409k-pair sf0.1 verify;
    // the sorted merge is ~10× cheaper per pair but still O(|A|+|B|))
    val cells = pruned.agg(coalesce(sum(size(col("sgl"))), lit(0L)))
      .head().getLong(0)
    def side(asId: String, asArr: String) = {
      val p = pruned.select(col("doc_id").as(asId), col("sgl").as(asArr))
      if (cells <= cellBroadcastGate) broadcast(p) else p
    }
    cands
      .join(side("doc_a", "sgl_a"), "doc_a")
      .join(side("doc_b", "sgl_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(col("sgl_a")).cast("long").as("sa"),
        size(col("sgl_b")).cast("long").as("sb"),
        explode(array(sortedInter(col("sgl_a"), col("sgl_b")))).as("inter"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .filter(col("inter").cast("double") / col("uni") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** EXACT-substring dedup: pairs of documents sharing a common
    * substring of ≥ `minLen` chars — the "long exact match" contract of
    * suffix-array training-data dedup, banded so the corpus is never
    * suffix-arrayed in one task:
    *
    *  1. WINNOWING anchor selection (Schleimer et al., SIGMOD'03),
    *     map-side per document: md5-hash every `gramLen`-char gram
    *     (hex min order is engine-portable), slide a window of
    *     w = minLen - gramLen + 1 grams, select each window's leftmost
    *     minimal gram. The winnowing guarantee: any shared substring of
    *     length ≥ gramLen + w - 1 = minLen contains a full gram window
    *     with identical hashes in both documents, whose selection picks
    *     the SAME gram content at the same relative offset in both.
    *  2. Candidates: self-join anchors on the gram TEXT (not the hash —
    *     no collision false positives). Anchor density is ~1/w of
    *     grams, content-defined so alignment-free; a corpus with
    *     degenerate boilerplate grams routes through the documented
    *     [[bucketPairs]] cap if needed.
    *  3. EXTEND-VERIFY: re-attach both texts, extend each anchor match
    *     left/right ([[graft.functions.ExtendMatchLen]], codegen'd),
    *     keep pairs with any extension ≥ minLen. Sound (measures real
    *     chars) + complete (step 1) ⇒ exact ≥minLen semantics — which
    *     is precisely what the all-grams oracle checks.
    *
    * Scale: anchors are O(bytes/w) rows; the only shuffles are the
    * anchor self-join and the pair distincts; verification is
    * candidate-bounded; no driver state. */
  def substringPairs(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int = 40, gramLen: Int = 32,
                     fanout: Int = 0): DataFrame = {
    require(gramLen >= 1 && minLen >= gramLen,
      s"need 1 <= gramLen <= minLen, got gramLen=$gramLen minLen=$minLen")
    val w = minLen - gramLen + 1
    // fanout > 0 spreads the map-side anchor computation across that
    // many partitions — needed when the input collapses to few splits
    // (one small parquet file); at scan scale the file splits already
    // fan out and callers leave it 0.
    val spread = if (fanout > 0) docs.repartition(fanout) else docs
    val base = spread.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .filter(length(col(textCol)) >= minLen)
    val anchors = base
      .select(col("doc_id"), col("text"), explode(ColumnShim.column(
        graft.functions.WinnowAnchorPositions(
          ColumnShim.expression(col("text")), gramLen, w))).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, CAST(pos AS INT), $gramLen)").as("gram"))
    val cand = anchors
      .select(col("doc_id").as("da"), col("pos").as("pa"), col("gram"))
      .join(anchors.select(col("doc_id").as("db"), col("pos").as("pb"),
        col("gram")), "gram")
      .filter(col("da") < col("db"))
      .select("da", "db", "pa", "pb").distinct()
    val ext = ColumnShim.column(graft.functions.ExtendMatchLen(
      ColumnShim.expression(col("ta")), ColumnShim.expression(col("tb")),
      ColumnShim.expression(col("pa")), ColumnShim.expression(col("pb")),
      gramLen))
    cand
      .join(base.select(col("doc_id").as("da"), col("text").as("ta")), "da")
      .join(base.select(col("doc_id").as("db"), col("text").as("tb")), "db")
      .filter(ext >= minLen)
      .select(col("da"), col("db")).distinct()
  }
}
