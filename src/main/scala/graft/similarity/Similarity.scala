package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`ArrayType(FloatType)`).
  *
  * All vector math is composed from codegen'd array expressions
  * (`zip_with` + `aggregate` = sequential left fold), in DOUBLE: the fold
  * order is deterministic and matches a SQL `list_reduce` left fold
  * bit-for-bit, which is what lets the DuckDB oracle hash-check cosine
  * results exactly (after a defensive round(6)).
  *
  * Scale design:
  *  - `bruteForceTopK` is O(|Q|·|N|) — correct baseline; viable when |Q|
  *    is small (the query side is broadcast, so the big side streams
  *    map-side with NO shuffle of the corpus).
  *  - `annTopK` buckets vectors by random-hyperplane LSH signs; the join
  *    is then bucket-equi (shuffle on a small int key) and each bucket is
  *    tiny — the 100 TB path. Recall tunes with `numPlanes` (fewer planes
  *    → bigger buckets → higher recall, more compute).
  */
object Similarity {

  /** Cast a float vector to double exactly (fp widening is lossless). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold dot product — bit-reproducible. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Int8 max-abs quantization of an embedding column — the 4× storage /
    * shuffle-bandwidth saver for 100 TB embedding stores (float32 → int8
    * codes + one float scale per vector; cosine ranking degrades ~1%).
    * Pure per-row projection: no shuffle, runs at scan speed.
    *
    * Determinism: codes are `floor(x/scale·127 + 0.5)` — floor-based
    * half-up, identical in ANY engine computing the same IEEE doubles
    * (engine `round()` half-even/half-up differences never enter). A
    * zero vector keeps scale 0 and all-zero codes. */
  def quantizeInt8(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      // Generate barrier: without it CollapseProject inlines the scale
      // aggregate into the code lambda and the max-abs fold recomputes
      // PER ELEMENT — O(d²) per vector at real embedding widths (the
      // shingle-lambda lesson, see TextAnalysis.decontaminate)
      .select(col("vec_id"), col("v"),
        explode(array(aggregate(col("v"), lit(0.0),
          (m, x) => greatest(m, abs(x))))).as("scale"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        when(col("scale") === 0, transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => floor(x / col("scale") * 127 + 0.5).cast("int"))).as("codes"))

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, sim, rn), rn = 1..k. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("nq"), col("nv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("sim"), col("rn"))
  }

  /** MMR (maximal marginal relevance) diversity re-rank — the
    * redundancy-aware complement to plain top-k: greedily pick the
    * candidate maximizing `lam·rel − (1−lam)·max_sim_to_selected`, so
    * near-duplicate hits don't crowd the result list (RAG context
    * assembly, diverse negative mining).
    *
    * Execution: candidates come from [[bruteForceTopK]] (bounded candK
    * per query), pairwise candidate sims are one tiny self-join
    * (candK² per query), and the inherently-sequential greedy loop is
    * UNROLLED into k−1 relational steps (anti-join remaining, max-sim
    * aggregate against the selected set, per-query argmax window) —
    * all operating on candidate-bounded relations, never the corpus.
    * At 100 TB only the candidate generation touches the corpus; the
    * re-rank works on |Q|·candK rows regardless of corpus size.
    *
    * Determinism: rel and pair sims are 1e-6-rounded; `lam = 0.5`
    * halves are IEEE-exact, so every engine computes identical mmr
    * doubles — ranking can't diverge; ties break on candidate id. The
    * emitted score rounds at 7 dp (the 5e-7 grid of half-sums has no
    * 1e-7 halfway points, so engine rounding modes can't split).
    * Rank 1 is pure argmax relevance; its score is its relevance. */
  def mmrRerank(embeddings: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, candK: Int, k: Int,
                lam: Double = 0.5): DataFrame = {
    val cands = bruteForceTopK(embeddings, idCol, vecCol, queryPred, candK)
      .select(col("query_id"), col("neighbor_id").as("cid"), col("sim").as("rel"))
      .localCheckpoint() // consumed by every unrolled step
    val e = embeddings.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val ca = cands.select("query_id", "cid").join(e, "cid")
      .select(col("query_id"), col("cid").as("ca"),
        col("v").as("va"), col("nv").as("na"))
    val cb = ca.select(col("query_id"), col("ca").as("cb"),
      col("va").as("vb"), col("na").as("nb"))
    val pairSims = ca.join(cb, "query_id")
      .filter(col("ca") =!= col("cb"))
      .select(col("query_id"), col("ca"), col("cb"),
        round(cosine(col("va"), col("vb"), col("na"), col("nb")), 6).as("ps"))
      .localCheckpoint()
    val wSel = Window.partitionBy("query_id")
    var selected = cands
      .withColumn("rn", row_number().over(wSel.orderBy(desc("rel"), asc("cid"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("cid"), col("rel"),
        lit(1L).as("rank"), col("rel").as("mmr_score"))
      .localCheckpoint()
    for (i <- 2 to k) {
      val remaining = cands.join(selected.select("query_id", "cid"),
        Seq("query_id", "cid"), "left_anti")
      val maxSim = pairSims
        .join(selected.select(col("query_id"), col("cid").as("cb")),
          Seq("query_id", "cb"))
        .groupBy(col("query_id"), col("ca").as("cid"))
        .agg(max(col("ps")).as("max_sim"))
      val next = remaining.join(maxSim, Seq("query_id", "cid"))
        .withColumn("mmr",
          lit(lam) * col("rel") - lit(1.0 - lam) * col("max_sim"))
        .withColumn("rn", row_number().over(wSel.orderBy(desc("mmr"), asc("cid"))))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cid"), col("rel"),
          lit(i.toLong).as("rank"), round(col("mmr"), 7).as("mmr_score"))
      selected = selected.unionByName(next).localCheckpoint()
    }
    selected.select(col("query_id"), col("cid").as("neighbor_id"),
      col("rank"), col("rel"), col("mmr_score"))
  }

  /** Deterministic random hyperplanes: numPlanes × dim gaussians from a
    * seeded java.util.Random (spec-fixed sequence — reproducible across
    * JVMs and sessions). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** One sign-LSH band key: bits = sign(dot(plane_p, v)) for the band's
    * planes. Pure projection — computed map-side during the scan.
    * The plane matrix is ONE array literal iterated with a codegen loop
    * (aggregate over plane indices) instead of per-plane unrolled dot
    * products — unrolling 32 64-double literals bloats the generated
    * method past JIT-friendly sizes. */
  private def bandKey(v: Column, planes: Seq[Array[Double]]): Column = {
    val matrix = typedlit(planes.map(_.toSeq))
    aggregate(
      sequence(lit(0), lit(planes.size - 1)),
      lit(0L),
      (acc, p) => acc.bitwiseOR(
        when(dot(element_at(matrix, p + 1), v) > 0,
          call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))))
  }

  /** Banded sign-LSH ANN top-k (OR of ANDs, like MinHash banding):
    * candidate iff ANY of `numBands` bands of `planesPerBand` sign bits
    * matches. Per-neighbor recall ≈ 1-(1-p^r)^B with p = 1-θ/π — banding
    * is what makes moderate-similarity neighbors reachable; a single
    * conjunctive bucket only works for near-duplicate vectors.
    * The join shuffles on (band_id, key) — no cross join of the corpus.
    *
    * Multi-probe (`probeBits` > 0): each QUERY band additionally probes
    * every bucket whose key differs in at most one of `probeBits`
    * single-bit flips — the classic trade of extra probes for recall
    * without more bands. Only the (broadcast, tiny) query side fans out
    * by 1+probeBits; the corpus still emits exactly one bucket per band,
    * so the scan-side cost and the shuffle key stay unchanged. A flipped
    * sign bit is the most likely LSH error for a true neighbor (the
    * plane whose margin was smallest), so distance-1 probes capture most
    * missed candidates: measured recall 0.74 → ≥0.9 at default shape. */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, numBands: Int = 8,
              planesPerBand: Int = 4, dim: Int = 64,
              probeBits: Int = 4): DataFrame = {
    val planes = hyperplanes(numBands * planesPerBand, dim)
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val banded = e.select(col("vec_id"), col("v"), col("nv"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band_id"),
          bandKey(col("v"), (0 until planesPerBand)
            .map(r => planes(b * planesPerBand + r))).as("bkey"))): _*)).as("band"))
      .select(col("vec_id"), col("v"), col("nv"),
        col("band.band_id").as("band_id"), col("band.bkey").as("bkey"))
    val exactQ = banded.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"),
        col("band_id").as("qband"), col("bkey").as("qbkey"))
    val q =
      if (probeBits <= 0) exactQ
      else exactQ.select(col("query_id"), col("qv"), col("nq"), col("qband"),
        explode(array(col("qbkey") +:
          (0 until math.min(probeBits, planesPerBand)).map(p =>
            col("qbkey").bitwiseXOR(lit(1L << p))): _*)).as("qbkey"))
    val pairs = banded.join(broadcast(q),
        col("band_id") === col("qband") && col("bkey") === col("qbkey") &&
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("nq"), col("nv")).as("cos"))
      .distinct() // multi-band collisions
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("sim"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member of
    * the dedup family (exact / MinHash / SimHash / n-gram / THIS).
    *
    * Candidates come from AXIS-SIGN LSH banding: band b's key packs the
    * sign bits of dims [b·bitsPerBand, (b+1)·bitsPerBand). Axis signs are
    * a legitimate random-hyperplane family (the basis vectors are the
    * hyperplanes) and — unlike the seeded gaussian planes of [[annTopK]],
    * the tunable-recall path — are exactly reproducible in ANY engine, so
    * the DuckDB oracle mirrors the banding bit for bit. Near-dup vectors
    * agree on almost every sign, so any-band collision recall is ≈1 at
    * near-dup thresholds. Candidates expand through the capped bucket
    * walk (quadratic bounded at maxBucket², overflow starred to the
    * bucket keeper — `Dedup.bucketPairs`), then exact sequential-fold
    * cosine ≥ threshold verifies each pair. Shuffles: one on the band
    * key, two id-equi joins to re-attach vectors. No cross join. */
  def embeddingNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, numBands: Int = 4,
                            bitsPerBand: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val e = embeddings.select(col(idCol).as("doc_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val banded = e.select(col("doc_id"),
      explode(array((0 until numBands).map { b =>
        val key = (0 until bitsPerBand).map(k =>
          when(element_at(col("v"), b * bitsPerBand + k + 1) > 0, lit(1L << k))
            .otherwise(lit(0L)))
          .reduce(_ bitwiseOR _)
        struct(lit(b).as("band_id"), key.as("bkey"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.bkey").as("bkey"))
    val pairs = graft.dedup.Dedup.bucketPairs(banded, Seq("band_id", "bkey"), maxBucket)
    val a = e.select(col("doc_id").as("doc_a"), col("v").as("va"), col("nv").as("na"))
    val b = e.select(col("doc_id").as("doc_b"), col("v").as("vb"), col("nv").as("nb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("cos", cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("cos"))
  }

  /** IVF coarse quantizer: deterministic hash-spread seeds refined with
    * `iters` Lloyd steps. Centroid update is the classic posexplode →
    * (cell, dim) mean → re-collect; two shuffles per iteration, both tiny
    * (numCells × dim rows). Returns (cell, cv) with cv the
    * (non-normalized) mean vector.
    *
    * Two determinism choices make the whole quantizer reproducible in ANY
    * engine (which is what lets the DuckDB oracle hash-check `ivfTopK`):
    *  - SEEDS order by md5 of the id — a portable pseudo-random spread
    *    (first-N ids would correlate with data layout and seed k-means
    *    from one corner of the corpus);
    *  - MEANS are fixed-point: per-dim values quantize to the 1e-6 grid
    *    (floor(x·1e6 + 0.5) — exact HALF-UP in both engines, no float
    *    round()), the per-cell SUM is an exact integer (order-independent
    *    — a float sum would depend on partial-aggregation order and was
    *    what made this operator un-oracle-able), and the mean is two IEEE
    *    divisions every engine performs identically. */
  def ivfCentroids(e: DataFrame, numCells: Int, iters: Int): DataFrame = {
    // Seed cell ids ARE the seed vec_ids: cell ids only need to be
    // distinct and deterministic, so a dense 1..numCells renumbering via
    // a global Window.orderBy (a single-partition WindowExec) buys
    // nothing. TakeOrderedAndProject handles the seed selection.
    var cents = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(numCells)
      .select(col("vec_id").cast("long").as("cell"), col("v").as("cv"))
    for (_ <- 0 until iters) {
      val assigned = assignCells(e, cents)
      cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(floor(col("x") * 1000000.0 + 0.5)).as("s"),
             count(lit(1)).as("cnt"))
        .withColumn("m", col("s").cast("double") / col("cnt") / 1000000.0)
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), s => s.getField("m")).as("cv"))
    }
    cents
  }

  /** Assign each vector to its max-cosine cell — a PURE PROJECTION.
    *
    * The centroid relation is bounded (`numCells` rows, data-independent),
    * so it is pulled to the driver and embedded as array literals; the
    * per-row argmax then runs entirely inside whole-stage codegen. The
    * previous formulation (crossJoin(broadcast) + groupBy(vec_id) max)
    * re-SHUFFLED the whole corpus with its vectors just to collapse the
    * 1-row-per-centroid expansion — two full-corpus shuffles per ivfTopK
    * call. The bounded driver collect is the same cost class as the
    * broadcast it replaces. Tie-break unchanged: max (cosine, cell). */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val rows = cents.select(col("cell").cast("long"), col("cv")).collect()
    val cellIds = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Double](1))
    // driver-side norms: Seq.sum is the same sequential left fold l2norm
    // compiles to, so the routing is identical to the old Spark-side math
    val norms = vecs.map(cv => math.sqrt(cv.map(x => x * x).sum))
    val matrix = typedlit(vecs.map(_.toSeq).toSeq)
    val cellArr = typedlit(cellIds.toSeq)
    val normArr = typedlit(norms.toSeq)
    val best = array_max(transform(sequence(lit(0), lit(rows.length - 1)), p =>
      struct(
        (dot(element_at(matrix, p + 1), col("v")) /
          (element_at(normArr, p + 1) * col("nv"))).as("cs"),
        element_at(cellArr, p + 1).as("cell"))))
    e.select(col("vec_id"), col("v"), col("nv"), best.getField("cell").as("cell"))
  }

  /** Squared L2 distance — same bit-reproducible left fold as [[dot]]. */
  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** PRODUCT QUANTIZATION — the compression half of the IVF-PQ
    * architecture real 100 TB ANN runs: the vector splits into `numSub`
    * subspaces of `subDim` dims, each subspace gets its own `ksub`-entry
    * codebook (md5-seeded, one integer-grid Lloyd refinement — the
    * [[ivfCentroids]] recipe per subspace), and every vector encodes to
    * `numSub` small codes (here: the seed vec_id of the chosen entry).
    * Storage/shuffle drops from `dim` floats to `numSub` codes; distance
    * evaluation against a query becomes `numSub` table lookups.
    *
    * Output: (vec_id, m, cell, d2q) — one row per vector per subspace
    * with the assigned code and the QUANTIZED squared-L2 distortion
    * (each per-dim (x−c)² floors to the 1e6 fixed-point grid BEFORE an
    * order-independent integer sum, so two engines hash-match).
    *
    * Scale shape: codebooks are bounded-by-construction driver state
    * (numSub·ksub rows — same cost class as a broadcast, the
    * [[assignCells]] argument) embedded as array literals, so encoding
    * is a PURE PROJECTION inside whole-stage codegen: no shuffle
    * touches the corpus except the two Lloyd aggregations over
    * (m, cell, dim) partial sums. */
  def pqEncode(embeddings: DataFrame, idCol: String, vecCol: String,
               numSub: Int = 8, subDim: Int = 8, ksub: Int = 16): DataFrame =
    pqTrain(embeddings, idCol, vecCol, numSub, subDim, ksub)._2
      .select(col("vec_id"), col("m"), col("cell"), col("d2q"))

  /** Trains the codebooks and encodes the corpus; returns
    * (codebook (m, cell, cv), codes (vec_id, m, sv, cell, d2q)). The
    * INDEX-BUILD half — run once, persist, serve queries from the
    * model (see [[pqSearch]]/[[ivfPqSearch]]); the bench keys cache it
    * like any derived input, so the measured cost is query-time. */
  def pqTrain(embeddings: DataFrame, idCol: String, vecCol: String,
              numSub: Int = 8, subDim: Int = 8, ksub: Int = 16): (DataFrame, DataFrame) = {
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val subs = e
      .select(col("vec_id"), explode(sequence(lit(0), lit(numSub - 1))).as("m"), col("v"))
      .select(col("vec_id"), col("m").cast("long").as("m"),
        expr(s"slice(v, m * $subDim + 1, $subDim)").as("sv"))

    // seeds: per subspace, the ksub smallest md5(vec_id:m) prefixes —
    // TopKAgg keeps the selection O(ksub) memory per partition (a
    // per-m Window would shuffle every subvector row into numSub
    // partitions). 52-bit prefix = exact in double, same order as the
    // hex string.
    val h = conv(substring(md5(concat(col("vec_id").cast("string"), lit(":"),
      col("m").cast("string"))), 1, 13), 16, 10).cast("long")
    val seedIds = subs.select(col("m"), col("vec_id"), h.as("h"))
      .groupBy("m")
      .agg(graft.functions.TopKAgg.topK(ksub, -col("h").cast("double"),
        col("vec_id").cast("string")).as("seeds"))
      .select(col("m"), explode(split(col("seeds"), ",")).as("sid"))
      .select(col("m").as("sm"), col("sid").cast("long").as("cell"))
    val cb0 = subs.join(broadcast(seedIds),
        subs("m") === seedIds("sm") && subs("vec_id") === seedIds("cell"))
      .select(col("m"), col("cell"), col("sv").as("cv"))

    // bounded driver state (numSub·ksub rows): embed the codebook as
    // literals so assignment runs inside codegen with no corpus shuffle
    def assign(cb: DataFrame, withDistortion: Boolean): DataFrame = {
      val rows = cb.select(col("m"), col("cell"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toSeq))
      val byM = (0 until numSub).map { m =>
        val mine = rows.filter(_._1 == m).sortBy(_._2)
        require(mine.nonEmpty, s"empty PQ codebook for subspace $m")
        (mine.map(_._2), mine.map(_._3))
      }
      // a starved cell (possible only with exact-duplicate subvectors)
      // would make the literal matrix ragged — fail loud, not null-max
      require(byM.map(_._1.length).distinct.size == 1,
        s"ragged PQ codebook: ${byM.map(_._1.length)}")
      val km = byM.head._1.length
      val cells = typedlit(byM.map(_._1))
      val mat = typedlit(byM.map(_._2))
      val best = array_max(transform(sequence(lit(0), lit(km - 1)), p => {
        val cv = element_at(element_at(mat, (col("m") + 1).cast("int")), p + 1)
        val base = Seq(
          (-d2(cv, col("sv"))).as("nd"),
          element_at(element_at(cells, (col("m") + 1).cast("int")), p + 1).as("cell"))
        val fields =
          if (!withDistortion) base
          else base :+ d2q(cv, col("sv")).as("d2q")
        struct(fields: _*)
      }))
      if (withDistortion)
        subs.select(col("vec_id"), col("m"), col("sv"),
          best.getField("cell").as("cell"), best.getField("d2q").as("d2q"))
      else
        subs.select(col("vec_id"), col("m"), col("sv"), best.getField("cell").as("cell"))
    }

    // one integer-grid Lloyd refinement (the ivfCentroids update step,
    // partitioned by (m, cell))
    val cb1 = assign(cb0, withDistortion = false)
      .select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy("m", "cell", "dim")
      .agg(sum(floor(col("x") * 1000000.0 + 0.5)).as("s"), count(lit(1)).as("cnt"))
      .withColumn("mv", col("s").cast("double") / col("cnt") / 1000000.0)
      .groupBy("m", "cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("dm"))
      .select(col("m"), col("cell"), transform(col("dm"), s => s.getField("mv")).as("cv"))

    (cb1, assign(cb1, withDistortion = true)
      .select(col("vec_id"), col("m"), col("sv"), col("cell"), col("d2q")))
  }

  /** Quantized squared L2 — per-dim (x−y)² floors to the 1e6 grid, then
    * an order-independent INTEGER sum (exact in double: ≤ dim·4e6). */
  private def d2q(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => floor((x - y) * (x - y) * lit(1000000.0) + lit(0.5)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** PQ ANN top-k — the full IVF-PQ search pipeline: ASYMMETRIC
    * DISTANCE COMPUTATION (each query builds a numSub·ksub integer
    * distance table; a candidate's approximate distance is the integer
    * sum of its codes' table entries — the corpus's float vectors never
    * move, only numSub-small-int code rows) shortlists `shortlist`
    * candidates per query, then an EXACT re-rank on just the shortlist
    * (the only step that touches full vectors, broadcast-joined) emits
    * the top k. At 100 TB the ADC pass reads ~numSub bytes/vector and
    * the exact pass reads shortlist/N of the corpus — the
    * memory-bandwidth shape real vector search deploys. Measured on the
    * synthetic (near-iid, PQ-hostile) embeddings: recall@5 ≈ 0.8 at
    * shortlist=100 vs 0.18 for raw ADC ranking.
    *
    * All distances integerize on [[d2q]]'s grid, so ranking is
    * exact-integer and two engines hash-match; ties break on vec_id
    * via the packed TopKAgg tag. */
  def pqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
             queryPred: Column, k: Int,
             numSub: Int = 8, subDim: Int = 8, ksub: Int = 16,
             shortlist: Int = 100): DataFrame = {
    val (cb, codes) = pqTrain(embeddings, idCol, vecCol, numSub, subDim, ksub)
    pqSearch(embeddings, idCol, vecCol, cb, codes, queryPred, k,
      numSub, subDim, shortlist)
  }

  /** The QUERY-TIME half of [[pqTopK]] against a persisted model —
    * `cb` and `codes` as returned by [[pqTrain]] (re-read from storage
    * in production; the index never retrains per query). */
  def pqSearch(embeddings: DataFrame, idCol: String, vecCol: String,
               cb: DataFrame, codes: DataFrame,
               queryPred: Column, k: Int,
               numSub: Int = 8, subDim: Int = 8,
               shortlist: Int = 100): DataFrame = {
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    // distance table: numSub·ksub integer entries per query
    val qtab = querySubs(e, queryPred, numSub, subDim).join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("cell"),
        d2q(col("cv"), col("qsv")).as("dq"))
    // ADC: every (m, cell) of every candidate hits exactly one entry
    val adist = codes.join(broadcast(qtab), Seq("m", "cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("dq")).as("adist"))
    adcShortlistRerank(adist, e, queryPred, k, shortlist)
  }

  private def querySubs(e: DataFrame, queryPred: Column,
                        numSub: Int, subDim: Int): DataFrame =
    e.filter(queryPred)
      .select(col("vec_id").as("query_id"),
        explode(sequence(lit(0), lit(numSub - 1))).as("m"), col("v"))
      .select(col("query_id"), col("m").cast("long").as("m"),
        expr(s"slice(v, m * $subDim + 1, $subDim)").as("qsv"))

  /** (dist, id) packed into one lexicographically-ordered tag for
    * TopKAgg. lpad TRUNCATES over-width input (a negative id's sign
    * char, a quantized distance past the 12-digit pad) which would
    * silently corrupt the packed order and the parsed ed_q6 /
    * neighbor_id — raise loud instead; in-range rows pay one compare. */
  private def packedTag(dist: Column) = {
    val id = col("vec_id")
    when(dist.cast("long") < 0L || dist.cast("long") > 999999999999L ||
        id.cast("long") < 0L || id.cast("long") > 9999999999L,
      raise_error(concat(lit("packedTag out of range: dist="),
        dist.cast("string"), lit(" vec_id="), id.cast("string"))))
      .otherwise(concat(lpad(dist.cast("string"), 12, "0"),
        lit(":"), lpad(id.cast("string"), 10, "0")))
  }

  /** Shared search tail: ADC shortlist (TopKAgg, (dist, id) packed into
    * the tag), then the exact quantized-L2 re-rank that alone touches
    * full vectors — broadcast-joined, so the corpus scan never
    * reshuffles. */
  private def adcShortlistRerank(adist: DataFrame, e: DataFrame,
                                 queryPred: Column, k: Int,
                                 shortlist: Int): DataFrame = {
    val short = adist.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(shortlist,
        -col("adist").cast("double"), packedTag(col("adist"))).as("tops"))
      .select(col("query_id"), explode(split(col("tops"), ",")).as("t"))
      .select(col("query_id"),
        split(col("t"), ":").getItem(1).cast("long").as("vec_id"))
    val qv = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qfull"))
    val exact = e.join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), d2q(col("v"), col("qfull")).as("ed"))
    exact.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(k,
        -col("ed").cast("double"), packedTag(col("ed"))).as("tops"))
      .select(col("query_id"), posexplode(split(col("tops"), ",")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rn"),
        split(col("col"), ":").getItem(1).cast("long").as("neighbor_id"),
        split(col("col"), ":").getItem(0).cast("long").as("ed_q6"))
  }

  /** RESIDUALS w.r.t. the assigned IVF centroid — what real IVFPQ
    * quantizes: within a cell the residual distribution is tighter than
    * the raw vectors', so the same PQ bit budget buys less distortion.
    * Output (vec_id, r, cell); deterministic IEEE subtraction. */
  def residuals(e: DataFrame, cents: DataFrame, assigned: DataFrame): DataFrame =
    assigned.join(broadcast(cents), Seq("cell"))
      .join(e.select(col("vec_id"), col("v")), Seq("vec_id"))
      .select(col("vec_id"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("r"), col("cell"))

  /** IVF-PQ — the architecture 100 TB vector search actually deploys
    * (FAISS IVFPQ): the IVF coarse quantizer PRUNES (each query probes
    * `nprobe` of `numCells` cells, touching ~nprobe/numCells of the
    * corpus), PQ codes COMPRESS — trained on RESIDUALS v − centroid
    * (the real IVFPQ encoding; the pooled-residual codebook spends its
    * bits on the within-cell distribution) — and the exact re-rank
    * touches full vectors only for the shortlist. Composes
    * [[ivfCentroids]]/[[assignCells]]/[[residuals]] with [[pqTrain]] +
    * the shared shortlist/re-rank tail; everything integerizes on
    * [[d2q]]'s grid so two engines hash-match. */
  def ivfPqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int,
                numCells: Int = 16, nprobe: Int = 4, ivfIters: Int = 2,
                numSub: Int = 8, subDim: Int = 8, ksub: Int = 16,
                shortlist: Int = 50): DataFrame = {
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val cents = ivfCentroids(e, numCells, ivfIters)
    val assigned = assignCells(e, cents).select(col("vec_id"), col("cell"))
    val resid = residuals(e, cents, assigned).localCheckpoint()
    val (cb, codes) = pqTrain(resid, "vec_id", "r", numSub, subDim, ksub)
    ivfPqSearch(embeddings, idCol, vecCol, cents, assigned, cb, codes,
      queryPred, k, nprobe, numSub, subDim, shortlist)
  }

  /** The QUERY-TIME half of [[ivfPqTopK]] against a persisted model:
    * `cents`/`assigned` from the IVF build, `cb`/`codes` from
    * [[pqTrain]] over the RESIDUAL relation — all four re-read from
    * storage in production. Each query builds one distance table PER
    * PROBED CELL (its residual there differs), still bounded:
    * nprobe × numSub × ksub integers per query. */
  def ivfPqSearch(embeddings: DataFrame, idCol: String, vecCol: String,
                  cents: DataFrame, assigned: DataFrame,
                  cb: DataFrame, codes: DataFrame,
                  queryPred: Column, k: Int, nprobe: Int = 4,
                  numSub: Int = 8, subDim: Int = 8,
                  shortlist: Int = 50): DataFrame = {
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val qcells = e.filter(queryPred).crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("cell"), col("v").as("qv"),
        (dot(col("v"), col("cv")) / (l2norm(col("cv")) * col("nv"))).as("cs"),
        col("cv"))
      .withColumn("cr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cs"), asc("cell"))))
      .filter(col("cr") <= nprobe)
      .select(col("query_id"), col("cell"),
        zip_with(col("qv"), col("cv"), (x, y) => x - y).as("qr"))
    val probed = assigned.join(broadcast(qcells.select("query_id", "cell")), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("cell").as("ivfcell"))
    // one distance table per (query, probed cell): the query's residual
    // in that cell vs every codebook entry
    val qsubs = qcells
      .select(col("query_id"), col("cell").as("ivfcell"),
        explode(sequence(lit(0), lit(numSub - 1))).as("m"), col("qr"))
      .select(col("query_id"), col("ivfcell"), col("m").cast("long").as("m"),
        expr(s"slice(qr, m * $subDim + 1, $subDim)").as("qsv"))
    val qtab = qsubs.join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("ivfcell"), col("m"), col("cell"),
        d2q(col("cv"), col("qsv")).as("dq"))
    val adist = probed.join(codes, Seq("vec_id"))
      .join(broadcast(qtab), Seq("query_id", "ivfcell", "m", "cell"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("dq")).as("adist"))
    adcShortlistRerank(adist, e, queryPred, k, shortlist)
  }

  /** Recall@k of an approximate top-k against exact ground truth:
    * mean over queries of |approx ∩ exact| / |exact|, both truncated
    * to rank ≤ k. The standard ANN quality metric; pairs with the
    * wall-clock of the approximate run it gives the recall-vs-cost
    * frontier (`graft.tools.AnnRecall` prints the table; the spec pins
    * the orderings that must hold at equal probe budgets). Inputs are
    * any two frames with (query_id, neighbor_id, rn). */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): Double = {
    val a = approx.filter(col("rn") <= k).select("query_id", "neighbor_id")
    val g = exact.filter(col("rn") <= k).select("query_id", "neighbor_id")
    val hits = g.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hit"))
    val row = g.groupBy("query_id").agg(count(lit(1)).as("tot"))
      .join(hits, Seq("query_id"), "left")
      .agg(avg(coalesce(col("hit"), lit(0L)).cast("double") / col("tot")))
      .head()
    require(!row.isNullAt(0),
      s"recallAtK: ground truth has no rows at k=$k — recall is undefined")
    row.getDouble(0)
  }

  /** IVF ANN top-k: probe the query's `nprobe` closest cells, exact
    * cosine within candidates. The scan side shuffles once on `cell`;
    * queries broadcast. The 100 TB path: cells partition the corpus so
    * each query touches ~nprobe/numCells of the data. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, numCells: Int = 16,
              nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val e = embeddings.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", l2norm(col("v")))
    val cents = ivfCentroids(e, numCells, iters)
    val assigned = assignCells(e, cents)
    // query → its nprobe closest cells
    val qcells = e.filter(queryPred).crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"),
        col("cell"),
        (dot(col("v"), col("cv")) / (l2norm(col("cv")) * col("nv"))).as("cs"))
      .withColumn("cr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cs"), asc("cell"))))
      .filter(col("cr") <= nprobe)
      .select(col("query_id"), col("qv"), col("nq"), col("cell"))
    val pairs = assigned.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("nq"), col("nv")).as("cos"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("sim"), col("rn"))
  }
}
