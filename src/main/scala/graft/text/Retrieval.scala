package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Full-text retrieval scoring — BM25 (Robertson/Sparck Jones) top-k
  * over the corpus, the lexical-search complement to the embedding ANN
  * stack (`graft.similarity`): hard-negative mining, eval-set retrieval
  * and dedup-by-query all start here.
  *
  *   score(q,d) = Σ_{t∈q} ln((N−df+0.5)/(df+0.5)+1) ·
  *                tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *
  * Scale shape: the corpus is pruned to QUERY TERMS map-side (isin
  * filter folded into the token explode) before any aggregation — tf/df
  * relations are query-vocabulary-sized, never corpus-vocabulary-sized.
  * Corpus stats (N, avgdl) ride in-plan as a broadcast 1-row aggregate
  * (no driver round-trip); avgdl is exact-integer sum ÷ count, so both
  * engines derive the identical double. Every float literal is written
  * as an explicit double on both sides (a bare 1.2 is DECIMAL to DuckDB
  * — decimal-exact arithmetic would diverge from IEEE in the last ulp).
  * Per-(query,doc) scores round(6) after the final sum; ties break by
  * doc_id so the top-k cut is total.
  */
object Retrieval {

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, q) => q.split(" ").distinct.map(w => (qid, w)) }
      .toDF("query_id", "word")
    val qwords = queries.flatMap(_._2.split(" ")).distinct

    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokenize(col(textCol))).as("word"))
    // materialize the skinny (doc_id, dl) relation: THREE consumers
    // (stats, the score join, and the count) would otherwise each
    // re-scan + re-tokenize the corpus — 4 scans instead of 2
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    // exact: integer sum ÷ count, one IEEE division — not a float avg()
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // materialize: two consumers (dfq + the score join) would re-scan
    // the corpus; the relation itself is query-vocabulary-sized
    val tfq = toks.filter(col("word").isin(qwords: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfq = tfq.groupBy("word").agg(count(lit(1)).as("df"))

    val scored = tfq
      .join(broadcast(dfq), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qterms), Seq("word"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("tscore")), 6).as("score"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists:
    * score(q,d) = Σ_lists 1/(k0 + rank) — the standard hybrid-retrieval
    * combiner (lexical BM25 + vector ANN + priors) that needs no score
    * calibration because it consumes only RANKS. Engine-exact by
    * construction: each term is one IEEE division, two-double sums are
    * commutative-exact, so round(6) is decoration, not absorption.
    * Inputs are top-k lists (bounded), so everything after the union is
    * kilobytes — fusion cost is the cost of producing the input lists.
    * @param lists (query_id, doc_id, rank) relations, one per signal */
  def rrf(lists: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    val u = lists.map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col("rank"))).as("sc")))
      .reduce(_ unionByName _)
    val fused = u.groupBy("query_id", "doc_id")
      .agg(round(sum(col("sc")), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"))
  }

  /** Top-k tf-idf terms per document: tf = in-doc occurrence count,
    * idf = ln(N/df) over the WHOLE corpus — df and N are computed before
    * the doc filter, so a query subset scores against global statistics
    * (scoring a shard against shard-local df is the classic federation
    * bug). Ranking uses the ROUNDED score with a word tie-break, making
    * the cut total and engine-independent.
    *
    * Scale shape: the (doc, word, tf) relation is materialized once and
    * feeds both the df aggregation and the scoring join (the bm25
    * interim-reuse lesson — without it the token explode runs twice);
    * the corpus count rides in-plan as a broadcast 1-row aggregate.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                queryDocs: Column, k: Int): DataFrame = {
    val tf = graft.index.InvertedIndex.occurrences(docs, idCol, textCol)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.filter(queryDocs)
      .join(dfreq, "word")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        log(col("n").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("rn"), col("word"), col("tfidf"))
  }

  /** Ranking-quality metrics per query from (query, rank, rel) rows —
    * the evaluation step every retriever/reranker change gates on.
    * Emits INTEGER metrics on the tokenEntropy fixed-point grid (each
    * 1/log2(rank+1) DCG gain quantizes to floor(x·1e6 + 0.5) BEFORE the
    * order-independent integer sum) so two engines hash-match:
    *
    *   n_rel          relevant hits in the top-k window (k is whatever
    *                  window the caller ranked — the metric doesn't
    *                  bake a k into its name)
    *   first_rel_rank rank of the first relevant hit (-1 = none)
    *   mrr_q6         floor(1e6 / first_rel_rank + .5), 0 when none
    *   dcg_q6         Σ_rel floor(1e6 / log2(rank+1) + .5)
    *
    * Scale shape: input is already top-k-per-query (bounded rows), the
    * single groupBy(query) shuffle moves ≤k rows per query. */
  def rankingMetrics(ranked: DataFrame): DataFrame = {
    val firstRel = min(when(col("rel") === 1, col("rank")))
    ranked.groupBy("query").agg(
      sum(col("rel")).as("n_rel"),
      coalesce(firstRel, lit(-1L)).as("first_rel_rank"),
      coalesce(floor(lit(1000000.0) / firstRel + lit(0.5)).cast("long"), lit(0L))
        .as("mrr_q6"),
      sum(when(col("rel") === 1,
          floor(lit(1000000.0) / log2(col("rank") + 1) + lit(0.5)).cast("long"))
        .otherwise(0L)).as("dcg_q6"))
  }
}
