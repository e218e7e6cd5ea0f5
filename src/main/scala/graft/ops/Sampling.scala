package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / train-eval splitting for training-data
  * pipelines.
  *
  * `df.sample()` is seed-dependent on partition LAYOUT (the seed mixes
  * with the partition index), so the same corpus sampled on a different
  * cluster yields a different subset — unacceptable for reproducible
  * train/eval splits. Hash-bucket sampling fixes the subset to the DATA:
  * bucket = first md5 byte of the id (256 buckets), membership = bucket
  * threshold. Any engine reproduces it (the DuckDB oracle does), adding
  * or removing rows never reassigns surviving rows, and it is a pure
  * map-side projection — no shuffle, no sort, scan speed at 100 TB.
  *
  * [[assignSplits]] is the leakage-aware variant: bucketing by the
  * NEAR-DUP CLUSTER label instead of the doc id guarantees near-
  * duplicate documents land in the same split — the classic train/eval
  * contamination (a paraphrase of a training doc sitting in eval) is
  * structurally impossible, not just unlikely.
  */
object Sampling {

  /** 0..255 from the first md5 byte of the id's string form — the
    * portable hash both engines agree on byte for byte. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** Keep rows whose bucket < `buckets` (of 256): a buckets/256 sample,
    * deterministic across engines, partitionings, and reruns. */
  def hashSample(df: DataFrame, idCol: String, buckets: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < buckets)

  /** Stratified deterministic sampling: a different bucket threshold per
    * stratum (e.g. keep 25% of English, 6.25% of everything else — the
    * language-rebalancing pass of a corpus pipeline). Same md5-bucket
    * membership as [[hashSample]], so it inherits every property that
    * matters at scale: pure map-side filter (no shuffle, no sampleBy
    * seed-vs-partition-layout dependence), growth-stable, and the rate
    * CASE folds into the scan filter. `rates` maps stratum value →
    * buckets-of-256 kept; unlisted strata fall back to `defaultBuckets`.
    * The fold is over a sorted key sequence so the generated plan (and
    * therefore the oracle SQL) is deterministic. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Int], defaultBuckets: Int): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultBuckets)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < thr)
  }

  /** (doc_id, component, bucket, split) — split by the CLUSTER hash:
    * `clusters` is a (node, component) relation (e.g. from
    * [[graft.graph.ConnectedComponents]] over verified near-dup pairs);
    * singletons fall back to their own id. Every member of a component
    * shares its bucket, so no near-dup pair can straddle train/eval.
    * `evalBuckets` of 256 go to eval. */
  def assignSplits(docs: DataFrame, idCol: String, clusters: DataFrame,
                   evalBuckets: Int): DataFrame = {
    val labeled = docs
      .join(clusters.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    labeled
      .withColumn("bucket", hashBucket(col("component")))
      .withColumn("split",
        when(col("bucket") < evalBuckets, lit("eval")).otherwise(lit("train")))
      .select(col(idCol), col("component"), col("bucket"), col("split"))
  }

  /** Derandomized Efraimidis–Spirakis weighted sampling WITHOUT
    * replacement: each row draws a deterministic pseudo-uniform u from
    * its id's md5 (first 8 hex chars → u = (h + 0.5) / 2^32, never 0),
    * races with key = -ln(u) / w, and the k SMALLEST keys win — each
    * row's inclusion probability is proportional to its weight, with no
    * RNG and no partition-layout dependence (the [[hashSample]]
    * discipline applied to weighted selection; the corpus-rebalancing
    * pass when strata are continuous instead of categorical).
    *
    * Scale shape: the race key is a pure map-side expression and the
    * k-smallest selection plans as TakeOrderedAndProject (per-partition
    * heaps, merge on the driver) — no global sort, no shuffle of the
    * losers. Selection and output order use the 1e-9-ROUNDED key with
    * the id as tie-break so the ordering is engine-exact (the knn_join
    * rounded-ranking discipline). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    val key = round(-log(u) / weight, 9)
    df.select(col(idCol), weight.cast("long").as("w"), key.as("es_key"))
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** Integral source up-sampling — the standard LLM data-mixing move:
    * each source's documents repeat `weights(source)` times (default 1)
    * tagged with an epoch index, so the trainer's shuffle sees the
    * target mixture without any RNG (reproducible on any engine, unlike
    * fraction-based sampling) and downstream dedup/packing can still
    * distinguish repeats by (doc_id, epoch). Pure Generate projection —
    * no shuffle; output size is the weighted sum, chosen by config. */
  def mixEpochs(docs: DataFrame, idCol: String, srcCol: String,
                weights: Map[String, Int], default: Int = 1): DataFrame = {
    require((default +: weights.values.toSeq).forall(_ >= 1),
      "epoch factors must be >= 1")
    val factor = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(default)) { case (acc, (k, v)) =>
        when(col(srcCol) === k, lit(v)).otherwise(acc)
      }
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        explode(sequence(lit(1), factor)).as("epoch"))
      .withColumn("epoch", col("epoch").cast("long"))
  }
}
