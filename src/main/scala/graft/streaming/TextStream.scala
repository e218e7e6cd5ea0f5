package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Streaming corpus curation — the ingestion-time form of the batch
  * `TextAnalysis.curate` pipeline, for feeds where documents arrive
  * continuously and curation must keep up rather than re-scan.
  *
  * Two tiers, by what state they need:
  *  - METRICS (quality, language, token counts) are stateless per-row
  *    projections — they share the exact expression trees with the batch
  *    path (`TextAnalysis.metricCols`), so stream ≡ batch holds by
  *    construction, not by luck;
  *  - EXACT DEDUP cannot use the batch min-over-content-hash window (a
  *    window over an unbounded stream is unbounded state). The streaming
  *    form is `dropDuplicatesWithinWatermark` on the content hash: per-
  *    hash state lives only until the watermark passes, so memory is
  *    bounded by (watermark × arrival rate) — the only shape that ships
  *    for an endless feed. Keeper CHOICE differs from batch (first
  *    arrival wins, not min id); the kept CONTENT SET is identical,
  *    which is what the spec asserts.
  */
object TextStream {

  /** Stateless per-document curation metrics over a doc stream. */
  def metrics(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(TextAnalysis.metricCols(idCol, textCol): _*)

  /** Watermark-bounded exact dedup + quality/language gates. `docs`
    * needs an event-time column `t` (ingest time for a real feed). */
  def curateStream(docs: DataFrame, idCol: String, textCol: String,
                   watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("__content", md5(col(textCol)))
      .withWatermark("t", watermark)
      .dropDuplicatesWithinWatermark("__content")
      .select(TextAnalysis.metricCols(idCol, textCol) :+ col("__content").as("content_hash"): _*)
      .filter(col("n_tokens") >= 10 && col("stop_ratio") > 0 &&
        col("lang_pred") === "en")
}
