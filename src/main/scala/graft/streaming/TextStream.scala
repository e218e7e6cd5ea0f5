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

  /** Streaming per-source admission cap — the ingestion-time form of
    * `TextAnalysis.sourceCap` (domain caps applied AS documents arrive,
    * so an over-represented feed is throttled before it ever lands).
    *
    * State per source is ONE long (the admitted count): memory is
    * bounded by SOURCE CARDINALITY, never by stream length — the shape
    * that survives an endless feed. Admission is per micro-batch in id
    * order (rows within a batch are sorted before the counter applies),
    * so on an id-ordered replay the admitted set equals the batch
    * operator's k-lowest-ids exactly — which is what the spec asserts;
    * under arbitrary arrival the cap still holds, only the CHOICE of
    * survivors differs (first k arrivals), the documented streaming
    * divergence. */
  def sourceCapStream(docs: DataFrame, idCol: String, srcCol: String,
                      k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(srcCol).as("source"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).flatMap { case (id, _) =>
            if (admitted < k) { admitted += 1; Some((id, src, admitted)) }
            else None
          }
          state.update(admitted)
          out.iterator
      }
      .toDF("doc_id", "source", "rn")
  }

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
