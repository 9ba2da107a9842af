package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming curation — the online half of the batch curation
  * pipeline: incoming documents are quality-gated and PII-redacted as
  * they arrive, so a live feed lands in the training corpus already
  * clean. Every column is a NARROW per-row transform
  * ([[TextAnalysis.withQualityCols]] / [[TextAnalysis.withPiiCols]] —
  * the same single definitions the batch oracles hash-match), so the
  * identical declarative plan runs under `readStream`/`writeStream`
  * with no watermark, no state store, and no reconciliation risk
  * between what batch curation would have kept and what streaming
  * admitted.
  */
object CurationStreams {

  /** Gate + scrub a document frame (batch or stream): drop documents
    * under `minQuality` (the exact-ratio score shared with
    * `curate_pipeline`'s oracle) and emit the redacted text plus the
    * per-doc redaction count. Input needs (doc_id, text).
    */
  def curate(docs: DataFrame, minQuality: Double = 0.6): DataFrame =
    TextAnalysis.withPiiCols(TextAnalysis.withQualityCols(docs))
      .where(col("quality") >= minQuality)
      .select(col("doc_id"), col("clean_text"), col("quality"),
        (col("n_email") + col("n_ipv4") + col("n_number")).as("n_redactions"))
}
