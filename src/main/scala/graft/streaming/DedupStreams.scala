package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Streaming near-dup admission gate — the online half of the
  * incremental-ingest dedup shape (`Dedup.incrementalNearDup`): a live
  * feed of new documents is checked against the STANDING corpus before
  * it lands, so duplicates never enter the training set in the first
  * place. Each micro-batch runs the same batch core
  * ([[Dedup.gateAgainstCorpus]] — same shingle definition, same
  * df-capped corpus side, same best-match rule), so streaming
  * admission and a batch backfill can never disagree.
  *
  * Scale: per-batch cost is batch-shingles × matching corpus buckets —
  * the corpus is touched only through the shared memoized shingle
  * frame (built once per session, served from cache), never rescanned
  * per batch.
  */
object DedupStreams {

  /** Start the gate: for every micro-batch of (doc_id, text) rows,
    * compute the flagged frame (doc_id, match_id, jaccard) and hand it
    * to `sink` (a real deployment writes admissions/rejections; specs
    * collect). foreachBatch keeps the aggregation inside one batch —
    * no streaming state, no watermark, replay-safe because the gate is
    * a pure function of (batch, corpus).
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame,
            n: Int = 5, threshold: Double = 0.8, maxDf: Long = 1000L)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(Dedup.gateAgainstCorpus(spark, dir, batch, n, threshold, maxDf), batchId)
      }
      .start()
}
