package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** Streaming percolation — the online half of the reverse-search
  * alerting shape (`TextAnalysis.percolate` is the batch readout):
  * stored per-source subscriptions are matched against every
  * micro-batch of incoming documents, and firings stream to the sink
  * as they happen — the alerting deployment the Elasticsearch
  * percolator serves. Each micro-batch runs the SAME batch core
  * ([[TextAnalysis.percolateDocs]] — same tokenizer contract, same
  * broadcast subscription table, same ≥ minMatch firing rule), so a
  * streamed alert and a batch backfill can never disagree.
  *
  * Scale: subscriptions are a bounded (sources × termsPerQuery)
  * broadcast built once per session (ScratchCache); per-batch cost is
  * batch-tokens × matching subscriptions — the corpus is never
  * rescanned. foreachBatch keeps the firing aggregation inside one
  * batch: no streaming state, no watermark, replay-safe because the
  * gate is a pure function of (batch, subscriptions).
  */
object PercolateStreams {

  /** Start the gate: for every micro-batch of (doc_id, text) rows,
    * compute the firing frame (doc_id, sub_source, hits) and hand it
    * to `sink` (a deployment routes alerts; specs collect).
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame,
            termsPerQuery: Int = 3, minMatch: Int = 2)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(TextAnalysis.percolateDocs(spark, dir, batch, termsPerQuery, minMatch),
            batchId)
      }
      .start()
}
