package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Lsh
import graft.sources.IndexStore

/** Streaming ingest into a persisted ANN index — the online half of
  * the index-maintenance story: a vector stream (new products, new
  * documents) lands in the SAME bucket-partitioned LSH artifact that
  * batch built and that [[VectorServing]] probes, so serving sees new
  * vectors within one micro-batch without any rebuild. (The reference
  * rebuilds its faiss index offline and restarts the app to pick it
  * up; FAISS `index.add()` is the online analog this distributes.)
  *
  * Exactly-once without a transaction log: each micro-batch stages
  * under a DETERMINISTIC hidden dir (`.tmp-ingest-b<batchId>`) and
  * commits as the epoch `epoch=ingest-b<batchId>` with one rename
  * ([[IndexStore.commitEpoch]] — readers see none or ALL of the
  * batch). Structured Streaming replays a failed batch with the SAME
  * batchId, so the sink's first move is an epoch-existence probe:
  * a replay of a committed batch is a no-op, and a crash mid-staging
  * leaves only a hidden dir the retry overwrites. No dedup state, no
  * watermark — idempotence falls out of the epoch naming.
  *
  * Scale: each batch writes only its own rows' bucket files (the
  * incremental-append property of the epoch layout); the index grows
  * by one epoch dir per non-empty batch, and [[IndexStore.compact]]
  * folds epochs back together as offline maintenance.
  */
object IndexIngest {

  /** The committed-batch high-water mark, persisted as a tiny
    * `_`-prefixed file (invisible to partition discovery, and NOT an
    * epoch dir — so [[IndexStore.compact]], which folds epoch dirs
    * away, cannot erase the idempotence record). Without it, a
    * compaction running between a crash and the stream's restart
    * would delete the replayed batch's epoch dir and the replay would
    * append duplicates. Structured Streaming batch ids are monotonic,
    * so one long is the whole ledger.
    */
  private[graft] def readHwm(spark: SparkSession, path: String): Long =
    IndexStore.readIngestHwm(spark, path)

  private def writeHwm(spark: SparkSession, path: String, batchId: Long): Unit =
    IndexStore.writeIngestHwm(spark, path, batchId)

  /** The foreachBatch body: hash the batch with the index's seed-fixed
    * hyperplanes and commit it as epoch `ingest-b<batchId>`; no-op on
    * replayed (already-committed) batches — detected by the epoch dir
    * OR the compaction-proof high-water mark — and on empty batches.
    * Single-writer per index, like every maintenance op on the
    * artifact. `batch`: (vec_id, embedding).
    */
  def appendLshBatch(spark: SparkSession, path: String, nBits: Int)
                    (batch: DataFrame, batchId: Long): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochName = s"ingest-b$batchId"
    if (batchId <= readHwm(spark, path)) return // replay of a committed (possibly compacted) batch
    if (fs.exists(new Path(path, s"epoch=$epochName"))) { // committed, hwm write lost
      writeHwm(spark, path, batchId); return
    }
    if (batch.isEmpty) return
    val staging = Lsh.stageAppendAt(spark, path, batch, nBits, s"$path/.tmp-$epochName")
    IndexStore.commitEpoch(spark, path, staging)
    writeHwm(spark, path, batchId)
  }

  /** Start the ingest: `stream` (vec_id, embedding) → atomic per-batch
    * epochs of the LSH index at `path`. The checkpoint dir carries the
    * stream's offsets; the epoch names carry the sink's idempotence.
    */
  def intoLshIndex(spark: SparkSession, stream: DataFrame, path: String, nBits: Int,
                   checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: java.lang.Long) =>
        appendLshBatch(spark, path, nBits)(b.toDF(), id))
      .start()
}
