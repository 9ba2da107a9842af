package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Rec
import graft.sources.IndexStore

/** Streaming ALS model maintenance — the model-side sibling of
  * [[IndexIngest]] (vectors) and [[PercolateStreams]] (alerts): a live
  * interaction stream (user_id, item_id) folds each micro-batch's
  * affected users into fresh factors against the FROZEN full-corpus
  * item factors ([[Rec.alsFoldInDelta]] — the exact batch core, so a
  * streamed fold-in and a batch backfill of the same rows can never
  * disagree), and publishes each batch's drift table as one ATOMIC
  * epoch of a persisted factor artifact. A serving layer reads
  * [[latestUserFactors]]; the l1_delta column is its cache-invalidation
  * signal, exactly as in the batch readout.
  *
  * Exactly-once via the [[IndexIngest]] discipline: deterministic
  * epoch names (`epoch=ingest-b<batchId>`) + the compaction-proof
  * high-water mark, so a replayed micro-batch is a no-op and readers
  * see none or all of a batch (single rename). No streaming state —
  * idempotence falls out of the epoch naming, and the fold-in math is
  * deterministic integer arithmetic.
  *
  * Scale: per batch, cost ∝ the batch's users' interaction history
  * (one semi-join + bounded 2×2 solves), never the corpus; the
  * artifact grows one epoch dir per non-empty batch and folds back
  * together under [[IndexStore.compact]]-style offline maintenance.
  */
object AlsStreams {

  /** The foreachBatch body: fold the batch's users in against the
    * frozen base model and commit the drift table as epoch
    * `ingest-b<batchId>`. No-op on replayed (committed) and empty
    * batches. Single-writer per artifact path.
    */
  def foldInBatch(spark: SparkSession, dir: String, path: String, iters: Int = 2)
                 (batch: DataFrame, batchId: Long): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochName = s"ingest-b$batchId"
    if (batchId <= IndexStore.readIngestHwm(spark, path)) return
    if (fs.exists(new Path(path, s"epoch=$epochName"))) {
      IndexStore.writeIngestHwm(spark, path, batchId); return
    }
    if (batch.isEmpty) return
    val drift = Rec.alsFoldInDelta(spark, dir,
      batch.select(col("user_id"), col("item_id")), iters)
    val staging = s"$path/.tmp-$epochName"
    drift.write.mode("overwrite").parquet(staging)
    IndexStore.commitEpoch(spark, path, staging)
    IndexStore.writeIngestHwm(spark, path, batchId)
  }

  /** Start the maintenance stream: `stream` (user_id, item_id) →
    * one drift-table epoch per non-empty micro-batch at `path`.
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame, path: String,
            checkpointDir: String, iters: Int = 2): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: java.lang.Long) =>
        foldInBatch(spark, dir, path, iters)(b.toDF(), id))
      .start()

  /** The serving view over the factor artifact: each user's factors
    * from the NEWEST epoch that folded them in (later batches win —
    * they solved over a superset of the user's history). One
    * partition-discovered scan; the rank window is PARTITIONED by
    * user (WindowGroupLimit shape), never global.
    */
  def latestUserFactors(spark: SparkSession, path: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("batch").desc)
    spark.read.parquet(path)
      .withColumn("batch",
        regexp_extract(col("epoch").cast("string"), "ingest-b(\\d+)", 1).cast("long"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("user_id"), col("new_f1").as("f1"), col("new_f2").as("f2"),
        col("batch").as("as_of_batch"))
  }
}
