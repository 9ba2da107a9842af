package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Random-hyperplane LSH for cosine similarity — the bucketed ANN
  * alternative to IVF (SURVEY §2 #6): no training pass (vs k-means),
  * so the index is a pure map over the corpus; the trade is
  * less-adaptive cells. Sign-of-dot against `nBits` fixed hyperplanes
  * gives each vector an nBits-bucket id; cosine-close vectors agree on
  * most signs, so probing the query's bucket plus all hamming≤1
  * neighbors recovers most true neighbors while scanning a ~2^-nBits
  * fraction of the corpus per probe.
  *
  * Scale shape: hyperplanes are an nBits-row broadcast table; bucket
  * assignment is one broadcast-join + groupBy(vec_id) — at ingest this
  * is written once, bucket-partitioned (same layout as Ivf.saveIndex),
  * and a query touches only probed buckets (partition pruning).
  * Hyperplane weights come from a fixed-seed RNG on the driver —
  * deterministic across runs, no engine-parity concern (the driver
  * checks this operator rows-only; exact rerank keeps scores honest).
  */
object Lsh {

  /** (bit, 2^bit weight, hyperplane) rows — fixed seed, unit scale. */
  def hyperplanes(spark: SparkSession, nBits: Int, dim: Int): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(42)
    (0 until nBits).map { j =>
      (j, 1L << j, Array.fill(dim)(rnd.nextGaussian()))
    }.toDF("bit", "weight", "plane")
  }

  /** The corpus's embedding dimension, read from one row (a LIMIT 1
    * scan — the schema's array type does not carry the length).
    */
  def embeddingDim(spark: SparkSession, dir: String): Int =
    Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("d")).head.getInt(0)

  /** Corpus with an LSH `bucket` column (sum of 2^bit over positive
    * sign bits). Hyperplanes are drawn at the corpus's actual
    * dimension; a mismatched row would dot to null (VecDot fails fast
    * on length mismatch) rather than hash into a wrong bucket.
    */
  def assignBuckets(spark: SparkSession, dir: String, nBits: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val planes = hyperplanes(spark, nBits, embeddingDim(spark, dir))
    e.crossJoin(broadcast(planes))
      .groupBy(col("vec_id"))
      .agg(sum(when(dotd(col("embedding"), col("plane")) >= 0, col("weight"))
        .otherwise(0L)).as("bucket"))
  }

  /** Multi-probe top-k: probe the query's bucket and every hamming≤1
    * neighbor bucket, rerank candidates with the exact cosine.
    *
    * The query's bucket is computed from its own (filter-pruned) row ×
    * the broadcast planes, so the corpus-wide bucket assignment is
    * evaluated exactly once — no cache to leak across calls (at ingest
    * scale the assignment is written once, bucket-partitioned, like
    * Ivf.saveIndex).
    */
  def lshTopK(spark: SparkSession, dir: String, queryId: Long, nBits: Int, k: Int): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).withColumn("nrm", l2norm(col("embedding")))
    val planes = hyperplanes(spark, nBits, embeddingDim(spark, dir))
    val qRow = e.where(col("vec_id") === queryId)
      .crossJoin(broadcast(planes))
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("qv"), first(col("nrm")).as("qn"),
        sum(when(dotd(col("embedding"), col("plane")) >= 0, col("weight"))
          .otherwise(0L)).as("qb"))
    // hamming≤1 probe set: the bucket itself plus each single-bit flip
    val masks = (0L +: (0 until nBits).map(1L << _).map(_.toLong)).toDF("mask")
    val probes = qRow.crossJoin(masks)
      .select(col("qv"), col("qn"),
        col("qb").bitwiseXOR(col("mask")).as("bucket"))
    e.join(assignBuckets(spark, dir, nBits), "vec_id")
      .join(broadcast(probes), "bucket")
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("bucket"),
        round(dotd(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 5).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }
}
