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
  * Scale shape: hyperplanes are a 16-row broadcast table; bucket
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

  /** Corpus with an LSH `bucket` column (sum of 2^bit over positive
    * sign bits).
    */
  def assignBuckets(spark: SparkSession, dir: String, nBits: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val planes = hyperplanes(spark, nBits, dim = 64)
    e.crossJoin(broadcast(planes))
      .groupBy(col("vec_id"))
      .agg(sum(when(dotd(col("embedding"), col("plane")) >= 0, col("weight"))
        .otherwise(0L)).as("bucket"))
  }

  /** Multi-probe top-k: probe the query's bucket and every hamming≤1
    * neighbor bucket, rerank candidates with the exact cosine.
    */
  def lshTopK(spark: SparkSession, dir: String, queryId: Long, nBits: Int, k: Int): DataFrame = {
    import spark.implicits._
    val buckets = assignBuckets(spark, dir, nBits).cache()
    val e = Tables.embeddings(spark, dir).withColumn("nrm", l2norm(col("embedding")))
    val corpus = e.join(buckets, "vec_id")
    val qRow = corpus.where(col("vec_id") === queryId)
      .select(col("embedding").as("qv"), col("nrm").as("qn"), col("bucket").as("qb"))
    // hamming≤1 probe set: the bucket itself plus each single-bit flip
    val masks = (0L +: (0 until nBits).map(1L << _).map(_.toLong)).toDF("mask")
    val probes = qRow.crossJoin(masks)
      .select(col("qv"), col("qn"),
        col("qb").bitwiseXOR(col("mask")).as("bucket"))
    corpus.join(broadcast(probes), "bucket")
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("bucket"),
        round(dotd(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 5).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }
}
