package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * dimension; a dimension-mismatched row dots to null (VecDot nulls
    * on length mismatch), which the two-branch `when` propagates to a
    * NULL bucket — the row drops out of every bucket join instead of
    * silently hashing to bucket 0.
    */
  def assignBuckets(spark: SparkSession, dir: String, nBits: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val planes = hyperplanes(spark, nBits, embeddingDim(spark, dir))
    e.crossJoin(broadcast(planes))
      .groupBy(col("vec_id"))
      .agg(sum(signWeight(col("embedding"), col("plane"), col("weight"))).as("bucket"))
  }

  /** 2^bit weight for a positive sign bit, 0 for negative, NULL for a
    * null dot (dimension mismatch) — the null branch keeps a bad row
    * out of every bucket rather than voting it into bucket 0.
    */
  private def signWeight(emb: Column, plane: Column, weight: Column): Column = {
    val d = dotd(emb, plane)
    when(d >= 0, weight).when(d < 0, lit(0L))
  }

  /** Banded sign-LSH assignment: `nBands` INDEPENDENT hash tables of
    * `bitsPerBand` bits each — (vec_id, band, bucket) rows. Two
    * vectors are candidates if they collide in ANY band (the same
    * band/bucket trick minhashLsh uses for Jaccard), which turns the
    * single-table miss probability (1-p^r) into (1-p^r)^b — the knob
    * that makes sign-LSH blocking tunable per threshold. All
    * nBands·bitsPerBand hyperplanes ride one broadcast; assignment is
    * a single crossJoin + groupBy(vec_id, band) with map-side combine,
    * one pass over the corpus.
    */
  def assignBandBuckets(spark: SparkSession, dir: String, nBands: Int,
                        bitsPerBand: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // weight restarts at each band boundary (2^(bit mod r)), so bucket
    // ids stay in [0, 2^r) regardless of how many total bits are drawn
    val planes = hyperplanes(spark, nBands * bitsPerBand, embeddingDim(spark, dir))
      .select((col("bit") / bitsPerBand).cast("int").as("band"),
        expr(s"shiftleft(1L, bit % $bitsPerBand)").cast("long").as("weight"),
        col("plane"))
    e.crossJoin(broadcast(planes))
      .groupBy(col("vec_id"), col("band"))
      .agg(sum(signWeight(col("embedding"), col("plane"), col("weight"))).as("bucket"))
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
