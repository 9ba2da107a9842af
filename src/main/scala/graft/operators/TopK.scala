package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Bounded per-key top-k as a typed Aggregator — the alternative to a
  * ranking window for the kNN join (SURVEY §5).
  *
  * A window plan must sort every partition by (key, score) before the
  * rank filter (Spark 4's WindowGroupLimit bounds what is shuffled,
  * but the per-partition sort remains). The Aggregator keeps a bounded
  * buffer of the k best pairs per key instead: partial aggregation
  * truncates to k on EVERY map-side partition, so at most
  * k·numPartitions rows per key cross the wire, and nothing is ever
  * globally sorted — only each final k-element buffer. At 1000
  * executors that turns the kNN ranking from sort-bound into a pure
  * streaming fold.
  */
object TopK {

  case class ScoredPair(q_id: Long, n_id: Long, score: Double)

  /** Keeps the k best (score DESC, n_id ASC) pairs; the buffer is
    * allowed to grow to 2k between trims so sorting amortizes to
    * O(log k) per row.
    */
  class TopKAgg(k: Int) extends Aggregator[ScoredPair, List[(Double, Long)], Seq[(Double, Long)]] {
    private def best(b: List[(Double, Long)]): List[(Double, Long)] =
      b.sortBy { case (s, id) => (-s, id) }.take(k)
    private def trim(b: List[(Double, Long)]): List[(Double, Long)] =
      if (b.lengthCompare(2 * k) <= 0) b else best(b)
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], a: ScoredPair): List[(Double, Long)] =
      trim((a.score, a.n_id) :: b)
    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
      trim(x ::: y)
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = best(b)
    override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  /** [[TopKAgg]] for inputs where the SAME (key, n_id) pair can arrive
    * multiple times with an IDENTICAL score — the banded-LSH candidate
    * stream, where a pair collides in up to nBands buckets and every
    * collision rescores the same rounded cosine. Deduping INSIDE the
    * bounded buffer (by n_id, after the (score DESC, n_id) sort, so
    * the kept occurrence is canonical) makes the upstream
    * `.distinct()` pass — a full shuffle of the entire candidate
    * stream — unnecessary: map-side partials already emit at most k
    * DISTINCT ids per key per partition. Associativity holds exactly
    * because duplicate scores are equal by construction: top-k of a
    * dedup'd union = top-k of the union of per-partial dedup'd top-ks.
    */
  class TopKDistinctAgg(k: Int) extends Aggregator[ScoredPair, List[(Double, Long)], Seq[(Double, Long)]] {
    private def best(b: List[(Double, Long)]): List[(Double, Long)] =
      b.sortBy { case (s, id) => (-s, id) }.distinctBy(_._2).take(k)
    private def trim(b: List[(Double, Long)]): List[(Double, Long)] =
      if (b.lengthCompare(2 * k) <= 0) b else best(b)
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], a: ScoredPair): List[(Double, Long)] =
      trim((a.score, a.n_id) :: b)
    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
      trim(x ::: y)
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = best(b)
    override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  /** knnJoin semantics (same rows as VectorSearch.knnJoin) through the
    * heap path: queries broadcast, corpus scanned once, ranking via
    * bounded partial aggregation instead of a window sort.
    */
  def knnJoinHeap(spark: SparkSession, dir: String, queryMod: Int, k: Int): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).withColumn("nrm", l2norm(col("embedding")))
    val q = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dotd(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 5).as("score"))
      .as[ScoredPair]
    scored.groupByKey(_.q_id)
      .agg(new TopKAgg(k).toColumn.name("top"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((s, nid), i) => (qid, nid, s, (i + 1).toLong) }
      }
      .toDF("q_id", "n_id", "score", "rk")
      .orderBy(col("q_id"), col("rk"))
  }
}
