package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Scalar-quantized (SQ8) vector search — the Spark analog of FAISS's
  * IndexScalarQuantizer family (the memory-reduction sibling of the
  * reference's IVF index, reference app.py:360-440 trades recall for
  * speed the same way).
  *
  * Each float32 component is coded to an 8-bit level against the
  * global [min, max] of the corpus: a 64-dim vector shrinks 256 B →
  * 64 B, so at 100 TB the scan reads a quarter of the bytes and the
  * ranking dot product runs over small-integer arrays. Codes are
  * `floor((x - mn) / (mx - mn) * 256)` capped at 255 — floor (not
  * round) so the mapping is bit-deterministic in every engine — and
  * integer dot products of 64 codes ≤ 255 are exact in double, which
  * keeps the whole operator oracle-checkable.
  */
object Quantized {

  /** Corpus coded against its global component range. A degenerate
    * corpus (every component equal → mx == mn) codes to 0
    * deterministically instead of floor(NaN).
    */
  def sq8Codes(spark: SparkSession, dir: String): DataFrame = {
    val ed = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
    val stats = ed.agg(
      min(array_min(col("emb"))).as("mn"),
      max(array_max(col("emb"))).as("mx"))
    ed.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        transform(col("emb"),
          x => when(col("mx") > col("mn"),
            least(floor((x - col("mn")) / (col("mx") - col("mn")) * 256), lit(255.0)))
            .otherwise(lit(0.0)))
          .as("codes"))
  }

  /** Top-k by quantized dot product (asymmetric rerank left to the
    * exact operators — at scale SQ8 is the first-pass filter).
    */
  def sq8TopK(spark: SparkSession, dir: String, queryId: Long, k: Int): DataFrame = {
    val coded = sq8Codes(spark, dir)
    val qc = coded.where(col("vec_id") === queryId).select(col("codes").as("qcodes"))
    coded.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qc))
      .select(col("vec_id"), dotd(col("codes"), col("qcodes")).cast("long").as("score_q"))
      .orderBy(col("score_q").desc, col("vec_id"))
      .limit(k)
  }

  /** Johnson-Lindenstrauss random projection — the DIMENSION-reduction
    * sibling of SQ8's per-component compression: project each
    * embedding onto `outDim` fixed seed-42 gaussian directions (scaled
    * 1/√outDim, the JL normalization that approximately preserves
    * pairwise distances). A 64-dim float corpus shrinks 8× at
    * outDim=8 before any ANN indexing; the op itself is a pure
    * narrow map — outDim codegen'd VecDots per row, no shuffle, no
    * driver data. The projection directions ship as plan literals so
    * the same query is reproducible in any engine.
    */
  def randomProject(spark: SparkSession, dir: String, outDim: Int = 8): DataFrame = {
    val inDim = Lsh.embeddingDim(spark, dir)
    val planes = Lsh.hyperplaneArrays(outDim, inDim)
    val scale = math.sqrt(outDim.toDouble)
    val comps = planes.zipWithIndex.map { case (p, i) =>
      round(dotd(col("embedding"), typedlit(p)) / lit(scale), 5).as(s"p$i")
    }
    Tables.embeddings(spark, dir)
      .select(col("vec_id") +: comps: _*)
      .orderBy(col("vec_id"))
  }
}
