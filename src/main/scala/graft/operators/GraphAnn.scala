package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.sources.IndexStore

/** Graph-based approximate nearest-neighbor search — the NSW/HNSW
  * index family (Malkov & Yashunin 2018) the quantization families
  * ([[Ivf]], [[Lsh]], [[Quantized]]) don't cover: a build-once
  * neighbor GRAPH artifact plus a greedy best-first descent at query
  * time. The engine's variant is deliberately deterministic so the
  * whole search carries a hard SQL oracle (no RNG level assignment,
  * no insertion-order dependence — the two things that make stock
  * HNSW non-replayable):
  *
  *   - the graph is the exact top-`g` cosine neighbor list per node
  *     (ties on the 5-decimal-rounded score break to the lower id),
  *     persisted once per (corpus, g) via [[IndexStore]] like every
  *     other index artifact;
  *   - search enters at the lowest vec id and runs `hops` beam steps
  *     (NSW ef-search): the next frontier is the top-`beam` of
  *     frontier ∪ neighbors(frontier) by rounded query-cosine (ties →
  *     lower id). Keeping the frontier inside its own candidate set
  *     makes the frontier's best score non-decreasing, so the walk
  *     CONVERGES instead of oscillating;
  *   - the answer is an exact rerank of the VISITED set (entry +
  *     every neighbor list inspected) — standard beam-search output.
  *
  * Scale shape: the build takes its candidate pairs from the SAME
  * banded-LSH blocking as [[Dedup.embeddingNearDupLsh]] (adaptive
  * band width keeps bucket occupancy ~constant, so candidate volume
  * is linear in the corpus, never n²), verifies them with one exact
  * cosine pass, and keeps top-g per node via a per-src
  * WindowGroupLimit — the NSW insert loop re-expressed as one
  * deterministic bulk job. Isolated nodes (no bucket collision under
  * the occupancy cap) get no out-edges — the same documented-miss
  * contract as the LSH searcher. The walk itself is driver-side probe
  * PLANNING over O(beam·g)-row lookups (the [[Ivf.rankCells]]
  * precedent — FAISS also walks its graph in the coordinator); the
  * final rerank is a distributed scan of the ≤ 1+hops·beam·g visited
  * ids.
  */
object GraphAnn {

  /** The corpus's fingerprint-addressed graph path for (dir, g). */
  def indexPath(spark: SparkSession, dir: String, g: Int): String =
    IndexStore.indexPath(spark, "nsw_v3", s"$dir/embeddings.parquet", g.toString)

  /** Build the top-g neighbor graph from LSH-blocked candidates:
    * (src, dst, score, rk) with score = round(cos, 5) and rk 1..g by
    * (score DESC, dst), candidates symmetrized from the banded-LSH
    * verified pairs (linear candidate volume — the 100 TB shape).
    */
  def buildGraph(spark: SparkSession, dir: String, g: Int): DataFrame = {
    val vp = Dedup.lshVerifiedPairs(spark, dir, nBands = 32,
      bitsPerBand = 6, bucketCap = 1000L)
    val sym = vp.select(col("a_id").as("src"), col("b_id").as("dst"), col("score"))
      .unionByName(vp.select(col("b_id").as("src"), col("a_id").as("dst"), col("score")))
    val wk = Window.partitionBy(col("src")).orderBy(col("score").desc, col("dst"))
    sym.withColumn("rk", row_number().over(wk).cast("long"))
      .where(col("rk") <= g)
  }

  /** The persisted graph, building it first if absent. Edges live
    * under `edges/epoch=base` so maintenance batches
    * ([[appendToGraph]]) commit as sibling epoch dirs with one atomic
    * rename — the [[Ivf.appendToIndex]] layout.
    */
  def ensureGraph(spark: SparkSession, dir: String, g: Int): DataFrame = {
    val path = indexPath(spark, dir, g)
    IndexStore.publish(spark, path) { tmp =>
      buildGraph(spark, dir, g).repartition(1)
        .write.mode("overwrite").parquet(s"$tmp/edges/epoch=base")
    }
    IndexStore.open(spark, s"$path/edges")
  }

  /** The searchable vector set: the base corpus plus every appended
    * batch (id-deduped — re-appending an id must not double it in a
    * rerank).
    */
  def vectors(spark: SparkSession, dir: String, g: Int): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val vdir = s"${indexPath(spark, dir, g)}/vectors"
    if (IndexStore.exists(spark, vdir))
      base.unionByName(IndexStore.open(spark, vdir)
        .select(col("vec_id"), col("label"), col("embedding")))
        .dropDuplicates("vec_id")
    else base
  }

  /** Incremental NSW insert — FAISS `index.add()` for the graph
    * family: each new vector gets its top-g list against the CURRENT
    * searchable set (one broadcast batch×corpus scan — volume ∝
    * batch, never corpus², the [[Dedup]] incremental shape), and each
    * of its edges also commits REVERSED as a backlink, which is what
    * makes the new node reachable by a beam entering from the old
    * graph (stock NSW's bidirectional insert). Both the edge batch
    * and the vector batch commit as atomic epoch dirs. Old nodes'
    * top-g lists are not re-trimmed — degrees grow with appends until
    * a rebuild, the standard graph-index maintenance trade (rebuild
    * cadence is policy, not an operator constraint).
    */
  def appendToGraph(spark: SparkSession, dir: String, g: Int,
                    newVectors: DataFrame): Unit = {
    val path = indexPath(spark, dir, g)
    ensureGraph(spark, dir, g)
    val ex = vectors(spark, dir, g).withColumn("nrm", l2norm(col("embedding")))
    val nv = newVectors
      .select(col("vec_id").as("n_vid"), col("embedding").as("n_emb"),
        l2norm(col("embedding")).as("n_nrm"))
    val wk = Window.partitionBy(col("src")).orderBy(col("score").desc, col("dst"))
    val newEdges = ex.join(broadcast(nv), col("vec_id") =!= col("n_vid"))
      .select(col("n_vid").as("src"), col("vec_id").as("dst"),
        round(dotd(col("embedding"), col("n_emb")) /
          (col("nrm") * col("n_nrm")), 5).as("score"))
      .withColumn("rk", row_number().over(wk).cast("long"))
      .where(col("rk") <= g)
    val back = newEdges.select(col("dst").as("src"), col("src").as("dst"),
      col("score"), lit(0L).as("rk"))
    val eStage = IndexStore.stageEpochPath(s"$path/edges", "add")
    newEdges.unionByName(back).repartition(1).write.parquet(eStage)
    IndexStore.commitEpoch(spark, s"$path/edges", eStage)
    val vStage = IndexStore.stageEpochPath(s"$path/vectors", "add")
    newVectors.select(col("vec_id"), col("label"), col("embedding"))
      .repartition(1).write.parquet(vStage)
    IndexStore.commitEpoch(spark, s"$path/vectors", vStage)
  }

  /** HALF_UP at 5 decimals — the engines' shared round() convention,
    * applied to the driver-side walk scores so the greedy decisions
    * match the SQL replay bit-for-bit.
    */
  private def r5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Beam graph descent + exact rerank of the visited set. */
  def graphTopK(spark: SparkSession, dir: String, queryId: Long,
                g: Int = 8, hops: Int = 6, beam: Int = 4,
                k: Int = 10): DataFrame = {
    val graph = ensureGraph(spark, dir, g)
    val emb = vectors(spark, dir, g)
    val qv = emb.where(col("vec_id") === queryId)
      .select(col("embedding")).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"query vector $queryId not found in $dir/embeddings.parquet"))
      .getSeq[Float](0).toArray
    // left-to-right double accumulation — bit-identical to VecDot
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val qn = math.sqrt(dot(qv, qv))
    def qcos(v: Array[Float]): Double =
      r5(dot(qv, v) / (math.sqrt(dot(v, v)) * qn))
    val entry = emb.where(col("vec_id") =!= queryId)
      .agg(min(col("vec_id"))).head.getLong(0)
    val entryScore = qcos(emb.where(col("vec_id") === entry)
      .select(col("embedding")).head.getSeq[Float](0).toArray)
    var frontier = Vector((entry, entryScore))
    val visited = scala.collection.mutable.LinkedHashSet(entry)
    var hop = 0
    var converged = false
    while (hop < hops && !converged) {
      // one O(beam·g)-row lookup: the frontier's neighbor lists with
      // their embeddings
      val nbrs = graph.where(col("src").isin(frontier.map(_._1): _*))
        .join(emb.select(col("vec_id").as("dst"), col("embedding")), "dst")
        .select(col("dst"), col("embedding")).distinct().collect()
        .map(r => (r.getLong(0), qcos(r.getSeq[Float](1).toArray)))
      visited ++= nbrs.map(_._1)
      // next frontier: top-beam of frontier ∪ neighbors by rounded
      // score DESC, id ASC (the frontier stays a candidate, so its
      // best score never decreases)
      val next = (frontier ++ nbrs).distinctBy(_._1)
        .sortBy { case (id, s) => (-s, id) }.take(beam)
      converged = next.map(_._1).toSet == frontier.map(_._1).toSet
      frontier = next
      hop += 1
    }
    // distributed exact rerank of the visited set, query excluded
    import spark.implicits._
    val qid = broadcast(Seq(queryId).toDF("q_id"))
    val wk = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    emb.where(col("vec_id").isin(visited.toSeq: _*))
      .where(col("vec_id") =!= queryId)
      .crossJoin(qid)
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(dotd(col("embedding"), typedlit(qv)) /
          (l2norm(col("embedding")) * lit(qn)), 5).as("score"))
      .withColumn("rk", row_number().over(wk).cast("long"))
      .where(col("rk") <= k)
      .select(col("n_id"), col("score"), col("rk"))
      .orderBy(col("rk"))
  }
}
