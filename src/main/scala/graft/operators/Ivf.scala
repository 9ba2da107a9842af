package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest-neighbor index — the Spark
  * re-expression of the reference's FAISS IVF index
  * (faiss_reviews_ivf.index; searched at app.py:383-414 with an nprobe
  * sweep; evaluated in ann_tradeoff_table.csv).
  *
  * Build: k-means (MLlib, fixed seed) fits the coarse quantizer on the
  * corpus; every vector is assigned to its nearest centroid's cell.
  * At 100 TB the fit runs on a sample and the assignment is one narrow
  * map against broadcast centroids; the cell id becomes a partition
  * key, so a probe reads only nprobe/nCells of the data —
  * partition-pruned ANN.
  *
  * Search: queries × centroids (both tiny, broadcast) ranks cells per
  * query; candidates are fetched by cell equi-join and scored exactly.
  */
object Ivf {

  /** Corpus with a `cell` column (nearest-centroid id) plus the
    * centroid table (cell, centroid array<double>).
    */
  def buildIndex(spark: SparkSession, dir: String, nCells: Int): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(spark, dir)
    val fe = e.withColumn("features", array_to_vector(col("embedding"))).cache()
    // random init + bounded iterations: the coarse quantizer only needs
    // rough cells, and k-means|| init costs several extra Spark jobs
    val model = new KMeans().setK(nCells).setSeed(42)
      .setInitMode("random").setMaxIter(10).setTol(1e-4)
      .setFeaturesCol("features").setPredictionCol("cell").fit(fe)
    val assigned = model.transform(fe)
      .select(col("vec_id"), col("label"), col("embedding"),
        l2norm(col("embedding")).as("nrm"), col("cell"))
      .cache()
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("cell", "centroid")
    (assigned, centroids)
  }

  /** Batch IVF search: for each query row (q_id, qv), rank centroids,
    * keep nprobe cells, score candidates in those cells, return top-k
    * per query.
    */
  def search(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
             nprobe: Int, k: Int): DataFrame = {
    val wc = Window.partitionBy(col("q_id")).orderBy(col("cdist").desc, col("cell"))
    val probed = queries
      .withColumn("qn", l2norm(col("qv")))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col("qv"), col("centroid")))
      .withColumn("crk", row_number().over(wc))
      .where(col("crk") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("cell"))
    val wk = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    assigned.join(probed, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("cell").cast("long").as("cell"),
        round(dotd(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 5).as("score"))
      .withColumn("rk", row_number().over(wk).cast("long"))
      .where(col("rk") <= k)
  }

  /** Persist an IVF index as two parquet tables — the engine's analog
    * of the reference's faiss_*.index artifacts, but splittable and
    * cell-partitioned so a probe at 100 TB touches only the probed
    * cells' files (partition pruning on `cell`).
    */
  def saveIndex(assigned: DataFrame, centroids: DataFrame, path: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/cells"), spark.read.parquet(s"$path/centroids"))

  /** Single-query IVF top-k (the reference's interactive ANN demo). */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long, nCells: Int,
              nprobe: Int, k: Int): DataFrame = {
    val (assigned, centroids) = buildIndex(spark, dir, nCells)
    val q = assigned.where(col("vec_id") === queryId)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    search(assigned, centroids, q, nprobe, k)
      .select(col("n_id"), col("cell"), col("score"), col("rk"))
      .orderBy(col("rk"))
  }

  /** ANN trade-off evaluation (reference ann_tradeoff_table.csv):
    * recall@k and MRR of IVF vs the exact flat search over a sampled
    * query batch, for each nprobe in the sweep.
    */
  def recallEval(spark: SparkSession, dir: String, nCells: Int, queryMod: Int,
                 k: Int, nprobes: Seq[Int]): DataFrame = {
    val (assigned, centroids) = buildIndex(spark, dir, nCells)
    val queries = assigned.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val gt = VectorSearch.knnJoin(spark, dir, queryMod, k)
      .select(col("q_id"), col("n_id"), col("rk")).cache()
    val gt1 = gt.where(col("rk") === 1).select(col("q_id"), col("n_id"))
    val nq = queries.count().toDouble
    nprobes.map { np =>
      val res = search(assigned, centroids, queries, np, k)
        .select(col("q_id"), col("n_id"), col("rk")).cache()
      val hits = res.join(gt, Seq("q_id", "n_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      val rr = gt1.join(res.select(col("q_id"), col("n_id"), col("rk")), Seq("q_id", "n_id"))
        .select(col("q_id"), (lit(1.0) / col("rk")).as("rr"))
      val recall = hits.agg((sum(col("n_hits")) / (nq * k)).as("recall"))
      val mrr = rr.agg((sum(col("rr")) / nq).as("mrr"))
      recall.crossJoin(mrr).select(
        lit(np).as("nprobe"),
        round(col("recall"), 5).as("recall_at_k"),
        round(col("mrr"), 5).as("mrr"),
        lit(nq.toLong).as("n_queries"))
    }.reduce(_ unionAll _).orderBy(col("nprobe"))
  }
}
