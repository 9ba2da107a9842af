package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** TF-IDF retrieval and hybrid (vector + keyword) search.
  *
  * Reimplements the reference's sklearn TfidfVectorizer semantics
  * (reference tfidf_vectorizer.joblib; idf = ln((1+N)/(1+df)) + 1 with
  * L2-normalized rows — sklearn's smooth_idf default) as pure
  * DataFrame aggregations, and the hybrid blend
  * `alpha·vec + (1-alpha)·minmax(tfidf)` of reference app.py:190-219.
  *
  * Scale: documents are kept as sparse (doc_id, term, weight) triples —
  * never a dense vocab-width vector — so memory is O(tokens), the
  * df/idf pass is one shuffle keyed by term, and query scoring joins
  * only the query's terms (a broadcast of |q| rows) against the
  * triples.
  */
object TextRetrieval {

  /** Sparse TF-IDF model: weights (doc_id, term, w), per-doc L2 norms
    * (doc_id, nrm), document frequencies (term, df), corpus size (n).
    */
  case class TfidfModel(w: DataFrame, norms: DataFrame, dfT: DataFrame, n: DataFrame)

  /** sklearn-vectorizer tokenization (the reference's
    * tfidf_vectorizer.joblib defaults: lowercase=True, token_pattern
    * r"(?u)\b\w\w+\b"): lowercase, then every maximal word-char run of
    * length ≥ 2 — 1-char tokens like "a" are dropped. Expressed as
    * `[a-z0-9_]+` runs + a length filter, which equals the \b\w\w+\b
    * pattern over ASCII text and evaluates identically in Spark (Java
    * regex) and the DuckDB oracle (RE2), where \b/\w unicode semantics
    * would diverge.
    */
  def sklearnTokens(c: Column): Column =
    filter(regexp_extract_all(lower(c), lit("[a-z0-9_]+"), lit(0)),
      t => length(t) >= 2)

  /** Sklearn-style TF-IDF weights (smooth idf, raw tf, L2 norm).
    *
    * One explode pass total: `df` is derived from the (doc, term)
    * aggregate — the count of docs a term appears in is just its row
    * count in `tf` — so the raw term stream is shuffled once (with
    * map-side combine) and never re-read. `tf` and `w` are cached
    * because both the norm pass and query scoring reuse them (at
    * cluster scale this is the checkpoint you'd persist as the fitted
    * model artifact, like the reference's tfidf_matrix.joblib).
    */
  def tfidfWeights(docs: DataFrame): TfidfModel = {
    val terms = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(sklearnTokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).cache()
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df")).cache()
    val n = docs.agg(count(lit(1)).as("n"))
    // AQE sees dfT's runtime size (vocab << corpus) and broadcasts it
    val w = tf.join(dfT, "term").crossJoin(broadcast(n))
      .withColumn("w", col("tf") * (log((col("n") + 1) / (col("df") + 1)) + 1))
      .select("doc_id", "term", "w")
      .cache()
    val norms = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    TfidfModel(w, norms, dfT, n)
  }

  /** Vocabulary statistics — the reference's fitted-vectorizer artifact
    * (tfidf_vectorizer.joblib: vocabulary_, document frequencies, idf_)
    * as a queryable table. Distinct-count per term is the standard
    * skew-safe two-phase rewrite: distinct (term, doc) pairs first,
    * then count — no giant per-key state on hot terms.
    */
  def vocabStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(sklearnTokens(col("text"))).as("term"))
    // one explode pass: per-(term, doc) counts first (map-side combine
    // shrinks the exploded stream before it shuffles), then df = row
    // count and tf_total = count sum per term — no second scan, no
    // countDistinct expansion
    val perDoc = terms.groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
    val stats = perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tf_total"))
    val n = docs.agg(count(lit(1)).as("n"))
    stats.crossJoin(broadcast(n))
      .select(col("term"), col("df"), col("tf_total"),
        round(log((col("n") + 1) / (col("df") + 1)) + 1, 5).as("idf"))
      .orderBy(col("df").desc, col("term"))
  }

  /** Keyword search: score = cosine(tfidf(query), tfidf(doc)), top-k.
    * Reference app.py:202-204 (tfidf_vec.transform + cosine_similarity).
    */
  def tfidfTopK(spark: SparkSession, dir: String, queryTerms: Seq[String], k: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val TfidfModel(w, norms, dfT, n) = tfidfWeights(docs)
    import spark.implicits._
    val q = queryTerms.distinct.toDF("term")
    // query weights: tf=1 per distinct term → weight = idf(term)
    val qw = q.join(dfT, Seq("term"), "inner").crossJoin(broadcast(n))
      .withColumn("qw", log((col("n") + 1) / (col("df") + 1)) + 1)
      .select("term", "qw")
    val qn = qw.agg(sqrt(sum(col("qw") * col("qw"))).as("qn"))
    w.join(broadcast(qw), "term")
      .join(norms, "doc_id")
      .crossJoin(broadcast(qn))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w") / col("nrm") * col("qw") / col("qn")), 5).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Free-text hybrid search — the reference's ACTUAL interactive path
    * (app.py:190-219: the query is text typed by a user; app.py:169-171
    * embeds it, tfidf_vec.transform() vectorizes it): the caller
    * supplies the externally produced embedding `qv` plus the query's
    * tokens, and the engine blends
    * `alpha·cos(e_d, qv) + (1-alpha)·minmax(tfidfcos(d, q))`.
    * Query-side TF-IDF weights are idf(term) (tf=1 per distinct term),
    * L2-normalized, exactly sklearn's transform of a short query.
    */
  def hybridTopKFree(spark: SparkSession, dir: String, qv: Array[Float],
                     queryTerms: Seq[String], alpha: Double, k: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val TfidfModel(w, norms, dfT, n) = tfidfWeights(docs)
    import spark.implicits._
    val q = queryTerms.distinct.toDF("term")
    val qw = q.join(dfT, Seq("term"), "inner").crossJoin(broadcast(n))
      .withColumn("qw", log((col("n") + 1) / (col("df") + 1)) + 1)
      .select("term", "qw")
    val qn = qw.agg(sqrt(sum(col("qw") * col("qw"))).as("qn"))
    val ts = w.join(broadcast(qw), "term")
      .join(norms, "doc_id")
      .crossJoin(broadcast(qn))
      .groupBy(col("doc_id"))
      .agg(sum(col("w") / col("nrm") * col("qw") / col("qn")).as("ts"))
    val qvLit = typedlit(qv)
    val cand = e
      .select(col("vec_id").as("doc_id"),
        (dotd(col("embedding"), qvLit) / (l2norm(col("embedding")) * l2norm(qvLit))).as("vs"))
      .join(ts, Seq("doc_id"), "left")
      .withColumn("ts", coalesce(col("ts"), lit(0.0)))
    val stats = cand.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    cand.crossJoin(broadcast(stats))
      .withColumn("tn", when(col("mx") > col("mn"),
        (col("ts") - col("mn")) / (col("mx") - col("mn") + lit(1e-12))).otherwise(col("ts")))
      .select(
        col("doc_id"),
        round(col("vs") * alpha + col("tn") * (1 - alpha), 5).as("hybrid_score"),
        round(col("vs"), 5).as("vector_score"),
        round(col("tn"), 5).as("tfidf_score"))
      .orderBy(col("hybrid_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid "more-like-this": query = one document (its embedding for
    * the vector leg, its TF-IDF vector for the keyword leg).
    * final = alpha·cos(e_d, e_q) + (1-alpha)·minmax(tfidfcos(d, q)),
    * exactly reference app.py:190-219 (including the max>min guard and
    * the 1e-12 denominator epsilon).
    */
  def hybridTopK(spark: SparkSession, dir: String, queryDoc: Long, alpha: Double, k: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val TfidfModel(w, norms, _, _) = tfidfWeights(docs)
    val wn = w.join(norms, "doc_id")
      .select(col("doc_id"), col("term"), (col("w") / col("nrm")).as("wn"))
      .cache()
    val qv = wn.where(col("doc_id") === queryDoc).select(col("term"), col("wn").as("qwn"))
    val tscore = wn.where(col("doc_id") =!= queryDoc)
      .join(broadcast(qv), "term")
      .groupBy("doc_id").agg(sum(col("wn") * col("qwn")).as("ts"))
    val qe = e.where(col("vec_id") === queryDoc).select(col("embedding").as("qemb"))
    val cand = e.where(col("vec_id") =!= queryDoc).crossJoin(broadcast(qe))
      .select(col("vec_id").as("doc_id"), cosine(col("embedding"), col("qemb")).as("vs"))
      .join(tscore, Seq("doc_id"), "left")
      .withColumn("ts", coalesce(col("ts"), lit(0.0)))
    val stats = cand.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
    cand.crossJoin(broadcast(stats))
      .withColumn("tn", when(col("mx") > col("mn"),
        (col("ts") - col("mn")) / (col("mx") - col("mn") + lit(1e-12))).otherwise(col("ts")))
      .select(
        col("doc_id"),
        round(col("vs") * alpha + col("tn") * (1 - alpha), 5).as("hybrid_score"),
        round(col("vs"), 5).as("vector_score"),
        round(col("tn"), 5).as("tfidf_score"))
      .orderBy(col("hybrid_score").desc, col("doc_id"))
      .limit(k)
  }
}
