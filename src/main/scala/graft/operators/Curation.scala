package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation utilities a large-scale training-data pipeline
  * needs around the reference's retrieval core: reproducible sampling,
  * collocation statistics, and the skew diagnostics that decide when a
  * key needs salting.
  */
object Curation {

  /** Deterministic hash-split sampling: a document is in the sample iff
    * the first 4 hex chars of md5(doc_id) sort below the threshold
    * ("0ccc" ≈ 5%). Membership is a pure function of the id — no RNG
    * state, no shuffle, reproducible across engines and runs, and
    * stable under corpus growth (adding documents never flips an
    * existing one) — the standard way to carve train/eval splits at
    * 100 TB. The predicate is a narrow map evaluated inside the scan.
    */
  def hashSample(spark: SparkSession, dir: String, thresholdHex: String = "0ccc"): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 4))
      .where(col("bucket") < lit(thresholdHex))
      .select(col("doc_id"), col("bucket"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Top-N bigram collocations: adjacent-token pairs with raw corpus
    * counts (unlike Dedup.shingles these are NOT distinct-per-doc —
    * frequency is the point). One explode + one count aggregation with
    * map-side combine; the top-N goes through TakeOrderedAndProject.
    */
  def bigramFreq(spark: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
        .otherwise(array().cast("array<string>"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topN)
  }

  /** Key-skew diagnostic: per-key row counts for the heaviest keys,
    * with each key's share of the table and its multiple of the mean
    * key size. This is the report that decides salting / AQE skew-join
    * thresholds before a big join or aggregation ships at full scale.
    * Ratios are emitted as exact int/int double divisions (no rounding
    * — see SURVEY §4).
    */
  def keySkew(spark: SparkSession, dir: String, topN: Int = 10): DataFrame = {
    val sizes = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val tot = sizes.agg(
      sum(col("n_events")).as("total"),
      count(lit(1)).as("n_keys"))
    sizes.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n_events"), col("n_keys"),
        (col("n_events") / col("total")).as("share"),
        (col("n_events") / (col("total") / col("n_keys"))).as("skew_x"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(topN)
  }
}
