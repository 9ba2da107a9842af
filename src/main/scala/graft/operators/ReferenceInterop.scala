package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** Operators that run against the reference's OWN artifacts (the CSVs
  * and embedding matrices under /root/reference) rather than the
  * synthetic parquet twin — the proof that a user of the reference
  * could point this engine at their existing files and keep working.
  * The byte-level sources live in [[graft.sources.NpySource]] /
  * [[graft.sources.FaissSource]]; this object holds the relational
  * reference pipelines.
  */
object ReferenceInterop {

  val ReviewsCsv = "/root/reference/reviews.csv"
  val ProductsCsv = "/root/reference/products.csv"

  private val reviewsSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("asins", StringType),
    StructField("brand", StringType),
    StructField("categories", StringType),
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("rating", DoubleType),
    StructField("combined_text", StringType)))

  private val productsSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("brand", StringType),
    StructField("categories", StringType),
    StructField("asins", StringType),
    StructField("n_reviews", LongType),
    StructField("example_text", StringType),
    StructField("avg_rating", DoubleType)))

  /** Rebuild products.csv's rollup columns FROM reviews.csv and
    * reconcile against the published artifact — the reference's build
    * pipeline (products.csv is derived from its reviews: n_reviews =
    * review count per product id, avg_rating = mean of the non-blank
    * ratings) re-run on the real input and audited row by row. A
    * `false` in either match column means the published artifact has
    * drifted from its own source — the receipt a data owner wants
    * before trusting a derived table. Blank ratings parse as NULL and
    * drop out of the mean on both engines; ratings are exact dyadic
    * halves, so the double sum is order-independent and the rounded
    * mean replays bit-for-bit. One groupBy over 1578 rows + a
    * broadcast join against the 66-row artifact.
    */
  def productRollupAudit(spark: SparkSession): DataFrame = {
    val rev = Sources.readCsv(spark, ReviewsCsv, reviewsSchema)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_reviews"),
        round(avg(col("rating")), 5).as("avg_rating"))
    val prod = Sources.readCsv(spark, ProductsCsv, productsSchema)
      .select(col("id"), col("n_reviews").as("pub_n_reviews"),
        round(col("avg_rating"), 5).as("pub_avg_rating"))
    rev.join(broadcast(prod), Seq("id"))
      .select(col("id"), col("n_reviews"), col("avg_rating"),
        col("pub_n_reviews"), col("pub_avg_rating"),
        (col("n_reviews") === col("pub_n_reviews")).as("n_reviews_match"),
        (col("avg_rating") === col("pub_avg_rating")).as("avg_rating_match"))
      .orderBy(col("id"))
  }

  /** Facet counts over the reference's real product metadata
    * (app.py:138 builds the brand selectbox from products.csv) —
    * the brand facet panel answered from the actual artifact.
    */
  def brandFacets(spark: SparkSession): DataFrame =
    Sources.readCsv(spark, ProductsCsv, productsSchema)
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_products"), sum(col("n_reviews")).as("n_reviews"))
      .orderBy(col("n_products").desc, col("brand"))
}
