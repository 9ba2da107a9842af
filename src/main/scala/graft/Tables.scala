package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Maps the reference's data model (products.csv / reviews.csv /
  * *_embeddings.npy in /root/reference) onto the synthetic star schema:
  * `documents` plays reviews, `embeddings` plays the embedding matrices
  * (doc_id = vec_id), `events` plays the review/interaction stream.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects unless `spark.sql.legacy.parquet.nanosAsLong` is set (then
    * it surfaces as epoch-nanos LongType). Expose a stable epoch-millis
    * column `ts_ms` (integer `div`, no double round-trip — epoch nanos
    * exceed 2^53) so downstream results are oracle-comparable (DuckDB
    * `epoch_ms`) under either representation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    val tsMs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts"))
    }
    df.withColumn("ts_ms", tsMs.cast("long"))
  }
}
