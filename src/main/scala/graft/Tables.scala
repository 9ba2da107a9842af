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

  /** Warm-serving registry — the engine's analog of the reference's
    * cached resources (app.py:63-102 `st.cache_resource`/`st.cache_data`
    * keep the matrices and frames resident between interactions): a
    * long-lived serving session calls [[warm]] once, and every
    * operator that reads a warmed (dir, table) pair — all of them go
    * through [[table]] — plans an InMemoryTableScan instead of a file
    * scan, so repeat queries never touch storage. Entries are
    * per-session; sessions that stopped are evicted lazily.
    */
  private val warmed = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Persist + materialize `names` under (spark, dir); idempotent. */
  def warm(spark: SparkSession, dir: String, names: Seq[String]): Unit = {
    val it = warmed.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    names.foreach { n =>
      warmed.computeIfAbsent((spark, dir, n), { _ =>
        val df = spark.read.parquet(s"$dir/$n.parquet").persist()
        df.count() // materialize now: serving latency should not pay the first-touch build
        df
      })
    }
  }

  /** Unpersist and drop every warmed table of this session. */
  def cool(spark: SparkSession): Unit = {
    val it = warmed.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) { e.getValue.unpersist(); it.remove() }
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val hit = warmed.get((spark, dir, name))
    if (hit != null) hit else spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events.ts has shipped in three parquet representations across driver
    * regenerations: TIMESTAMP(NANOS) (surfaces as epoch-nanos LongType
    * under `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS)
    * adjusted-to-UTC (Spark TimestampType), and TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (Spark TIMESTAMP_NTZ). Expose a stable
    * epoch-millis column `ts_ms` (integer `div` for nanos — no double
    * round-trip, epoch nanos exceed 2^53) so downstream results are
    * oracle-comparable (DuckDB `epoch_ms`) under all three. For NTZ the
    * session TZ is pinned UTC in every entrypoint, so casting NTZ →
    * TIMESTAMP reinterprets the wall-clock as UTC, matching DuckDB's
    * naive-timestamp epoch semantics.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(spark, dir, "events")
    val tsMs = df.schema("ts").dataType match {
      case LongType            => expr("ts div 1000000")
      case _: TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
      case _                   => unix_millis(col("ts"))
    }
    df.withColumn("ts_ms", tsMs.cast("long"))
  }
}
