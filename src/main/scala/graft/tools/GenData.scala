package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for bench-only datasets: tiles the driver's
  * deterministic testdata (TESTDATA.md) `copies`× with key shifting
  * and content perturbation, so shuffle/join growth can be MEASURED at
  * 10× and 100× instead of asserted from plans. Bench-only: the
  * DuckDB correctness gate still runs exclusively against the
  * driver's own sf0.01 tables.
  *
  * Perturbations keep each copy's INTERNAL structure identical to the
  * source while decorrelating copies from each other — the growth
  * profile a real 10× corpus would have:
  *   - ids shift by copy × (max+1) per key family; `documents` and
  *     `embeddings` share one offset so doc_id = vec_id joins survive;
  *   - document tokens get a per-copy suffix (`the` → `the_c3`), so
  *     shingle/term statistics replicate per copy without cross-copy
  *     near-duplicate pairs (10 tiled verbatim copies would grow the
  *     dedup pair count 100×, benchmarking the DATA not the engine);
  *   - embeddings rotate by copy index — a norm- and
  *     geometry-preserving permutation that decorrelates copies;
  *   - events shift ids only: `props.$.k` item refs stay in copy 0's
  *     id range, which the recommendation path reads as a user base
  *     10× wider over the same catalog slice.
  *
  * Usage: GenData <srcDir> <dstDir> <copies>
  */
object GenData {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenData <srcDir> <dstDir> <copies>")
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    require(copies >= 1 && copies <= 128, s"copies must be in [1, 128]: $copies")
    val spark = SparkSession.builder()
      .appName("graft-gendata")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try generate(spark, src, dst, copies) finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String, files: Int): Unit =
      df.coalesce(files).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    def maxOf(df: DataFrame, c: String): Long = df.agg(max(col(c))).head().getLong(0) + 1L

    // dimension tables pass through untiled (at any real scale these
    // stay broadcast-sized)
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    val customer = rd("customer")
    val orders = rd("orders")
    val part = rd("part")
    val supplier = rd("supplier")
    val documents = rd("documents")
    val embeddings = rd("embeddings")
    val events = rd("events")
    val kCust = maxOf(customer, "c_custkey")
    val kOrd = maxOf(orders, "o_orderkey")
    val kPart = maxOf(part, "p_partkey")
    val kSupp = maxOf(supplier, "s_suppkey")
    // one id space for doc_id = vec_id joins
    val kDoc = math.max(maxOf(documents, "doc_id"), maxOf(embeddings, "vec_id"))
    val kEvent = maxOf(events, "event_id")
    val kUser = maxOf(events, "user_id")
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)

    def tiled(df: DataFrame, perCopy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(c => perCopy(df, c)).reduce(_ unionByName _)

    def shift(df: DataFrame, c: Int, keys: (String, Long)*): DataFrame =
      keys.foldLeft(df) { case (d, (k, span)) =>
        d.withColumn(k, (col(k) + lit(c * span)).cast("long"))
      }

    wr(tiled(customer, (d, c) => shift(d, c, "c_custkey" -> kCust)), "customer", copies)
    wr(tiled(supplier, (d, c) => shift(d, c, "s_suppkey" -> kSupp)), "supplier", copies)
    wr(tiled(part, (d, c) => shift(d, c, "p_partkey" -> kPart)), "part", copies)
    wr(tiled(orders, (d, c) =>
      shift(d, c, "o_orderkey" -> kOrd, "o_custkey" -> kCust)), "orders", copies)
    wr(tiled(rd("lineitem"), (d, c) =>
      shift(d, c, "l_orderkey" -> kOrd, "l_partkey" -> kPart, "l_suppkey" -> kSupp)),
      "lineitem", copies)

    wr(tiled(documents, (d, c) => {
      val suffixed =
        if (c == 0) d
        else d.withColumn("text",
          array_join(transform(split(col("text"), " "), t => concat(t, lit(s"_c$c"))), " "))
      shift(suffixed, c, "doc_id" -> kDoc)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }), "documents", copies)

    wr(tiled(embeddings, (d, c) => {
      // rotation has only `dim` distinct values — copies past dim
      // additionally flip signs (cosine −1 to their rotation twin, so
      // still no cross-copy near-dup pairs at positive thresholds)
      val rot = c % dim
      val rotated =
        if (rot == 0) d
        else d.withColumn("embedding",
          concat(slice(col("embedding"), rot + 1, dim - rot), slice(col("embedding"), 1, rot)))
      val signed =
        if (c / dim % 2 == 0) rotated
        else rotated.withColumn("embedding",
          expr("cast(transform(embedding, x -> -x) as array<float>)"))
      shift(signed, c, "vec_id" -> kDoc)
    }), "embeddings", copies)

    wr(tiled(events, (d, c) =>
      shift(d, c, "event_id" -> kEvent, "user_id" -> kUser)), "events", copies)
  }
}
