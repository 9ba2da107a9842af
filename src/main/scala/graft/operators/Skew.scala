package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation utilities (SURVEY §5: "skewed keys → salting or AQE
  * skew-join"). AQE's skew-join handles sort-merge joins; salting is
  * the manual fallback for the cases AQE can't split — hash
  * aggregations on hot keys and broadcast-ineligible skewed joins.
  */
object Skew {

  /** Salted equi-join: the build side's hot keys are spread across
    * `nSalts` sub-keys. Probe rows get an arbitrary salt in
    * [0, nSalts) (round-robin via monotonically_increasing_id — the
    * value only routes, it never affects which rows match), the build
    * side is replicated once per salt, and the join key becomes
    * (key, salt) so one hot key shuffles to nSalts reducers instead of
    * one. Build-side replication costs nSalts× its size — use for
    * small-to-medium build sides against a skewed probe.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String, nSalts: Int): DataFrame = {
    val p = probe.withColumn("_salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val b = build.withColumn("_salt", explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    p.join(b, p(probeKey) === b(buildKey) && p("_salt") === b("_salt"))
      .drop(p("_salt")).drop(b("_salt"))
  }

  /** The events stream with a deliberately HOT join key: users below
    * `hotCut` keep their own bucket, everyone else collapses into
    * bucket `hotCut` — at sf0.1 that concentrates ~99% of rows on one
    * key, the shape AQE's skew-join split and [[saltedJoin]] exist
    * for. (The synthetic events table is near-uniform in user_id, so
    * the hot key is derived, not invented data.)
    */
  def hotKeyedEvents(spark: SparkSession, dir: String, hotCut: Long = 20L): DataFrame =
    Tables.events(spark, dir)
      // round-robin spread first: the test parquet is one split, and a
      // skewed reduce partition fed by a SINGLE mapper is unsplittable
      // for AQE (skew split divides a reducer's input by mapper
      // ranges) — multiple map outputs are what make the split possible
      .repartition(spark.sparkContext.defaultParallelism)
      .select(least(col("user_id"), lit(hotCut)).as("bucket"), col("value"))

  /** Tiny per-bucket dimension (bucket, segment label). */
  def bucketDim(spark: SparkSession, hotCut: Long = 20L): DataFrame =
    spark.range(0, hotCut + 1)
      .select(col("id").as("b_bucket"), concat(lit("seg_"), col("id")).as("segment"))

  /** Salted hot-key join + rollup — the oracle-checked demonstration
    * that salting never changes results: the skewed probe joins the
    * dimension through [[saltedJoin]] (hot bucket spread over nSalts
    * reducers), then aggregates per bucket. The plain-join/AQE
    * equivalence and the AQE skew-split plan are asserted in SkewSpec.
    */
  def saltedHotKeyRollup(spark: SparkSession, dir: String, nSalts: Int = 8): DataFrame =
    saltedJoin(hotKeyedEvents(spark, dir), bucketDim(spark), "bucket", "b_bucket", nSalts)
      .groupBy(col("bucket"), col("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("bucket"))
}
