package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB scale-mode switch. Several operators compute exact
  * interpolated percentiles (`percentile` ≡ DuckDB `quantile_cont` —
  * the oracle-parity default, which holds per-group value counts in
  * the aggregation buffer) or exact `count(DISTINCT …)` (which
  * shuffles the key universe). Their scaladocs have always documented
  * `approx_percentile` (t-digest, bounded memory) and HLL++
  * (`approx_count_distinct`, constant sketch) as the drop-ins past
  * the scale where exact state fits; `spark.graft.scale.approx=true`
  * makes that swap REAL instead of a comment: same queries, same
  * schemas, bounded aggregation state. OperatorSpec runs both paths
  * under one spec — approx percentiles must be true order statistics
  * within the sketch's rank-error bound of the exact value, HLL
  * counts within its published relative error.
  *
  * The flag is read at plan-build time from the session conf, so one
  * session can build both paths (set → build → unset) and the oracle
  * gate always runs with the flag off.
  */
object Scale {

  def approxOn(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.scale.approx").exists(_.equalsIgnoreCase("true"))

  /** `percentile(value, prob)` or its bounded-memory twin
    * `approx_percentile(value, prob, accuracy)` under the flag —
    * rank error ≤ rows/accuracy. Cast to double so the output schema
    * is identical on both paths (approx returns the input's integer
    * type; exact interpolation always returns double).
    */
  def pct(spark: SparkSession, valueExpr: String, probExpr: String,
          accuracy: Int = 10000): Column =
    (if (approxOn(spark)) expr(s"approx_percentile($valueExpr, $probExpr, $accuracy)")
     else expr(s"percentile($valueExpr, $probExpr)")).cast("double")

  /** The array-of-probabilities variant of [[pct]]. */
  def pctArray(spark: SparkSession, valueExpr: String, probsExpr: String,
               accuracy: Int = 10000): Column =
    (if (approxOn(spark)) expr(s"approx_percentile($valueExpr, $probsExpr, $accuracy)")
     else expr(s"percentile($valueExpr, $probsExpr)")).cast("array<double>")

  /** `count(DISTINCT c)` or HLL++ `approx_count_distinct(c, rsd)`
    * under the flag — relative error ≤ rsd with constant sketch
    * memory, mergeable across shards.
    */
  def distinctCount(spark: SparkSession, c: Column, rsd: Double = 0.02): Column =
    if (approxOn(spark)) approx_count_distinct(c, rsd) else countDistinct(c)
}
