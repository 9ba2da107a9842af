package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
