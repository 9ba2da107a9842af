package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Skew mitigation, both ways the engine offers it (SURVEY §5):
  * manual salting (results must be identical to the plain join) and
  * AQE's skew-join split (the runtime re-plan must actually fire on a
  * hot key).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plainRollup = {
    val ev = Skew.hotKeyedEvents(spark, TestSpark.sf)
    ev.join(Skew.bucketDim(spark), col("bucket") === col("b_bucket"))
      .groupBy(col("bucket"), col("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
  }

  test("salted join matches the plain join row-for-row") {
    val plain = plainRollup.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val salted = Skew.saltedHotKeyRollup(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salting spreads the hot key: join keys carry the salt column") {
    val p = Skew.saltedJoin(Skew.hotKeyedEvents(spark, TestSpark.sf),
        Skew.bucketDim(spark), "bucket", "b_bucket", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p.take(1000))
  }

  test("AQE splits the skewed partition of the plain shuffled join") {
    // tiny thresholds so the 1000-row test slice still qualifies as
    // skewed; broadcast off so the join actually shuffles both sides
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ev = Skew.hotKeyedEvents(spark, TestSpark.sf)
      val joined = ev.join(Skew.bucketDim(spark), col("bucket") === col("b_bucket"))
      // execute THIS dataset's QueryExecution — count() would plan and
      // adapt a separate one, leaving joined's plan unexecuted
      assert(joined.collect().length == ev.count().toInt, "inner join keeps every event row")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.toLowerCase.contains("skewed"),
        "AQE must mark the hot partition as skewed:\n" + finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
