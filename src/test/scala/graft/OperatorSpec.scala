package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage: every SparkEntry query runs at sf0.001 and returns
  * rows. Detailed semantics are covered per-operator in the other
  * suites; hash-level correctness is the DuckDB oracle's job
  * (scripts/check.py + the driver gate).
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("cohort retention pins offset 0 at 1.0 and stays a valid fraction") {
    val rows = graft.operators.Analytics.retention(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, nActive, nCohort, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(off >= 0L && nActive <= nCohort && ret > 0.0 && ret <= 1.0, r.toString)
      if (off == 0L) assert(ret == 1.0, s"cohort week itself must retain everyone: $r")
    }
    // every cohort has its offset-0 row (the cohort definition)
    val byCohort = rows.groupBy(_.getLong(0))
    assert(byCohort.values.forall(_.exists(_.getLong(1) == 0L)))
  }
}
