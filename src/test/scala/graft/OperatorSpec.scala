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
}
