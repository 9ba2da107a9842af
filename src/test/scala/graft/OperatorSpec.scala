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

  test("as-of join matches a driver replay of strictly-earlier views") {
    import org.apache.spark.sql.functions.col
    val evs = Tables.events(spark, TestSpark.sf)
      .select("event_id", "user_id", "ts_ms", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val viewsByUser = evs.filter(_._4 == "view").groupBy(_._2)
      .map { case (u, vs) => u -> vs.map(_._3).sorted }
    val got = graft.operators.Analytics.eventsAsOf(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    val purchases = evs.filter(_._4 == "purchase")
    assert(got.length == purchases.length, "one row per purchase (left join)")
    got.foreach { r =>
      val (user, ts) = (r.getLong(1), r.getLong(2))
      val want = viewsByUser.getOrElse(user, Array.empty[Long])
        .takeWhile(_ < ts).lastOption
      val gotView = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(gotView == want, s"purchase ${r.getLong(0)} user $user")
      if (gotView.isDefined) assert(r.getLong(4) == ts - gotView.get)
    }
  }

  test("approx_count_distinct stays within 5% of exact (HLL++, default rsd)") {
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val row = Tables.events(spark, TestSpark.sf)
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx")).head()
    val (e, a) = (row.getLong(0), row.getLong(1))
    assert(e > 0 && math.abs(a - e).toDouble / e <= 0.05, s"exact $e approx $a")
  }

  test("rrf fusion is consistent with its own emitted ranks") {
    val rows = graft.operators.TextRetrieval
      .rrfTopK(spark, TestSpark.sf, SparkEntry.demoQueryVec,
        Seq("spark", "join", "vector"), k = 10).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (score, rv, rb) = (r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(rv >= 0 && rv <= 100 && rb >= 0 && rb <= 100)
      assert(rv > 0 || rb > 0, "a fused doc must appear in at least one leg")
      val want = (if (rv > 0) 1.0 / (60 + rv) else 0.0) +
        (if (rb > 0) 1.0 / (60 + rb) else 0.0)
      assert(math.abs(score - want) < 1e-6, r.toString)
    }
    // descending by fused score — rank arithmetic, not raw scores
    assert(rows.map(_.getDouble(1)).toSeq == rows.map(_.getDouble(1)).sortBy(-_).toSeq)
  }
}
