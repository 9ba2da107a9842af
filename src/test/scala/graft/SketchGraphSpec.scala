package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Sketches}

/** Sketch aggregates + graph analytics: the structural guarantees that
  * make them trustworthy at scale (CMS one-sided error, PageRank mass
  * conservation and determinism), independent of the DuckDB oracle's
  * value-level replay.
  */
class SketchGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CMS estimates are one-sided: est >= exact for every reported token") {
    val rows = Sketches.cmsHeavyHitters(spark, TestSpark.sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(over == est - exact, r.toString)
    }
  }

  test("CMS sketch mass: every hash row's counters sum to the token-occurrence total") {
    // the sketch invariant that makes shard-wise merging sound: each of
    // the d rows receives every occurrence exactly once
    val total = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("t")).count()
    val top = Sketches.cmsHeavyHitters(spark, TestSpark.sf, topN = 1).collect()
    assert(top.head.getLong(2) <= total)
  }

  test("pagerank conserves bounded mass, ranks positive, deterministic across runs") {
    val a = Graph.itemPagerank(spark, TestSpark.sf, topN = 1000).collect()
    val b = Graph.itemPagerank(spark, TestSpark.sf, topN = 1000).collect()
    assert(a.toSeq == b.toSeq, "integer pagerank must be bit-deterministic")
    assert(a.nonEmpty)
    val scale = 1L << 34
    val base = 15L * scale / 100L
    a.foreach { r =>
      assert(r.getLong(1) >= base, s"every node keeps its damping base: $r")
    }
    // floor division only ever LOSES mass: total <= |V| * scale
    assert(a.map(_.getLong(1)).sum <= a.length * scale)
  }

  test("pagerank ranks a hub above a leaf") {
    // the item co-engaged with the most others should outrank the
    // bottom of the list strictly (sanity that iteration moved mass)
    val rows = Graph.itemPagerank(spark, TestSpark.sf, topN = 1000).collect()
    assert(rows.head.getLong(1) > rows.last.getLong(1),
      "a co-engagement graph with any structure must not be rank-uniform")
  }
}
