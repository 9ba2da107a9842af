package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary pipeline produces schema-stable features for every row") {
    val out = Multimodal.pipeline(spark, TestSpark.sf).cache()
    assert(out.count() == 500)
    assert(out.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "features"))
    // every histogram has 16 bins summing to ~1 (stub decode invariant)
    val sums = out.select(aggregate(col("features"), lit(0.0d),
      (acc, x) => acc + x).as("s")).agg(min("s"), max("s")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-3)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-3)
  }

  test("decode stub is deterministic") {
    val a = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    val b = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    assert(a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3))
  }
}
