package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("length deciles bound driver memory: high-cardinality lengths take the approx path") {
    import spark.implicits._
    // 1000 distinct lengths; maxDistinct=100 forces the
    // approx_percentile fallback (driver data = 9 boundaries, never
    // the histogram)
    val docs = (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("doc_id", "n_chars")
    val rows = Curation.lengthDecilesOf(docs, maxDistinct = 100).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).sum == 1000L, "tile populations must cover every row")
    // uniform distinct lengths under the sketch's accuracy budget:
    // boundaries are exact, so tiles are exactly 100 each and ranges
    // are contiguous and monotone
    assert(rows.forall(_.getLong(1) == 100L), rows.mkString(","))
    val ranges = rows.map(r => (r.getLong(2), r.getLong(3)))
    ranges.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(bMin == aMax + 1, s"ranges must tile the domain: ${ranges.mkString(",")}")
    case _ => }
    // and the exact path (cardinality under the bound) agrees with the
    // oracle-checked ntile semantics on the same frame
    val exact = Curation.lengthDecilesOf(docs).collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      rows.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
