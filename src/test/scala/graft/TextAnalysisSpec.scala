package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysis, TextRetrieval}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("token counts match a driver-side recount on a sample") {
    val sample = Tables.documents(spark, TestSpark.sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.tokenCount(spark, TestSpark.sf)
      .where(col("doc_id") < 20).collect()
    got.foreach { r =>
      val text = sample(r.getLong(0))
      assert(r.getLong(1) == text.split(' ').length.toLong)
      assert(r.getLong(3) == text.length.toLong)
    }
  }

  test("lang_id emits one prediction per doc from the known label set") {
    val langs = TextAnalysis.markers.map(_._1).toSet
    val got = TextAnalysis.langId(spark, TestSpark.sf).collect()
    assert(got.length == 500)
    assert(got.forall(r => langs.contains(r.getString(1))))
  }

  test("quality score is bounded in (0, 1]") {
    val q = TextAnalysis.quality(spark, TestSpark.sf)
      .agg(min(col("quality")), max(col("quality"))).head()
    assert(q.getDouble(0) > 0.0 && q.getDouble(1) <= 1.0)
  }

  test("driver-side sklearnTokenize matches the Column tokenizer on the whole corpus") {
    val rows = Tables.documents(spark, TestSpark.sf)
      .select(col("text"), TextRetrieval.sklearnTokens(col("text")).as("toks"))
      .collect()
    rows.foreach { r =>
      assert(TextRetrieval.sklearnTokenize(r.getString(0)) == r.getSeq[String](1),
        r.getString(0).take(80))
    }
    // and punctuation/case/1-char-token handling on a crafted string
    assert(TextRetrieval.sklearnTokenize("Spark JOIN, vector-search! a b2 _x") ==
      Seq("spark", "join", "vector", "search", "b2", "_x"))
  }

  test("raw-text tfidf front door equals the pre-tokenized path") {
    val viaText = TextRetrieval.tfidfTopK(spark, TestSpark.sf, "Spark, JOIN vector!", 10)
      .collect().map(_.toSeq).toSeq
    val viaTokens = TextRetrieval.tfidfTopK(spark, TestSpark.sf, Seq("spark", "join", "vector"), 10)
      .collect().map(_.toSeq).toSeq
    assert(viaText == viaTokens)
  }

  test("tfidf search ranks docs containing all query terms first") {
    val top = TextRetrieval.tfidfTopK(spark, TestSpark.sf, Seq("spark", "join", "vector"), 10)
    assert(top.count() == 10)
    val best = top.orderBy(col("score").desc).head()
    val text = Tables.documents(spark, TestSpark.sf)
      .where(col("doc_id") === best.getLong(0)).head().getAs[String]("text")
    assert(Seq("spark", "join", "vector").exists(text.split(' ').contains(_)))
  }
}
