package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ReferenceInterop, SklearnTfidf, TextRetrieval}
import graft.sources.{JoblibSource, Sources}

/** The joblib/pickle reader against the reference's REAL fitted
  * artifacts, and the proof that what it decodes IS the sklearn fit:
  * the vectorizer's vocabulary/idf must reproduce, term for term and
  * weight for weight, a from-scratch TF-IDF fit over products.csv's
  * example_text — identifying both the fit corpus and the exact
  * weighting semantics (smooth idf ln((1+n)/(1+df))+1, raw tf,
  * L2-normalized rows) with no tolerance wider than f64 rounding.
  */
class SklearnJoblibSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val model = SklearnTfidf.model(spark)
  lazy val mat = SklearnTfidf.matrix(spark)

  test("pickle reader decodes the fitted vectorizer whole") {
    assert(model.vocabulary.length == 1903)
    assert(model.idf.length == 1903)
    // alphabetical == index order (sklearn sorts features at fit)
    assert(model.vocabulary.toSeq == model.vocabulary.toSeq.sorted)
    assert(model.vocabulary.take(3).toSeq == Seq("00", "07", "10"))
    assert(model.vocabulary.last == "zero")
    // fitted hyperparameters round-trip
    assert(model.lowercase && model.norm == "l2" && model.smoothIdf && !model.sublinearTf)
    assert(model.tokenPattern == "(?u)\\b\\w\\w+\\b")
    assert(model.stopWords == "english")
    assert(model.ngramRange == ((1, 1)))
    assert(model.sklearnVersion == "1.2.2")
  }

  test("pickle reader decodes the fitted document matrix whole") {
    assert(mat.rows == 66 && mat.cols == 1903)
    assert(mat.indptr.last == 6023 && mat.data.length == 6023)
    // CSR invariants: indptr monotone, indices in range
    assert(mat.indptr.sliding(2).forall(w => w(0) <= w(1)))
    assert(mat.indices.forall(c => c >= 0 && c < mat.cols))
    // rows are L2-normalized by the fit (within f64 rounding)
    (0 until mat.rows).foreach { r =>
      val n2 = (mat.indptr(r) until mat.indptr(r + 1)).map(j => mat.data(j) * mat.data(j)).sum
      assert(math.abs(n2 - 1.0) < 1e-12, s"row $r norm² $n2")
    }
  }

  test("artifact idf IS the smooth-idf fit over products.csv example_text") {
    val docs = Sources.readCsvRowIndexed(spark, ReferenceInterop.ProductsCsv,
        ReferenceInterop.productsSchema)
      .select(col("row_id").as("doc_id"), col("example_text").as("text"))
    val n = docs.count()
    assert(n == 66)
    val df = docs
      .select(col("doc_id"), explode(TextRetrieval.sklearnTokens(col("text"))).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every vocabulary term's idf = ln((1+n)/(1+df))+1 from THIS corpus
    model.vocabulary.zipWithIndex.foreach { case (t, i) =>
      val d = df.getOrElse(t, fail(s"vocabulary term '$t' absent from products corpus"))
      val want = math.log((1.0 + n) / (1.0 + d)) + 1.0
      assert(math.abs(want - model.idf(i)) < 1e-12, s"idf('$t')")
    }
    // and the corpus tokens NOT in the vocabulary are exactly the fitted
    // stop-word removals — nothing else was pruned (max_features didn't
    // bind, min_df=1)
    val removed = df.keySet -- model.vocabulary
    assert(removed.size == 223)
    assert(removed.forall(t => !model.termIndex.contains(t)))
  }

  test("artifact matrix IS the tf·idf fit over products.csv, value for value") {
    val docs = Sources.readCsvRowIndexed(spark, ReferenceInterop.ProductsCsv,
        ReferenceInterop.productsSchema)
      .select(col("row_id").as("doc_id"), col("example_text").as("text"))
    val vocab = JoblibSource.vocabDF(spark, model)
    val tf = docs
      .select(col("doc_id"), explode(TextRetrieval.sklearnTokens(col("text"))).as("term"))
      .join(broadcast(vocab), Seq("term"))
      .groupBy(col("doc_id"), col("term_id"))
      .agg((count(lit(1)) * first(col("idf"))).as("w"))
    val norms = tf.groupBy(col("doc_id")).agg(sqrt(sum(col("w") * col("w"))).as("nn"))
    val refit = tf.join(norms, Seq("doc_id"))
      .select(col("doc_id"), col("term_id"), (col("w") / col("nn")).as("refit"))
    val coo = JoblibSource.csrCoo(spark, mat)
      .select(col("row_id").as("doc_id"), col("col_id").as("term_id"), col("value"))
    val joined = refit.join(coo, Seq("doc_id", "term_id"), "full_outer")
      .select(col("doc_id"), col("term_id"), col("refit"), col("value")).collect()
    assert(joined.length == 6023) // identical support on both sides
    joined.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3), s"support mismatch at ${r.get(0)},${r.get(1)}")
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9,
        s"value mismatch at ${r.get(0)},${r.get(1)}")
    }
  }

  test("query transform replays sklearn semantics by hand") {
    // counts × idf, L2-normalized; out-of-vocabulary tokens ignored;
    // repeated tokens count
    val q = SklearnTfidf.encodeQuery(model, "Kindle KINDLE tablet zzz-notaterm").toMap
    val ik = model.termIndex("kindle"); val it = model.termIndex("tablet")
    assert(q.keySet == Set(ik, it))
    val wk = 2.0 * model.idf(ik); val wt = 1.0 * model.idf(it)
    val nrm = math.sqrt(wk * wk + wt * wt)
    assert(math.abs(q(ik) - wk / nrm) < 1e-15 && math.abs(q(it) - wt / nrm) < 1e-15)
    // unknown-only queries fail loudly, never a zero vector
    assertThrows[IllegalArgumentException] {
      SklearnTfidf.encodeQuery(model, "zzz qqqq")
    }
  }

  test("tfidf top-k over the fitted matrix surfaces keyword matches") {
    val out = SklearnTfidf.tfidfTopK(spark, "kindle tablet battery", k = 10).collect()
    assert(out.length == 10)
    val scores = out.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.head > 0.1) // kindle corpus: the top hit is a real match
    // every id resolves to a product row
    assert(out.forall(r => r.getString(1) != null && r.getString(1).nonEmpty))
  }

  test("hybrid blend replays app.py's α·vec + (1-α)·minmax(tfidf)") {
    val out = SklearnTfidf.hybridTopK(spark, "kindle tablet battery", k = 10).collect()
    assert(out.length == 10)
    val hybrid = out.map(_.getDouble(3))
    assert(hybrid.sameElements(hybrid.sorted.reverse))
    // tfidf leg is min-max normalized into [0, 1]
    out.foreach { r =>
      val tn = r.getDouble(5)
      assert(tn >= 0.0 && tn <= 1.0, s"tfidf_score $tn outside [0,1]")
    }
    // the blend is the rounded α-combination of its own reported legs
    // (round-trip check at the output's 5-decimal grain)
    out.foreach { r =>
      val want = 0.7 * r.getDouble(4) + 0.3 * r.getDouble(5)
      assert(math.abs(want - r.getDouble(3)) < 2e-5)
    }
  }

  test("filtered hybrid scopes the blend to candidate_indices()") {
    val out = SklearnTfidf.hybridTopK(spark, "kindle tablet battery", k = 10,
      brand = Some("Amazon"), minRating = Some(4.0), minReviews = Some(5L)).collect()
    assert(out.length == 10)
    // every hit passed the brand filter (ratings/counts are not in the
    // output contract; the oracle hash pins them)
    assert(out.forall(_.getString(2) == "Amazon"))
    // min-max ran over the CANDIDATES: some candidate hits the 0 and
    // some the 1 of the rescaled keyword leg within the top-k or not —
    // but every reported value stays in [0, 1]
    out.foreach { r => assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) }
  }

  test("item-similar by product id excludes the query row and ranks by raw dot") {
    val pid = "AV1T09fyvKc47QAVgf2R"
    val out = ReferenceInterop.itemSimilarReference(spark, pid, k = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getString(1) != pid))
    val scores = out.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted.reverse))
    // unknown ids fail loudly (app.py returns an empty frame only for
    // known-but-filtered-out ids; a typo'd id is a caller bug)
    assertThrows[NoSuchElementException] {
      ReferenceInterop.itemSimilarReference(spark, "nope", k = 10)
    }
  }
}
