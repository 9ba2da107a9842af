package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysis, TextRetrieval}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ngram coverage matches a driver-side recount on a sample") {
    val sample = Tables.documents(spark, TestSpark.sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String, n: Int): Seq[String] = {
      val toks = t.split(' ')
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val got = TextAnalysis.ngramCoverage(spark, TestSpark.sf)
      .where(col("doc_id") < 20).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val t = sample(r.getLong(0))
      val g3 = grams(t, 3); val g5 = grams(t, 5); val g10 = grams(t, 10)
      assert(r.getLong(1) == g3.length.toLong)
      val top3 = if (g3.isEmpty) 0L else g3.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(2) == top3)
      val dup5 = if (g5.isEmpty) 0.0 else (g5.length - g5.distinct.length).toDouble / g5.length
      val dup10 = if (g10.isEmpty) 0.0 else (g10.length - g10.distinct.length).toDouble / g10.length
      assert(r.getDouble(3) == (if (g3.isEmpty) 0.0 else top3.toDouble / g3.length))
      assert(r.getDouble(4) == dup5)
      assert(r.getDouble(5) == dup10)
    }
  }

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

  test("chunk-level dedup matches a full driver recount (keep-first by doc, chunk)") {
    val texts = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def chunks(t: String): Seq[String] = {
      val last = math.max((t.length - 200 + 149) / 150, 0)
      (0 to last).map(i => t.substring(math.min(i * 150, t.length),
        math.min(i * 150 + 200, t.length)))
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val want = texts.map { case (id, t) =>
      val cs = chunks(t)
      // docs iterate in doc_id order, chunks in chunk_id order — the
      // operator's keep-first tie-break
      val dups = cs.count(c => !seen.add(c))
      id -> ((cs.length.toLong, dups.toLong))
    }.toMap
    val got = TextAnalysis.dedupChunks(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("unigram log-prob matches a driver recount against corpus stats") {
    val texts = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val ct = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { case (_, t) =>
      TextRetrieval.sklearnTokenize(t).foreach(tok => ct(tok) += 1) }
    val tot = ct.values.sum.toDouble
    val got = TextAnalysis.unigramLogProb(spark, TestSpark.sf)
      .where(col("doc_id") < 5).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val toks = TextRetrieval.sklearnTokenize(texts.toMap.apply(r.getLong(0)))
      val want = -toks.map(t => math.log(ct(t) / tot)).sum / toks.length
      assert(r.getLong(1) == toks.length.toLong)
      // the engine rounds to 5 decimals; allow the half-width
      assert(math.abs(r.getDouble(2) - want) <= 5e-6 + 1e-9,
        s"doc ${r.getLong(0)}: got ${r.getDouble(2)} want $want")
    }
  }

  test("phrase search counts match a driver-side adjacency recount") {
    val want = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = TextRetrieval.sklearnTokenize(r.getString(1))
        r.getLong(0) -> toks.sliding(2).count(_ == Seq("table", "table"))
      }.filter(_._2 > 0).toMap
    val got = TextRetrieval.phraseSearch(spark, TestSpark.sf, "table table")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == want, s"got ${got.size} docs, want ${want.size}")
    assert(want.nonEmpty, "phrase should occur in testdata")
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

  test("pii redaction masks emails, ips, and long numbers (and counts them)") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk from 10.0.0.1 acct 1234567 pin 12345"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.withPiiCols(df).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_email") == 1L)
    assert(got(0).getAs[Long]("n_ipv4") == 1L)
    // 1234567 (7 digits) matches; 12345 (5) and the short IP runs don't
    assert(got(0).getAs[Long]("n_number") == 1L)
    val clean = got(0).getAs[String]("clean_text")
    assert(clean.contains("<EMAIL>") && clean.contains("<IP>") && clean.contains("<NUM>"))
    assert(!clean.contains("example.co.uk") && !clean.contains("1234567"))
    assert(clean.contains("pin 12345"), "short digit runs must survive")
    assert(got(1).getAs[String]("clean_text") == "no pii here at all")
    assert(got(1).getAs[Long]("n_email") == 0L)
  }

  test("gopher rules match a driver recount on a sample") {
    val sample = Tables.documents(spark, TestSpark.sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.gopherRules(spark, TestSpark.sf)
      .where(col("doc_id") < 20).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = sample(r.getAs[Long]("doc_id")).split(' ')
      val swl = toks.map(_.length).sum
      assert(r.getAs[Long]("n_words") == toks.length.toLong)
      assert(r.getAs[Double]("mean_word_len") == swl.toDouble / toks.length)
      assert(r.getAs[Long]("n_stop") == toks.count(t => t == "the" || t == "a").toLong)
      val expectPass = toks.length >= 10 && toks.length <= 100000 &&
        swl.toDouble / toks.length >= 3.0 && swl.toDouble / toks.length <= 10.0 &&
        toks.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / toks.length >= 0.8 &&
        toks.count(t => t == "the" || t == "a") >= 2
      assert(r.getAs[Boolean]("pass_gopher") == expectPass, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("doc repetition matches a driver recount on a sample") {
    val sample = Tables.documents(spark, TestSpark.sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.docRepetition(spark, TestSpark.sf)
      .where(col("doc_id") < 20).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bgs = sample(r.getAs[Long]("doc_id")).split(' ').sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Long]("n_bigrams") == bgs.length.toLong)
      assert(r.getAs[Long]("n_distinct") == bgs.distinct.length.toLong)
      val topN = if (bgs.isEmpty) 0L else bgs.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getAs[Long]("top_bigram_n") == topN)
      if (bgs.nonEmpty)
        assert(r.getAs[Double]("dup_bigram_frac") ==
          (bgs.length - bgs.distinct.length).toDouble / bgs.length)
    }
  }

  test("bm25 raw-text front door equals the pre-tokenized path and ranks sensibly") {
    val viaText = TextRetrieval.bm25TopK(spark, TestSpark.sf, "Spark, JOIN vector!", 10)
      .collect().map(_.toSeq).toSeq
    val viaTokens = TextRetrieval.bm25TopK(spark, TestSpark.sf, Seq("spark", "join", "vector"), 10)
      .collect().map(_.toSeq).toSeq
    assert(viaText == viaTokens && viaText.size == 10)
    // scores positive and non-increasing
    val scores = viaTokens.map(_(1).asInstanceOf[Double])
    assert(scores.forall(_ > 0.0))
    assert(scores == scores.sortBy(-_))
  }

  test("boolean search: containment honored exactly, ranks agree with plain bm25") {
    val must = Seq("spark", "vector")
    val got = TextRetrieval.boolSearch(spark, TestSpark.sf, must, Seq("stream"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    // recount eligibility from the raw text with the same tokenizer
    val toks = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9_]+".r.findAllIn(r.getString(1).toLowerCase).filter(_.length >= 2).toSet)
      .toMap
    got.foreach { case (id, _) =>
      assert(must.forall(toks(id)), s"doc $id missing a must term")
      assert(!toks(id)("stream"), s"doc $id contains the mustNot term")
    }
    // within the eligible set, order and scores are exactly plain
    // bm25 over the must terms (the eligibility filter cannot change
    // a survivor's score)
    val all = TextRetrieval.bm25TopK(spark, TestSpark.sf, must,
      k = toks.size).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bm = all.toMap
    got.foreach { case (id, s) => assert(bm(id) == s, s"score of $id") }
    val eligibleRanked = all.filter { case (id, _) =>
      must.forall(toks(id)) && !toks(id)("stream") }.take(got.length)
    assert(got.toSeq == eligibleRanked.toSeq, "boolean ranking diverges")
  }

  test("search facets recount over the exact top-100 cut and sum to facet totals") {
    val facets = TextRetrieval.searchFacets(spark, TestSpark.sf,
      Seq("spark", "join", "vector")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(facets.nonEmpty)
    val top = TextRetrieval.bm25TopK(spark, TestSpark.sf,
      Seq("spark", "join", "vector"), k = 100).collect().map(_.getLong(0)).toSet
    val meta = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("source")).collect()
      .filter(r => top(r.getLong(0)))
    val exp = (meta.map(r => ("lang", r.getString(1))) ++
      meta.map(r => ("source", r.getString(2))))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(facets.toMap == exp, "facet counts diverge from the cut recount")
    // every facet dimension partitions the same result set
    val byFacet = facets.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    assert(byFacet("lang") == top.size.toLong && byFacet("source") == top.size.toLong)
  }

  test("diversified SERP: per-source cap honored, page equals the driver recount") {
    val terms = Seq("spark", "join", "vector")
    val got = TextRetrieval.serpDiversified(spark, TestSpark.sf, terms).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty && got.length <= 10)
    got.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length <= 2, s"source $src over the crowding cap") }
    // recount: full bm25 ranking -> per-source cap -> global top-10
    val all = TextRetrieval.bm25TopK(spark, TestSpark.sf, terms, k = 100000).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val srcOf = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val capped = all.sortBy { case (id, s) => (-s, id) }
      .groupBy(p => srcOf(p._1)).toSeq.flatMap { case (src, rows) =>
        rows.sortBy { case (id, s) => (-s, id) }.take(2).zipWithIndex
          .map { case ((id, s), i) => (id, src, s, i + 1L) }
      }
    val exp = capped.sortBy { case (id, _, s, _) => (-s, id) }.take(10)
    assert(got.toSeq == exp, "diversified page diverges from the recount")
  }

  test("autocomplete recounts prefix-term usage from raw text") {
    val got = TextRetrieval.autocompletePrefix(spark, TestSpark.sf, "s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val toks = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => "[a-z0-9_]+".r.findAllIn(r.getString(1).toLowerCase)
        .filter(_.length >= 2).map(t => (r.getLong(0), t)))
    val byTerm = toks.filter(_._2.startsWith("s")).groupBy(_._2)
      .map { case (t, g) => (t, g.length.toLong, g.map(_._1).distinct.length.toLong) }
    val exp = byTerm.toSeq.sortBy { case (t, tf, _) => (-tf, t) }.take(10)
    assert(got.toSeq == exp, "autocomplete diverges from the raw-text recount")
  }

  test("team-draft interleave: no duplicates, fair alternation, greedy picks recount") {
    val terms = Seq("spark", "join", "vector")
    val got = TextRetrieval.teamDraftInterleave(spark, TestSpark.sf, terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.nonEmpty && got.length <= 10)
    // a drafted document appears exactly once
    assert(got.map(_._2).distinct.length == got.length, "duplicate doc drafted")
    // team totals differ by at most one (skips aside, both lists are
    // 10-deep here so no team can starve)
    val byTeam = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(byTeam.keySet == Set("bm25", "tfidf"))
    assert(math.abs(byTeam("bm25") - byTeam("tfidf")) <= 1, s"unfair draft: $byTeam")
    // full replay: the same coin walk over the two engine rankings
    val a = TextRetrieval.bm25TopK(spark, TestSpark.sf, terms, 10).collect()
      .map(_.getLong(0)).toSeq
    val b = TextRetrieval.tfidfTopK(spark, TestSpark.sf, terms, 10).collect()
      .map(_.getLong(0)).toSeq
    val picked = scala.collection.mutable.Set.empty[Long]
    val exp = (1 to 10).flatMap { pos =>
      val aFirst = graft.operators.TeamDraft.coin((pos - 1) / 2)
      val teamA = if ((pos - 1) % 2 == 0) aFirst else !aFirst
      val (list, name) = if (teamA) (a, "bm25") else (b, "tfidf")
      list.zipWithIndex.find(p => !picked(p._1)).map { case (d, i) =>
        picked += d; (pos.toLong, d, name, i + 1L)
      }
    }
    assert(got.toSeq == exp, "draft diverges from the replay")
  }

  test("percolation: firing rule and routing precision recount from the subscriptions") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val subs = TextAnalysis.sourceLogOdds(spark, TestSpark.sf, topN = 3,
        docFilter = TextAnalysis.trainSplit).collect()
      .map(r => (r.getString(0), r.getString(2)))
    val subTerms = subs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        "[a-z0-9_]+".r.findAllIn(r.getString(2).toLowerCase)
          .filter(_.length >= 2).toSet))
    val incoming = docs.filter { case (id, _, _) => md5hex(id.toString).take(4) >= "cccc" }
    assert(incoming.nonEmpty)
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = subTerms.map { case (sub, ts) =>
      val fired = incoming.filter { case (_, _, tok) => ts.count(tok) >= 2 }
      val own = fired.count(_._2 == sub)
      (sub, incoming.length.toLong, fired.length.toLong,
        r5(fired.length.toDouble / incoming.length),
        if (fired.isEmpty) 0.0 else r5(own.toDouble / fired.length))
    }.toSet
    val got = TextAnalysis.percolate(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == exp, s"percolation diverges: got=$got exp=$exp")
  }

  test("vocab coverage curve recounts and is monotone in vocab size") {
    val words = Tables.documents(spark, TestSpark.sf)
      .select(col("text")).collect().flatMap(_.getString(0).split(" ", -1))
    val counts = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val total = words.length.toLong
    val got = TextAnalysis.vocabCoverageCurve(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.foreach { case (k, covered, tot, cov) =>
      val want = ranked.take(k.toInt).map(_._2).sum
      assert(tot == total && covered == want && cov == r5(want.toDouble / total), s"cut $k")
    }
    val covs = got.sortBy(_._1).map(_._4)
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
  }

  test("span corruption masks the deterministic groups and conserves tokens") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val rows = TextAnalysis.spanCorruptionPrep(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      val toks = docs(r.getLong(0))
      val ng = math.ceil(toks.length / 3.0).toInt
      val groups = (0 until ng).map(g => toks.slice(g * 3, g * 3 + 3))
      val maskedIdx = (0 until ng).filter(_ % 6 == 0)
      val input = (0 until ng).flatMap(g =>
        if (g % 6 == 0) Seq("<extra_id>") else groups(g)).mkString(" ")
      val target = maskedIdx.flatMap(g => "<extra_id>" +: groups(g)).mkString(" ")
      assert(r.getString(1) == input, s"doc ${r.getLong(0)} input")
      assert(r.getString(2) == target, s"doc ${r.getLong(0)} target")
      assert(r.getLong(3) == maskedIdx.map(g => groups(g).length).sum)
      // nothing is lost: masked + kept = all tokens
      val kept = (0 until ng).filterNot(_ % 6 == 0).map(g => groups(g).length).sum
      assert(kept + r.getLong(3) == toks.length)
    }
  }

  test("collocation PMI matches a driver-side count recount") {
    val texts = Tables.documents(spark, TestSpark.sf)
      .select(col("text")).collect().map(_.getString(0))
    val toks = texts.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val u = toks.map(_.size).sum.toLong
    val bgs = toks.flatMap(t => t.zip(t.tail).map { case (a, b) => s"$a $b" })
    val tTot = bgs.size.toLong
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = bgs.groupBy(identity).map { case (bg, g) => bg -> g.size.toLong }
      .filter(_._2 >= 5L).toSeq
      .map { case (bg, c12) =>
        val Array(w1, w2) = bg.split(" ", -1) match {
          case a if a.length == 2 => a
          case a => Array(a.head, a.tail.mkString(" ")) // not reachable for space-split tokens
        }
        (bg, c12, uni(w1), uni(w2),
          r5(math.log(c12.toDouble * u / tTot * u / uni(w1) / uni(w2))))
      }
      .sortBy { case (bg, _, _, _, pmi) => (-pmi, bg) }.take(50)
    val got = TextAnalysis.collocationPmi(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == want)
  }

  test("OOV rate recounts against a driver-built top-V vocabulary") {
    val rows = Tables.documents(spark, TestSpark.sf)
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    val counts = rows.flatMap(_._3).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(2000).map(_._1).toSet
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rows.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      val ws = g.flatMap(_._3)
      val oov = ws.count(!vocab.contains(_)).toLong
      k -> ((ws.size.toLong, oov, r5(oov.toDouble / ws.size)))
    }
    val got = TextAnalysis.vocabOovRate(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want)
  }

  test("bm25 PRF with zero expansion terms reduces exactly to plain bm25") {
    val terms = Seq("spark", "join", "vector")
    val plain = TextRetrieval.bm25TopK(spark, TestSpark.sf, terms, 10)
      .collect().map(_.toSeq).toSeq
    val prf0 = TextRetrieval.bm25PrfTopK(spark, TestSpark.sf, terms, expandK = 0)
      .collect().map(_.toSeq).toSeq
    assert(prf0 == plain)
    // with expansion on, the result is still a valid descending top-10
    // and the expansion actually moves at least one score or rank
    val prf = TextRetrieval.bm25PrfTopK(spark, TestSpark.sf, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(prf.size == 10)
    val s = prf.map(_._2)
    assert(s == s.sortBy((x: Double) => -x) && s.forall(_ > 0.0))
    assert(prf != plain.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Double])),
      "expansion terms must perturb the ranking on this corpus")
  }

  test("bm25 penalizes document length where tfidf cosine does not reward it") {
    // two docs with the same query-term tf: BM25 must score the longer
    // one strictly lower (the b·dl/avgdl length normalization)
    import TextRetrieval.sklearnTokenize
    val q = Seq("spark", "join", "vector")
    val rows = TextRetrieval.bm25TopK(spark, TestSpark.sf, q, 500).collect()
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> sklearnTokenize(r.getString(1))).toMap
    val byScore = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // find two scored docs with identical per-term tf but different lengths
    val sig = docs.collect { case (id, toks) if byScore.contains(id) =>
      (id, q.map(t => toks.count(_ == t)), toks.length)
    }
    val pair = sig.groupBy(_._2).values.find(g => g.map(_._3).toSet.size > 1)
    pair.foreach { g =>
      val sorted = g.toSeq.sortBy(_._3)
      assert(byScore(sorted.head._1) > byScore(sorted.last._1),
        s"longer doc must score lower: $sorted")
    }
  }

  test("chunking tiles every document: step-aligned starts, overlap preserved, full coverage") {
    val size = 200; val overlap = 50; val step = size - overlap
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextAnalysis.chunk(spark, TestSpark.sf, size, overlap).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == docs.keySet.filter(docs(_).nonEmpty))
    chunks.foreach { case (id, rows) =>
      val text = docs(id)
      val sorted = rows.sortBy(_.getLong(1))
      // contiguous ids from 0; each chunk is exactly the substring at
      // its step-aligned start; all but the last are full-size
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i.toLong)
        val expect = text.substring(i * step, math.min(i * step + size, text.length))
        assert(r.getString(2) == expect, s"doc $id chunk $i")
      }
      // every non-last chunk is exactly full size (the start formula
      // guarantees the doc extends past each non-final window)
      assert(sorted.init.forall(_.getLong(3) == size.toLong))
      // coverage: the last chunk reaches the end of the document...
      val last = sorted.last
      assert((sorted.length - 1) * step + last.getLong(3) == text.length.toLong)
      // ...and adds content past the previous chunk's end — no
      // wholly-contained duplicate chunk (the len=200 class of bug)
      if (sorted.length > 1)
        assert((sorted.length - 1) * step + last.getLong(3) >
          (sorted.length - 2) * step + size,
          s"doc $id trailing chunk adds nothing new")
    }
  }

  test("raw-text tfidf front door equals the pre-tokenized path") {
    val viaText = TextRetrieval.tfidfTopK(spark, TestSpark.sf, "Spark, JOIN vector!", 10)
      .collect().map(_.toSeq).toSeq
    val viaTokens = TextRetrieval.tfidfTopK(spark, TestSpark.sf, Seq("spark", "join", "vector"), 10)
      .collect().map(_.toSeq).toSeq
    assert(viaText == viaTokens)
  }

  test("lang mismatch cells recount langId's incorrect rows exactly") {
    val bad = TextAnalysis.langId(spark, TestSpark.sf)
      .where(!col("correct")).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("pred_lang")), r.getLong(0)))
    val expected = bad.groupBy(_._1).map { case (k, v) =>
      (k, (v.length.toLong, v.map(_._2).min)) }
    val got = TextAnalysis.langMismatch(spark, TestSpark.sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty, "detector and metadata disagree somewhere")
    assert(got == expected)
    // mismatch cells only — the diagonal never appears
    assert(got.keys.forall { case (l, p) => l != p })
  }

  test("tfidf search ranks docs containing all query terms first") {
    val top = TextRetrieval.tfidfTopK(spark, TestSpark.sf, Seq("spark", "join", "vector"), 10)
    assert(top.count() == 10)
    val best = top.orderBy(col("score").desc).head()
    val text = Tables.documents(spark, TestSpark.sf)
      .where(col("doc_id") === best.getLong(0)).head().getAs[String]("text")
    assert(Seq("spark", "join", "vector").exists(text.split(' ').contains(_)))
  }

  test("BPE piece stats: categories partition the pieces, estimate brackets hold") {
    val rows = TextAnalysis.bpeTokenStats(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, a, d, p, est) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a + d + p == n, s"alpha+digit+punct must partition pieces: $r")
      assert(est >= n, s"every piece is >= 1 subtoken: $r")
    }
    // a doc's subtoken estimate never exceeds its character count
    val chars = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(5) <= chars(r.getLong(0))))
  }

  test("token fertility replays against a driver-side per-slice recount") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      val words = g.map(_._3.split(" ", -1).length.toLong).sum
      val chars = g.map(_._3.length.toLong).sum
      val bytes = g.map(_._3.getBytes("UTF-8").length.toLong).sum
      val st = g.map(t => (t._3.length + 3) / 4L).sum
      def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      k -> ((g.size.toLong, words, chars, bytes, st,
        r5(st.toDouble / words), r5(chars.toDouble / words), r5(bytes.toDouble / chars)))
    }
    val got = TextAnalysis.tokenFertility(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getDouble(8), r.getDouble(9)))).toMap
    assert(got == want)
  }

  test("BPE piece stats replay against a driver-side Java-regex recount") {
    val pat = "[a-z]+|[0-9]|[^a-z0-9 \t\n\r]".r
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> pat.findAllIn(r.getString(1).toLowerCase).toVector).toMap
    TextAnalysis.bpeTokenStats(spark, TestSpark.sf).collect().foreach { r =>
      val ps = docs(r.getLong(0))
      assert(r.getLong(1) == ps.length)
      assert(r.getLong(2) == ps.count(p => p.head >= 'a' && p.head <= 'z'))
      assert(r.getLong(3) == ps.count(p => p.head >= '0' && p.head <= '9'))
      assert(r.getLong(5) == ps.map(p => (p.length + 5) / 6).sum)
    }
  }

  test("maxsim rerank: bounded by |q|, exact 3.0 on full-coverage docs, deterministic") {
    import graft.operators.TextRetrieval
    val q = Seq("spark", "join", "vector")
    val a = TextRetrieval.maxsimRerank(spark, TestSpark.sf, q).collect()
    val b = TextRetrieval.maxsimRerank(spark, TestSpark.sf, q).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty && a.length <= 10)
    val texts = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { r =>
      val score = r.getDouble(2)
      // each query term contributes max-cos ≤ 1
      assert(score <= 3.0 + 1e-9, r.toString)
      // a doc containing every query term hits cos(v(t), v(t)) = 1
      // per term — MaxSim is exactly |q| there, the ColBERT identity
      val toks = texts(r.getLong(0)).toLowerCase.split("[^a-z0-9_]+").toSet
      if (q.forall(toks)) assert(math.abs(score - 3.0) < 1e-9, r.toString)
    }
    // ranking is by maxsim descending with id ties
    a.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getDouble(2) > y.getDouble(2) ||
          (x.getDouble(2) == y.getDouble(2) && x.getLong(0) < y.getLong(0)))
      case _ => ()
    }
  }

  test("gate ablation recounts from the per-doc rule frame") {
    val rules = Seq("words", "word_len", "alpha", "stop")
    val g = TextAnalysis.gopherRules(spark, TestSpark.sf).collect()
      .map(r => rules.map(n => r.getBoolean(r.fieldIndex(s"rule_$n"))))
    val got = TextAnalysis.gateAblation(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val nPassAll = g.count(_.forall(identity)).toLong
    rules.zipWithIndex.foreach { case (name, i) =>
      val (nFail, nUnique, nDocs, passAll, passWithout) = got(name)
      assert(nDocs == g.length.toLong)
      assert(passAll == nPassAll)
      assert(nFail == g.count(!_(i)).toLong, name)
      assert(nUnique == g.count(row => !row(i) &&
        row.indices.forall(j => j == i || row(j))).toLong, name)
      assert(passWithout == passAll + nUnique)
    }
  }

  test("bpe apply: bounded counts, and each merge round strictly shrinks the token budget") {
    val r8 = TextAnalysis.bpeApplyStats(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(r8.nonEmpty)
    r8.foreach { case (_, nWords, nTokens, nChars) =>
      assert(nTokens >= nWords, "a word is at least one token")
      assert(nTokens <= nChars, "a token is at least one char")
    }
    // zero merges = pure character tokenization; the learned merges
    // must buy real compression on the corpus they were fit on
    val r0 = TextAnalysis.bpeApplyStats(spark, TestSpark.sf, rounds = 0).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    r8.foreach { case (id, _, _, nChars) => assert(r0(id) == nChars) }
    assert(r8.map(_._3).sum < r8.map(_._4).sum)
  }

  test("ccnet buckets: per-source terciles are ordered, exhaustive, and roughly balanced") {
    val rows = TextAnalysis.ccnetBuckets(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._4).toSet.subsetOf(Set("head", "middle", "tail")))
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val byBucket = docs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // every NLL in head <= every NLL in middle <= every NLL in tail
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.max <= m.min, src)
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max <= t.min, src)
      // terciles: no bucket may hold more than half the source (ties
      // can unbalance exact thirds, but not this far)
      if (docs.length >= 6)
        byBucket.values.foreach(b => assert(b.size <= docs.length / 2 + 1, src))
    }
  }

  test("bpe merge learning matches a full driver re-derivation (String.replace third impl)") {
    // third implementation: word counts, weighted overlap-inclusive
    // pair counts, (n DESC, a, b) argmax, two-pass delimiter fuse —
    // all with plain JVM strings
    val wordRe = "[a-z]+".r
    var vocab: Map[String, (Long, String)] = Tables.documents(spark, TestSpark.sf)
      .select("text").collect()
      .flatMap(r => wordRe.findAllIn(r.getString(0).toLowerCase))
      .groupBy(identity).map { case (w, ws) => w -> (ws.length.toLong, w.mkString(" ")) }
    val rounds = 8
    val expected = (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (cnt, seq) =>
        val syms = seq.split(" ")
        syms.sliding(2).foreach {
          case Array(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _ => ()
        }
      }
      val ((a, b), n) = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
      def fuse(s: String) = (" " + s + " ").replace(s" $a $b ", s" $a$b ").trim
      vocab = vocab.map { case (w, (cnt, seq)) => w -> (cnt, fuse(fuse(seq))) }
      (r.toLong, a, b, n, a + b)
    }
    val got = TextAnalysis.bpeLearnMerges(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == expected)
  }

  test("holdout LM report: bigram totals recount, gap is the rounded difference") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.TextAnalysis.lmHoldoutPpl(spark, TestSpark.sf).collect()
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tokRe = "[a-z0-9_]+".r
    val counts = docs.map { r =>
      val toks = tokRe.findAllIn(r.getString(2).toLowerCase).filter(_.length >= 2).toSeq
      val train = md5hex(r.getLong(0).toString).take(4) < "cccc"
      (r.getString(1), train, math.max(toks.length - 1, 0).toLong)
    }.filter(_._3 > 0)
    rows.foreach { r =>
      val src = r.getString(0)
      val tb = counts.filter(c => c._1 == src && c._2).map(_._3).sum
      val eb = counts.filter(c => c._1 == src && !c._2).map(_._3).sum
      assert(r.getLong(1) == tb, s"train bigrams for $src")
      assert(r.getLong(2) == eb, s"eval bigrams for $src")
      if (!r.isNullAt(3)) assert(r.getDouble(3) > 0, "NLL must be positive")
      if (!r.isNullAt(3) && !r.isNullAt(4)) {
        val gap = BigDecimal(r.getDouble(4) - r.getDouble(3))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(5) == gap, s"gap recount for $src")
      }
    }
  }

  test("ranker agreement reconciles with the three ranked lists") {
    import org.apache.spark.sql.functions.col
    val terms = Seq("spark", "join", "vector")
    val qv = graft.SparkEntry.demoQueryVec
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("doc_id")).collect().map(_.getLong(0)).zipWithIndex
        .map { case (d, i) => d -> (i + 1) }.toMap
    val lists = Map(
      "bm25" -> ranks(graft.operators.TextRetrieval.bm25TopK(spark, TestSpark.sf, terms, 10)),
      "rrf" -> ranks(graft.operators.TextRetrieval.rrfTopK(spark, TestSpark.sf, qv, terms, 10)),
      "tfidf" -> ranks(graft.operators.TextRetrieval.tfidfTopK(spark, TestSpark.sf, terms, 10)))
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.TextRetrieval
      .rankerAgreement(spark, TestSpark.sf, qv, terms).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("bm25", "rrf"), ("bm25", "tfidf"), ("rrf", "tfidf")))
    rows.foreach { r =>
      val (a, b) = (lists(r.getString(0)), lists(r.getString(1)))
      val inter = a.keySet & b.keySet
      assert(r.getLong(3) == inter.size.toLong, "overlap@10")
      assert(r.getLong(2) ==
        (a.filter(_._2 <= 5).keySet & b.filter(_._2 <= 5).keySet).size.toLong, "overlap@5")
      assert(r.getDouble(4) == r5(inter.size.toDouble / (20 - inter.size)), "jaccard")
      if (inter.nonEmpty)
        assert(r.getDouble(5) ==
          r5(inter.toSeq.map(d => math.abs(a(d) - b(d))).sum.toDouble / inter.size), "shift")
      else assert(r.isNullAt(5))
    }
  }

  test("bm25 param sweep: default row is exact self-agreement, grid reconciles") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.TextRetrieval.bm25ParamSweep(spark, TestSpark.sf).collect()
    assert(rows.length == 5)
    val default = rows.find(r => r.getDouble(0) == 1.2 && r.getDouble(1) == 0.75).get
    assert(default.getLong(3) == 10L && default.getDouble(4) == 1.0,
      "the default leg must agree with itself exactly")
    // the default leg's top-1 must equal bm25TopK's head under the
    // same rounded-score order
    val top = graft.operators.TextRetrieval
      .bm25TopK(spark, TestSpark.sf, Seq("spark", "join", "vector"), 10)
      .collect().head.getLong(0)
    assert(default.getLong(2) == top)
    rows.foreach { r =>
      val o = r.getLong(3)
      assert(o >= 0 && o <= 10)
      assert(r.getDouble(4) ==
        BigDecimal(o.toDouble / (20 - o)).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("vocab stability reconciles with a driver split-and-rank replay") {
    import org.apache.spark.sql.functions.col
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tokRe = "[a-z0-9_]+".r
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
    val counts = scala.collection.mutable.Map.empty[(Boolean, String), Long]
    docs.foreach { r =>
      val train = md5hex(r.getLong(0).toString).take(4) < "cccc"
      tokRe.findAllIn(r.getString(1).toLowerCase).filter(_.length >= 2)
        .foreach(t => counts((train, t)) = counts.getOrElse((train, t), 0L) + 1)
    }
    def top(train: Boolean): Seq[String] =
      counts.collect { case ((s, t), n) if s == train => (t, n) }.toSeq
        .sortBy { case (t, n) => (-n, t) }.take(100).map(_._1)
    val (a, b) = (top(true), top(false))
    val inter = a.toSet & b.toSet
    val ra = a.zipWithIndex.toMap; val rb = b.zipWithIndex.toMap
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = graft.operators.TextAnalysis.vocabStability(spark, TestSpark.sf).collect().head
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == inter.size.toLong, "shared count")
    assert(r.getDouble(2) == r5(inter.size.toDouble / (a.size + b.size - inter.size)))
    assert(r.getDouble(3) ==
      r5(inter.toSeq.map(t => math.abs(ra(t) - rb(t))).sum.toDouble / inter.size))
  }

  test("query difficulty replays df/cf/idf/SCQ from a driver tokenize") {
    val rows = graft.operators.TextRetrieval.queryDifficulty(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("join", "spark", "vector"))
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("text")).collect().map(_.getString(0))
    val n = docs.length
    val tokRe = "[a-z0-9_]+".r
    val perDoc = docs.map(t => tokRe.findAllIn(t.toLowerCase).filter(_.length >= 2).toSeq)
    val idf0s = rows.map { r =>
      val term = r.getString(0)
      val df = perDoc.count(_.contains(term)).toLong
      val cf = perDoc.map(_.count(_ == term)).sum.toLong
      assert(r.getLong(1) == df, s"$term df")
      assert(r.getLong(2) == cf, s"$term cf")
      val idf0 = math.log((n + 1.0) / (df + 1.0)) + 1.0
      assert(r.getDouble(3) == r5(idf0), s"$term idf")
      if (cf > 0) assert(r.getDouble(4) == r5((1.0 + math.log(cf.toDouble)) * idf0), s"$term scq")
      else assert(r.isNullAt(4), s"$term scq must be NULL at cf=0")
      idf0
    }
    // repeated query-level columns reconcile
    rows.foreach { r =>
      assert(r.getLong(5) == rows.length.toLong)
      assert(r.getDouble(6) == r5(idf0s.sum / idf0s.length))
      assert(r.getDouble(7) == r5(idf0s.max))
    }
  }

  test("lexical diversity replays a driver tokenize per doc") {
    val rows = graft.operators.TextAnalysis.docLexicalDiversity(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tokRe = "[a-z0-9_]+".r
    rows.foreach { r =>
      val toks = tokRe.findAllIn(docs(r.getLong(0)).toLowerCase)
        .filter(_.length >= 2).toSeq
      val byType = toks.groupBy(identity).map { case (t, g) => t -> g.length }
      assert(r.getLong(1) == byType.size.toLong, s"doc ${r.getLong(0)} types")
      assert(r.getLong(2) == toks.length.toLong, s"doc ${r.getLong(0)} tokens")
      assert(r.getLong(3) == byType.count(_._2 == 1).toLong, s"doc ${r.getLong(0)} hapax")
      assert(r.getDouble(4) == r5(byType.size.toDouble / toks.length))
      assert(r.getDouble(5) == r5(byType.size / math.sqrt(toks.length.toDouble)))
      assert(r.getDouble(6) == r5(byType.count(_._2 == 1).toDouble / byType.size))
    }
    // every doc with at least one >=2-char token is present
    val featured = docs.count { case (_, t) =>
      tokRe.findAllIn(t.toLowerCase).exists(_.length >= 2) }
    assert(rows.length == featured)
  }

  test("heaps/zipf fits survive the degenerate constant-vocabulary corpus " +
    "(r11 red row: signed-zero + cancellation)") {
    import spark.implicits._
    // 64 identical docs: ids spread over all 16 md5 shards, but the
    // WHOLE vocabulary first appears in the minimal occupied shard, so
    // cumulative V is constant across every prefix point → the true
    // Heaps slope is exactly 0. Pre-r12 this produced a ±1e-14
    // cancellation residual whose round(·,5) was −0.0 or +0.0
    // depending on engine summation order (the r11 hash mismatch).
    val docs = (0 until 64).map(i => (i.toLong, "alpha beta gamma delta"))
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = TextAnalysis.vocabHeaps(spark, dir).head()
    assert(h.getLong(0) >= 10L, s"expected >=10 prefix points, got ${h.getLong(0)}")
    assert(h.getLong(2) == 4L, s"vocab_size ${h.getLong(2)}")
    val beta = h.getDouble(3)
    assert(beta == 0.0, s"degenerate Heaps slope must be exactly 0.0, got $beta")
    assert(java.lang.Math.copySign(1.0, beta) == 1.0,
      s"slope must be POSITIVE zero (−0.0 hashes differently), raw bits " +
        java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(beta)))
    // zipf on the same corpus: every term has tf = 64 → constant y →
    // slope exactly +0.0 under the same recentered + signed-zero rule
    val z = TextAnalysis.vocabZipf(spark, dir).head()
    val slope = z.getDouble(1)
    assert(slope == 0.0 && java.lang.Math.copySign(1.0, slope) == 1.0,
      s"degenerate Zipf slope must be +0.0, got $slope")
    // intercept is the constant ln(tf) = ln(64)
    assert(math.abs(z.getDouble(2) - math.log(64.0)) < 1e-3)
  }

  test("single-shard corpus yields NULL heaps slope on both engines (zero x-variance)") {
    import spark.implicits._
    // one document → one occupied shard → a single prefix point; the
    // slope is undefined and both the engine and the oracle must emit
    // NULL (DuckDB would otherwise produce NaN from 0/0)
    val docs = Seq((7L, "solo text here"))
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps1").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = TextAnalysis.vocabHeaps(spark, dir).head()
    assert(h.getLong(0) == 1L)
    assert(h.isNullAt(3), "single-point fit must be NULL")
  }
}
