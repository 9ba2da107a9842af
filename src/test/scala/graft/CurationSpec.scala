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

  test("sequence packing covers every token once with contiguous per-shard bins") {
    val bins = Curation.packSequences(spark, TestSpark.sf, budgetTokens = 2048L).collect()
    assert(bins.nonEmpty)
    val corpusTotal = Tables.documents(spark, TestSpark.sf)
      .agg(sum(ceil(length(col("text")) / lit(4.0)).cast("long"))).head.getLong(0)
    assert(bins.map(_.getAs[Long]("tok_sum")).sum == corpusTotal,
      "every estimated token must land in exactly one bin")
    bins.groupBy(_.getAs[String]("shard")).foreach { case (shard, rows) =>
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L,
        s"shard $shard bins must be contiguous from 0: ${ids.mkString(",")}")
      // the packing contract: the doc that OPENS bin j+1 has
      // cumulative-before ≥ (j+1)·budget, so the prefix sum of bins
      // 0..j must have reached (j+1)·budget — non-final bins fill to
      // the boundary (modulo the one overflowing doc), they never
      // close early
      val sums = rows.sortBy(_.getAs[Long]("bin")).map(_.getAs[Long]("tok_sum"))
      sums.scanLeft(0L)(_ + _).tail.zipWithIndex.dropRight(1).foreach { case (prefix, j) =>
        assert(prefix >= (j + 1L) * 2048L,
          s"shard $shard bins 0..$j hold $prefix tokens < ${(j + 1) * 2048} boundary")
      }
    }
  }

  test("mixture sampling matches a driver-side md5 recount per source") {
    val got = Curation.mixtureSample(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "source").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
    val thr = Map("src0" -> "cccc", "src1" -> "8000", "src2" -> "4000", "src3" -> "2000")
      .withDefaultValue("1000")
    val expect = docs.groupBy(_.getString(1)).map { case (src, rows) =>
      src -> (rows.length.toLong,
        rows.count(r => bucket(r.getLong(0)) < thr(src)).toLong)
    }
    assert(got == expect)
    // and the keep decision needs no shuffle (scan predicate + one agg)
    val kept = got.values.map(_._2).sum
    assert(kept > 0, "default rates must keep a non-empty mix")
  }

  test("percentile quality gate matches a driver-side quantile recount") {
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stop = Set("the", "a")
    val qs = Tables.documents(spark, TestSpark.sf).select("source", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val n = toks.length.toLong
        val types = toks.distinct.length.toLong
        val ns = toks.count(stop).toLong
        (r.getString(0),
          r5((2 * math.min(n, 100) * n + 150 * types + 150 * (n - ns)).toDouble / (500 * n)))
      }
    // rank (n−1)·p linear interpolation — the percentile/quantile_cont def
    val sorted = qs.map(_._2).sorted
    val rank = (sorted.length - 1) * 0.25
    val (lo, hi) = (sorted(rank.toInt), sorted(math.ceil(rank).toInt))
    val cutoff = r5(lo + (rank - rank.toInt) * (hi - lo))
    val got = graft.operators.Curation.qualityPercentileGate(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0),
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == qs.map(_._1).toSet)
    qs.groupBy(_._1).foreach { case (src, rows) =>
      val (gotCut, nDocs, nKept, ratio) = got(src)
      assert(gotCut == cutoff, s"cutoff $gotCut vs $cutoff")
      assert(nDocs == rows.length)
      assert(nKept == rows.count(_._2 >= cutoff), s"source $src kept")
      assert(ratio == r5(nKept.toDouble / nDocs))
    }
    // the gate actually cuts: roughly a quarter of the corpus drops
    val (keptTot, docTot) = (got.values.map(_._3).sum, got.values.map(_._2).sum)
    assert(keptTot < docTot && keptTot >= docTot / 2)
  }

  test("corpus checksum is order-independent and flips on any content change") {
    val rows = Curation.corpusChecksum(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    // driver recount: xor over per-doc hashes in DOC order must equal
    // the engine's shuffle-order aggregate (order independence), and
    // doc counts must add up
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("source"),
        graft.operators.Dedup.md5Long64(
          concat(col("doc_id").cast("string"), lit(":"), md5(col("text")))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySource = docs.groupBy(_._1).map { case (s, hs) =>
      s -> (hs.length.toLong, hs.map(_._2).foldLeft(0L)(_ ^ _))
    }
    bySource.foreach { case (s, (n, x)) =>
      assert(rows(s)._1 == n && rows(s)._2 == x, s"source $s checksum mismatch")
    }
  }

  test("weighted sample is exactly the top-N of the driver-replayed priority formula") {
    val got = Curation.weightedSample(spark, TestSpark.sf, n = 50).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val all = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("n_chars"),
        (graft.operators.Dedup.md5Long64(concat(lit("ws:"), col("doc_id").cast("string")))
          .bitwiseAND(lit((1L << 48) - 1)) + 1L).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1) * (1L << 44) / r.getLong(2)))
    val expected = all.sortBy { case (id, p) => (-p, id) }.take(50)
    assert(got.toSeq == expected.toSeq)
    // the draw is genuinely size-biased: mean sampled length beats corpus mean
    val lens = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampleMean = got.map(g => lens(g._1)).sum.toDouble / got.length
    val corpusMean = lens.values.sum.toDouble / lens.size
    assert(sampleMean > corpusMean, f"weighting must favor long docs: $sampleMean%.1f vs $corpusMean%.1f")
  }

  test("shard plan: ceil-division identities hold at a multi-shard target") {
    val rows = Curation.outputShardPlan(spark, TestSpark.sf, targetBytes = 1024L)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(3) > 1), "target must force multi-shard sources")
    rows.foreach { r =>
      val (n, bytes, shards, dps, sb) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // shards is the least count with every shard under target
      // (ceil), except the floor of one shard minimum
      assert(shards >= 1)
      if (shards > 1) assert((shards - 1) * 1024 < bytes)
      assert(shards * 1024 >= bytes || shards == 1)
      // docs_per_shard covers all docs, and not wastefully
      assert(dps * shards >= n)
      assert((dps - 1) * shards < n)
      assert(sb == bytes / shards)
    }
  }

  test("dsir selection: deterministic, score = logw + replayable gumbel, sorted cut") {
    val a = Curation.dsirSelect(spark, TestSpark.sf).collect()
    val b = Curation.dsirSelect(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq, "md5-driven selection must be bit-deterministic")
    assert(a.length == 50)
    // the emitted score must be the emitted logw plus THIS doc's
    // md5-Gumbel draw — the noise is a pure function of doc_id, so a
    // driver recount catches any drift in the hashed-LM weighting
    a.foreach { r =>
      val (doc, logw, score) = (r.getLong(0), r.getDouble(3), r.getDouble(4))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$doc".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val g = -math.log(-math.log(u))
      assert(math.abs(score - (logw + g)) < 1e-5 + 1e-9,
        s"doc $doc: score $score != logw $logw + gumbel $g")
      assert(r.getLong(2) > 0, "a selected doc must carry features")
    }
    // rows arrive as the ranked cut: score non-increasing, ties by id
    a.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getDouble(4) > y.getDouble(4) ||
          (x.getDouble(4) == y.getDouble(4) && x.getLong(0) < y.getLong(0)))
      case _ => ()
    }
  }

  test("nb classifier: classified set = featured eval docs, counts reconcile") {
    val rows = Curation.nbSourceClassify(spark, TestSpark.sf).collect()
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the classified population is exactly the held-out docs that
    // carry at least one >=2-char token (featureless docs score -inf
    // under any bag model and are excluded, documented behavior)
    val evalDocs = docs
      .filter(r => !(md5hex(r.getLong(0).toString).take(4) < "cccc"))
      .filter(r => "[a-z0-9_]{2,}".r.findFirstIn(r.getString(2).toLowerCase).isDefined)
    assert(rows.map(_.getLong(1)).sum == evalDocs.length,
      "sum of per-source test counts must equal the featured eval split")
    // every prediction lands on exactly one true row: n_pred sums match
    assert(rows.map(_.getLong(3)).sum == evalDocs.length)
    val bySrc = evalDocs.groupBy(_.getString(1)).map { case (s, g) => s -> g.length }
    rows.foreach { r =>
      assert(r.getLong(1) == bySrc(r.getString(0)).toLong, s"n_docs for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(2) <= r.getLong(3))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("sample representativeness chi2 recounts from the corpus") {
    import org.apache.spark.sql.functions.col
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getString(1), md5hex(r.getLong(0).toString).take(4) < "0ccc"))
    val bySrc = docs.groupBy(_._1)
    val (nc, ns) = (docs.length.toLong, docs.count(_._2).toLong)
    val rows = graft.operators.Curation.sampleRepCheck(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == bySrc.keys.toSeq.sorted)
    var chi2 = 0.0
    rows.foreach { r =>
      val g = bySrc(r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.count(_._2).toLong)
      val exp = r5(ns.toDouble * g.length / nc)
      assert(r.getDouble(3) == exp, s"expected for ${r.getString(0)}")
      val contrib = if (exp > 0)
        r5((g.count(_._2) - exp) * (g.count(_._2) - exp) / exp) else 0.0
      assert(r.getDouble(4) == contrib, s"contrib for ${r.getString(0)}")
      chi2 += contrib
      assert(r.getLong(6) == bySrc.size.toLong - 1, "df")
    }
    rows.foreach(r => assert(r.getDouble(5) == r5(chi2), "chi2 total"))
  }

  test("pack efficiency sweep reconciles with packSequences at every budget") {
    val rows = Curation.packEfficiencySweep(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1024L, 2048L, 4096L))
    rows.foreach { r =>
      val bins = Curation.packSequences(spark, TestSpark.sf, r.getLong(0)).collect()
      assert(r.getLong(1) == bins.length.toLong, s"bin count at ${r.getLong(0)}")
      val nDocs = bins.map(_.getAs[Long]("n_docs")).sum
      val tok = bins.map(_.getAs[Long]("tok_sum")).sum
      def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == r5(nDocs.toDouble / bins.length))
      assert(r.getDouble(3) == r5(tok.toDouble / (bins.length * r.getLong(0))))
    }
    // a bigger budget can only reduce bins
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1))
      case _ => ()
    }
  }
}
