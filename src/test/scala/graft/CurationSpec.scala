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

  test("nb calibration bins partition the classified set and reconcile with classify") {
    val cal = Curation.nbCalibration(spark, TestSpark.sf).collect()
    val cls = Curation.nbSourceClassify(spark, TestSpark.sf).collect()
    assert(cal.nonEmpty)
    // bins are a partition of exactly the docs classify scored, and
    // per-bin corrects sum to classify's global correct count
    assert(cal.map(_.getAs[Long]("n_docs")).sum == cls.map(_.getLong(1)).sum)
    assert(cal.map(_.getAs[Long]("n_correct")).sum == cls.map(_.getLong(2)).sum)
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    cal.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9)
      val conf = r.getAs[Double]("mean_conf")
      // mean confidence lives inside its own bin's width (bin 9 also
      // holds conf = 1.0 exactly)
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean_conf $conf outside its width")
      // softmax of the predicted (max) class is never below uniform
      assert(conf >= 1.0 / 20 - 1e-9, "predicted-class softmax below uniform")
      assert(r.getAs[Double]("accuracy") >= 0.0 && r.getAs[Double]("accuracy") <= 1.0)
      assert(r.getAs[Double]("gap") ==
        r5(r.getAs[Double]("mean_conf") - r.getAs[Double]("accuracy")))
    }
  }

  test("doc clusters: top terms per cell reconcile with a driver recount of summed tf-idf") {
    val rows = Curation.docClusters(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // coverage: occupancy over distinct clusters = the whole corpus
    val occ = rows.map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_docs")).distinct
    val n = Tables.documents(spark, TestSpark.sf).count()
    assert(occ.map(_._2).sum == n, s"cluster occupancies ${occ.mkString(",")} != corpus $n")
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (c, g) =>
      val rks = g.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq, s"cluster $c ranks ${rks.mkString(",")}")
      // weights arrive rank-ordered: descending, ties broken term asc
      val byRk = g.sortBy(_.getAs[Long]("rk"))
      byRk.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("weight") > b.getAs[Double]("weight") ||
            (a.getAs[Double]("weight") == b.getAs[Double]("weight") &&
              a.getAs[String]("term") < b.getAs[String]("term")))
        case _ => ()
      }
    }
  }

  test("cluster-balanced sample keeps min(occupancy, cap) per cell with md5-exact ranks") {
    val rows = Curation.clusterBalancedSample(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // every kept row's hash key is the driver-recomputed md5 prefix
    rows.foreach { r =>
      assert(r.getAs[String]("hk") ==
        md5hex(s"cbal:${r.getAs[Long]("vec_id")}").take(8))
    }
    // per cell: exactly min(n_cell, 8) kept, ranks contiguous from 1
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (c, g) =>
      val expect = math.min(g.head.getAs[Long]("n_cell"), 8L)
      assert(g.length.toLong == expect, s"cluster $c kept ${g.length}, expected $expect")
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to expect).toSeq)
    }
    // no doc kept twice across cells (assignment is a partition)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    // occupancies cover the corpus
    val occ = rows.map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_cell")).distinct
    assert(occ.map(_._2).sum == Tables.embeddings(spark, TestSpark.sf).count())
  }

  test("doremi weights replay the EG tilt from the ppl gap and exact token counts") {
    val rows = Curation.doremiWeights(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gap = graft.operators.TextAnalysis.lmHoldoutPpl(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("source") -> Option(r.get(5)).fold(0.0)(_ =>
        r.getAs[Double]("gap"))).toMap
    val tw = rows.map { r =>
      r.getAs[String]("source") ->
        r.getAs[Long]("n_tokens") * math.exp(math.max(gap.getOrElse(r.getAs[String]("source"), 0.0), 0.0))
    }.toMap
    val z = tw.values.sum
    val totTok = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Double]("excess") ==
        math.max(gap.getOrElse(s, 0.0), 0.0), s"excess for $s")
      assert(math.abs(r.getAs[Double]("weight") - tw(s) / z) < 2e-5, s"weight for $s")
      assert(r.getAs[Double]("base_share") == r5(r.getAs[Long]("n_tokens") / totTok))
      assert(r.getAs[Long]("alloc_tokens") ==
        math.round(r.getAs[Double]("weight") * 1000000L))
      // the EG step never DOWN-weights below baseline share times the
      // normalizer shrink: a zero-excess source's weight <= base_share
      if (r.getAs[Double]("excess") == 0.0)
        assert(r.getAs[Double]("weight") <= r.getAs[Double]("base_share") + 1e-9)
    }
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-3)
  }

  test("k-center coreset replays a driver greedy run exactly; radius curve non-increasing") {
    val rows = Curation.coresetKCenter(spark, TestSpark.sf).collect()
    assert(rows.length == 8)
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    // driver replay of the greedy traversal
    var sel = Vector(emb.head)
    var expect = Vector[(Long, Option[Double])](emb.head._1 -> None)
    (2 to 8).foreach { _ =>
      val (id, v, md) = emb.map { case (id, v) =>
        (id, v, sel.map(s => d2(v, s._2)).min)
      }.maxBy { case (id, _, md) => (md, -id) }
      sel :+= (id -> v)
      expect :+= (id -> Some(r5(md)))
    }
    assert(rows.map(r => r.getLong(1) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq == expect)
    // coverage radius can only shrink as exemplars accumulate
    val ds = rows.flatMap(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    ds.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"radius grew: $a -> $b")
      case _ => ()
    }
  }
}
