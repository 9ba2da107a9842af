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

  test("daily active accounting balances: active = new + returning, cum ends at total users") {
    val rows = graft.operators.Analytics.dailyActive(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"active != new+returning: $r")
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0, r.toString)
    }
    assert(rows.head.getLong(3) == 0L, "first day has no returning users")
    val totalUsers = Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(rows.last.getLong(4) == totalUsers, "cumulative must end at the user universe")
    assert(rows.map(_.getLong(4)).toSeq == rows.map(_.getLong(4)).sorted.toSeq, "cum is monotone")
  }

  test("quality composite bins are quartile-valued and sum correctly") {
    val rows = graft.operators.TextAnalysis.qualityComposite(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (l, t, s, c) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(Seq(l, t, s).forall(b => b >= 1 && b <= 4), r.toString)
      assert(c == l + t + s && c >= 3 && c <= 12, r.toString)
    }
    // quartile binning must actually spread: no signal collapses to one bin
    Seq(4, 5, 6).foreach { i =>
      assert(rows.map(_.getLong(i)).distinct.length >= 2, s"signal col $i never varies")
    }
  }

  test("label propagation is deterministic and conserves community mass") {
    val a = graft.operators.Graph.itemCommunities(spark, TestSpark.sf).collect()
    val b = graft.operators.Graph.itemCommunities(spark, TestSpark.sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "two runs must agree exactly")
    assert(a.nonEmpty)
    val items = a.map(_.getLong(0)).toSet
    a.foreach(r => assert(items(r.getLong(1)), "labels are node ids"))
    val sizes = a.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    a.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1)), s"stale size: $r"))
    assert(sizes.values.sum == a.length.toLong, "every node in exactly one community")
    // propagation must actually merge something on a co-engagement graph
    assert(sizes.size < items.size, "no community ever formed")
  }

  test("item hubs rank by degree with exact shares") {
    val rows = graft.operators.Graph.itemHubs(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val degrees = rows.map(_.getLong(1)).toSeq
    assert(degrees == degrees.sorted.reverse, "hubs must rank by degree desc")
    rows.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0, r.toString))
    assert(rows.map(_.getDouble(2)).sum <= 1.0 + 1e-9, "shares of one edge universe")
  }

  test("source quality rollup conserves the document universe and tail fractions") {
    val total = Tables.documents(spark, TestSpark.sf).count()
    val rows = graft.operators.TextAnalysis.sourceQualityReport(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(1)).sum == total, "every doc lands in exactly one source row")
    rows.foreach { r =>
      val (mean, hi, lo) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mean >= 3.0 && mean <= 12.0, r.toString)
      assert(hi >= 0.0 && hi <= 1.0 && lo >= 0.0 && lo <= 1.0 && hi + lo <= 1.0 + 1e-9, r.toString)
    }
  }

  test("embed_dim_stats covers all 64 dims with coherent bounds") {
    val n = Tables.embeddings(spark, TestSpark.sf).count()
    val rows = graft.operators.VectorSearch.embedDimStats(spark, TestSpark.sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
    rows.foreach { r =>
      assert(r.getLong(1) == n, "every dim sees every vector")
      val (mean, std, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= mean + 1e-9 && mean <= hi + 1e-9, r.toString)
      assert(std >= 0.0 && hi <= 1.0 + 1e-9 && lo >= -1.0 - 1e-9, r.toString)
    }
  }

  test("readability replays a driver-side count of one document") {
    val doc = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    def cnt(p: String, s: String) = p.r.findAllIn(s).length
    val w = cnt("[a-z0-9_]+", text.toLowerCase)
    val s = math.max(cnt("[.!?]+", text), 1)
    val y = cnt("[aeiouy]+", text.toLowerCase)
    val row = graft.operators.TextAnalysis.readability(spark, TestSpark.sf)
      .where(org.apache.spark.sql.functions.col("doc_id") === id).head()
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((w.toLong, s.toLong, y.toLong)))
    val flesch = BigDecimal(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(4) - flesch) < 1e-9)
  }

  test("q13 histogram masses sum to the customer count (left join keeps everyone)") {
    val total = Tables.customer(spark, TestSpark.sf).count()
    val got = graft.operators.Analytics.q13CustDist(spark, TestSpark.sf)
      .collect().map(_.getLong(1)).sum
    assert(got == total, s"histogram mass $got != customers $total")
  }

  test("q18 rows all exceed the quantity threshold and match a recount") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val rows = graft.operators.Analytics.q18LargeOrders(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val recount = Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_orderkey")).agg(fsum(col("l_quantity")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (okey, qty) = (r.getLong(2), r.getDouble(5))
      assert(qty > 250.0, r.toString)
      assert(math.abs(recount(okey) - qty) < 1e-6, s"order $okey qty mismatch")
    }
  }

  test("q22 counts only above-average customers inactive in the window") {
    import org.apache.spark.sql.functions.{avg, col}
    val c = Tables.customer(spark, TestSpark.sf)
    val avgBal = c.where(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal"))).head().getDouble(0)
    val activeSince = Tables.orders(spark, TestSpark.sf)
      .where(col("o_orderdate") >= "2000-01-01")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expected = c.select("c_custkey", "c_acctbal", "c_mktsegment").collect()
      .filter(r => r.getDouble(1) > avgBal && !activeSince(r.getLong(0)))
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    val got = graft.operators.Analytics.q22DormantRich(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q7 reports both directed nation pairs and no self-pairs") {
    val rows = graft.operators.Analytics.q7NationVolume(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) != r.getString(1), r.toString))
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18")), pairs.toString)
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

  test("association rules match a driver-side basket recount") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = ui.groupBy(_._1).values.map(_.map(_._2).toSet).filter(_.size <= 500).toSeq
    val n = baskets.size
    val supp = baskets.flatten.groupBy(identity).map { case (i, o) => (i, o.size) }
    val pairSupp = baskets
      .flatMap(b => for (a <- b.toSeq; c <- b.toSeq if a != c) yield (a, c))
      .groupBy(identity).map { case (p, o) => (p, o.size) }.filter(_._2 >= 3)
    val expected = pairSupp.map { case ((a, c), s) =>
      (a, c, s.toLong, r5(s.toDouble / supp(a)),
        r5(s.toDouble * n / (supp(a).toDouble * supp(c))))
    }.toSeq.sortBy(t => (-t._5, t._1, t._2)).take(25)
    val got = graft.operators.Analytics.assocRules(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("zipf fit slopes negative and matches a driver-side regression") {
    val re = "[a-z0-9_]+".r
    val tf = Tables.documents(spark, TestSpark.sf).select("text").collect()
      .flatMap(r => re.findAllIn(r.getString(0).toLowerCase).filter(_.length >= 2))
      .groupBy(identity).map { case (t, o) => (t, o.size) }
    val top = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
    val xy = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val (n, sx, sy) = (xy.size.toDouble, xy.map(_._1).sum, xy.map(_._2).sum)
    val sxx = xy.map(p => p._1 * p._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    val row = graft.operators.TextAnalysis.vocabZipf(spark, TestSpark.sf).head()
    // the tiny test corpus has < 100 distinct terms — the fit uses all
    assert(row.getLong(0) == top.size)
    assert(row.getDouble(1) < 0, "natural-ish text must slope downward")
    assert(math.abs(row.getDouble(1) - slope) < 1e-3, s"slope ${row.getDouble(1)} vs $slope")
    assert(math.abs(row.getDouble(2) - intercept) < 1e-3)
  }

  test("per-source KL matches a driver-side recount and is non-negative") {
    val re = "[a-z0-9_]+".r
    val rows = Tables.documents(spark, TestSpark.sf).select("source", "text").collect()
      .map(r => (r.getString(0), re.findAllIn(r.getString(1).toLowerCase)
        .filter(_.length >= 2).toSeq))
    val srcTf = rows.groupBy(_._1).map { case (s, docs) =>
      (s, docs.flatMap(_._2).groupBy(identity).map { case (t, o) => (t, o.size.toLong) })
    }
    val corpTf = srcTf.values.flatten.groupBy(_._1).map { case (t, o) => (t, o.map(_._2).sum) }
    val tCorp = corpTf.values.sum.toDouble
    val got = graft.operators.TextAnalysis.sourceKl(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == srcTf.keySet)
    srcTf.foreach { case (s, tfm) =>
      val tSrc = tfm.values.sum.toDouble
      val kl = tfm.map { case (t, c) =>
        (c / tSrc) * math.log((c / tSrc) / (corpTf(t) / tCorp)) }.sum
      val (nTok, nTerms, gotKl) = got(s)
      assert(nTok == tfm.values.sum && nTerms == tfm.size, s"source $s counts")
      assert(gotKl >= 0.0, "KL is non-negative")
      assert(math.abs(gotKl - kl) < 1e-3, s"source $s kl $gotKl vs $kl")
    }
  }

  test("dwell gaps recount from a driver-side per-user timeline") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._4, e._2))
      s.zip(s.tail).map { case (a, b) => (a._3, b._4 - a._4) }
    }.toSeq
    val expected = gaps.groupBy(_._1).map { case (t, g) =>
      val v = g.map(_._2)
      (t, (v.size.toLong, v.min, v.max, v.sum))
    }
    val got = graft.operators.Analytics.eventsDwell(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (n, mn, mx, sum)) =>
      val (gn, gmn, gmx, gavg) = got(t)
      assert(gn == n && gmn == mn && gmx == mx, s"type $t counts")
      val want = BigDecimal(sum.toDouble / n / 1000.0)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gavg == want, s"type $t avg $gavg vs $want")
    }
  }

  test("session stats recount sessionize's output bins exactly") {
    val s = graft.operators.Analytics.sessionize(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("duration_ms")))
    val expected = s.groupBy(_._1).map { case (k, v) => (k, (v.size.toLong, v.map(_._2).sum)) }
    val got = graft.operators.Analytics.sessionStats(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.keys.max > 1, "gap parameter must produce multi-event sessions")
  }

  test("q10 returned-revenue triage is ordered, bounded, and positive") {
    val rows = graft.operators.Analytics.q10Returns(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per customer")
    val revs = rows.map(_.getDouble(3))
    assert(revs.forall(_ > 0))
    assert(revs.toSeq == revs.sortBy(-_).toSeq)
  }

  test("promo share is the exact ratio of its own revenue columns") {
    val rows = graft.operators.Analytics.q14PromoShare(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, t, s) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p >= 0 && p <= t)
      val want = BigDecimal(100.0 * p / t).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(s == want, s"share $s vs $want")
    }
  }

  test("ltv curve recounts cohort revenue and stays monotone") {
    import org.apache.spark.sql.functions.col
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts_ms"), col("event_type"), col("value"))
      .collect().map(x => (x.getLong(0), Math.floorDiv(x.getLong(1), 604800000L),
        if (x.getString(2) == "purchase") x.getDouble(3) else 0.0))
    val cohort = ev.groupBy(_._1).map { case (u, es) => (u, es.map(_._2).min) }
    val weekRev = ev.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .map { case (k, es) => (k, r(es.map(_._3).sum, 2)) }
    val sizes = cohort.values.groupBy(identity).map { case (w, o) => (w, o.size.toLong) }
    val got = graft.operators.Analytics.userLtv(spark, TestSpark.sf).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getDouble(2), x.getDouble(3), x.getLong(4), x.getDouble(5))))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet == weekRev.keySet)
    got.groupBy(_._1._1).foreach { case (cw, rows) =>
      val ordered = rows.sortBy(_._1._2)
      var cum = 0.0
      ordered.foreach { case ((_, off), (wr, cr, n, ltv)) =>
        assert(wr == weekRev((cw, off)), s"cohort $cw offset $off weekly")
        cum = r(cum + wr, 2)
        assert(cr == cum, s"cohort $cw offset $off cumulative")
        assert(n == sizes(cw))
        assert(ltv == r(cr / n, 4))
      }
    }
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

  test("events trend slope matches a driver-side OLS over daily counts") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("ts_ms")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000L))
    val day0 = ev.map(_._2).min
    val want = ev.groupBy(_._1).map { case (t, es) =>
      val pts = es.groupBy(_._2).map { case (d, g) => (d - day0, g.size.toLong) }.toSeq
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
      val slope = BigDecimal((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> ((n, es.size.toLong, slope))
    }
    val got = graft.operators.Analytics.eventsTrend(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want)
  }

  test("acf recounts from an hourly driver series and stays in [-1, 1]") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("ts_ms")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000L))
    val hourly = ev.groupBy(identity).map { case ((t, h), g) => ((t, h), g.size.toLong) }
    val want = (for {
      lag <- Seq(1L, 24L)
      t <- ev.map(_._1).distinct
    } yield {
      val series = hourly.collect { case ((`t`, h), n) => (h, n) }.toMap
      val pairs = series.toSeq.flatMap { case (h, x) => series.get(h + lag).map(y => (x, y)) }
      val n = pairs.size.toLong
      if (n == 0) None else {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum; val syy = pairs.map(p => p._2 * p._2).sum
        val r = BigDecimal((n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((t, lag) -> ((n, r)))
      }
    }).flatten.toMap
    val got = graft.operators.Analytics.eventsAcf(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (n, r)) =>
      assert(got(k)._1 == n, s"$k n_pairs")
      assert(math.abs(got(k)._2 - r) <= 1e-5, s"$k acf ${got(k)._2} vs $r")
      assert(got(k)._2 >= -1.0 && got(k)._2 <= 1.0, s"$k out of range")
    }
  }

  test("item jaccard matches a driver-side basket recount") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = ui.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).toSet }
      .filter(_._2.size <= 500)
    val supp = baskets.values.toSeq.flatten.groupBy(identity).map { case (i, g) => i -> g.size.toLong }
    val co = baskets.values.toSeq.flatMap(b =>
      for (a <- b; x <- b if a != x) yield (a, x))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= 2L)
    val want = co.toSeq.map { case ((a, b), c) =>
      val j = BigDecimal(c.toDouble / (supp(a) + supp(b) - c).toDouble)
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c, j)
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
        .map { case ((a, b, c, j), i) => (a, b) -> ((c, j, (i + 1).toLong)) }
    }
    val got = graft.operators.Analytics.itemJaccard(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("rec_item_id")) ->
        ((r.getAs[Long]("co"), r.getAs[Double]("jaccard"), r.getAs[Long]("rk")))).toMap
    assert(got == want)
  }

  test("item PMI matches a driver-side basket recount") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = ui.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).toSet }
      .filter(_._2.size <= 500)
    val nUsers = baskets.size.toLong
    val supp = baskets.values.toSeq.flatten.groupBy(identity).map { case (i, g) => i -> g.size.toLong }
    val co = baskets.values.toSeq.flatMap(b =>
      for (a <- b; x <- b if a != x) yield (a, x))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter(_._2 >= 2L)
    val want = co.toSeq.map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log(c * nUsers / (supp(a) * supp(b)).toDouble))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c, pmi)
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
        .map { case ((a, b, c, p), i) => (a, b) -> ((c, p, (i + 1).toLong)) }
    }
    val got = graft.operators.Analytics.itemPmi(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("rec_item_id")) ->
        ((r.getAs[Long]("co"), r.getAs[Double]("pmi"), r.getAs[Long]("rk")))).toMap
    assert(got == want)
  }

  test("seasonality cells partition each type's events and shares sum to 1") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytics.eventsSeasonality(spark, TestSpark.sf).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 6))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 23))
    val byType = rows.groupBy(_.getString(0))
    val totals = Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, cells) =>
      assert(cells.map(_.getLong(3)).sum == totals(t), s"$t cell counts")
      assert(math.abs(cells.map(_.getDouble(4)).sum - 1.0) < 1e-3, s"$t share sum")
    }
  }

  test("lifecycle flows are conserved: active = new+retained+resurrected, churn balances") {
    val rows = graft.operators.Analytics.userLifecycle(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0) / 604800000L, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, active, nw, ret, res, _) =>
      assert(active == nw + ret + res, s"week $w partition")
    }
    // churn into week w = last week's actives who didn't return =
    // active(w-1) − retained(w), for consecutive weeks
    val byWeek = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (w, _, _, ret, _, churned) =>
      byWeek.get(w - 1).foreach { case (_, prevActive, _, _, _, _) =>
        assert(churned == prevActive - ret, s"week $w churn balance")
      }
    }
    // every user is new exactly once
    val totalUsers = Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(rows.map(_._3).sum == totalUsers)
  }

  test("linear attribution conserves exactly the touched purchases' revenue") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"),
        col("value"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .collect()
    val views0 = ev.filter(r => r.getString(1) == "view" && !r.isNullAt(5))
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(2)))
    val purchases0 = ev.filter(_.getString(1) == "purchase")
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2), math.round(r.getDouble(4) * 100)))
    val vDeg = views0.groupBy(_._1).map { case (u, g) => u -> g.length }
    val pDeg = purchases0.groupBy(_._1).map { case (u, g) => u -> g.length }
    def human(u: Long) = vDeg.getOrElse(u, 0) <= 1000 && pDeg.getOrElse(u, 0) <= 100
    val views = views0.filter(v => human(v._1))
    val purchases = purchases0.filter(p => human(p._1))
    val touched = purchases.map { case (u, pid, pts, cents) =>
      (pid, cents, views.count(v => v._1 == u && v._3 < pts && v._3 >= pts - 7L * 86400000L))
    }.filter(_._3 > 0)
    val rows = graft.operators.Analytics.attributionLinear(spark, TestSpark.sf).collect()
    val totalAttr = math.round(rows.map(_.getDouble(3)).sum * 100)
    // split-and-sum conserves the touched purchases' cents up to the
    // per-item round-2 (|items| half-cent worst case)
    assert(math.abs(totalAttr - touched.map(_._2).sum) <= rows.length,
      s"attributed $totalAttr vs touched ${touched.map(_._2).sum}")
    assert(rows.map(_.getLong(1)).sum == touched.map(_._3.toLong).sum, "touch count")
  }

  test("next-event prediction matches an independent split-train-eval replay") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .collect()
    val pairs = ev.groupBy(_.getLong(0)).values.flatMap { g =>
      g.sortBy(r => (r.getLong(1), r.getLong(2))).sliding(2)
        .filter(_.length == 2)
        .map(p => (p(0).getString(3), p(1).getString(3), p(0).getLong(1) / 86400000L))
    }.toSeq
    val (d0, d1) = (pairs.map(_._3).min, pairs.map(_._3).max)
    val t1 = d0 + (d1 - d0 + 1) * 80 / 100
    val model = pairs.filter(_._3 < t1).groupBy(p => (p._1, p._2))
      .map { case ((s, t), g) => (s, t, g.size) }.groupBy(_._1)
      .map { case (s, g) => s -> g.toSeq.sortBy(x => (-x._3, x._2)).head._2 }
    val evalP = pairs.filter(p => p._3 >= t1 && model.contains(p._1))
    val rows = graft.operators.Analytics.eventNextPred(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach { r =>
      val s = r.getString(0)
      val mine = evalP.filter(_._1 == s)
      assert(r.getString(1) == model(s), s"pred for $s")
      assert(r.getLong(2) == mine.size.toLong, s"n_eval for $s")
      assert(r.getLong(3) == mine.count(_._2 == model(s)).toLong, s"n_hit for $s")
    }
    assert(rows.map(_.getLong(2)).sum == evalP.size.toLong)
  }

  test("transition entropy and burstiness recount from collected events") {
    import org.apache.spark.sql.functions.col
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .collect()
    // entropy: per-state next-type counts from per-user timelines
    val pairs = ev.groupBy(_.getLong(0)).values.flatMap { g =>
      g.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getString(3))
        .sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }.toSeq
    val hRows = graft.operators.Analytics.transitionEntropy(spark, TestSpark.sf).collect()
    hRows.foreach { r =>
      val cnts = pairs.filter(_._1 == r.getString(0)).groupBy(_._2).map(_._2.size.toLong)
      val n = cnts.sum.toDouble
      assert(r.getLong(1) == cnts.sum)
      assert(r.getLong(2) == cnts.size.toLong)
      val h = math.log(n) - cnts.map(c => c * math.log(c.toDouble)).sum / n
      assert(math.abs(r.getDouble(3) - h) < 1e-4, s"entropy ${r.getString(0)}")
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9, "H <= ln(k)")
    }
    // burstiness: per-type global gaps
    val bRows = graft.operators.Analytics.eventsBurstiness(spark, TestSpark.sf).collect()
    bRows.foreach { r =>
      val ts = ev.filter(_.getString(3) == r.getString(0))
        .map(x => (x.getLong(1), x.getLong(2))).sorted.map(_._1)
      val gaps = ts.sliding(2).filter(_.length == 2).map(p => p(1) - p(0)).toSeq
      assert(r.getLong(1) == gaps.size.toLong)
      val mu = gaps.sum.toDouble / gaps.size
      val sg2 = gaps.map(g => g.toDouble * g).sum
      val sig = math.sqrt(sg2 / gaps.size - mu * mu)
      assert(math.abs(r.getDouble(4) - (sig - mu) / (sig + mu)) < 1e-4,
        s"burstiness ${r.getString(0)}")
      assert(r.getDouble(4) > -1.0 && r.getDouble(4) < 1.0)
    }
  }

  test("forecast backtest matches a driver seasonal/naive MAE recount") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("ts_ms")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000L))
    val daily = ev.groupBy(identity).map { case ((t, d), g) => (t, d) -> g.size.toLong }
    val (d0, d1) = (ev.map(_._2).min, ev.map(_._2).max)
    assert(d1 - d0 >= 14, "test corpus must span 15+ days")
    def n(t: String, d: Long) = daily.getOrElse((t, d), 0L)
    val types = ev.map(_._1).distinct.sorted
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.Analytics.eventsForecast(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == types.toSeq)
    rows.foreach { r =>
      val t = r.getString(0)
      val days = (d1 - 6) to d1
      assert(r.getLong(1) == 7L)
      assert(r.getDouble(2) == r5(days.map(d => math.abs(n(t, d) - n(t, d - 7))).sum / 7.0))
      assert(r.getDouble(3) == r5(days.map(d => math.abs(n(t, d) - n(t, d - 1))).sum / 7.0))
      assert(r.getString(4) == (if (r.getDouble(2) <= r.getDouble(3)) "seasonal" else "naive"))
    }
  }

  test("markov next-item eval matches a driver leave-last-out replay") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .collect()
    val seqs = ev.groupBy(_.getLong(0)).values
      .map(_.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(3)).toSeq)
      .filter(s => s.length >= 2 && s.length <= 2000).toSeq
    val trainPairs = seqs.flatMap(s => s.dropRight(1).sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val model = trainPairs.groupBy(_._1).map { case (src, g) =>
      src -> g.groupBy(_._2).map { case (d, h) => (d, h.size) }.toSeq
        .sortBy(x => (-x._2, x._1)).head._1
    }
    val tests = seqs.map(s => (s(s.length - 2), s.last))
    val scored = tests.filter(t => model.contains(t._1))
    val hits = scored.count(t => model(t._1) == t._2)
    val r = graft.operators.Rec.recMarkovNext(spark, TestSpark.sf).collect().head
    assert(r.getLong(0) == tests.size.toLong, "n_users")
    assert(r.getLong(1) == scored.size.toLong, "n_scored")
    assert(r.getLong(2) == hits.toLong, "n_hits")
  }

  test("conversion lag matches a driver replay of first-touch to first-purchase") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .collect()
    val byUser = ev.groupBy(_.getLong(0))
    val lags = byUser.values.flatMap { g =>
      val sorted = g.sortBy(r => (r.getLong(1), r.getLong(2)))
      val fp = sorted.filter(_.getString(3) == "purchase")
      if (fp.isEmpty) None
      else Some((sorted.head.getString(3),
        fp.map(_.getLong(1)).min - sorted.head.getLong(1)))
    }.toSeq
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val r = (s.length - 1) * p
      val (lo, hi) = (s(r.toInt), s(math.ceil(r).toInt))
      lo + (hi - lo) * (r - r.toInt)
    }
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.Analytics.conversionLag(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(1)).sum == lags.size.toLong)
    rows.foreach { r =>
      val mine = lags.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == mine.size.toLong, s"n_users ${r.getString(0)}")
      assert(r.getDouble(2) == r5(mine.sum.toDouble / mine.size / 3600000.0), "mean")
      assert(r.getDouble(3) == r5(pct(mine, 0.5) / 3600000.0), "p50")
      assert(r.getDouble(4) == r5(pct(mine, 0.9) / 3600000.0), "p90")
    }
  }

  test("markov attribution matches an independent chain replay") {
    import org.apache.spark.sql.functions.col
    val Scale = 1L << 30
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"),
        col("value"))
      .collect()
    val byUser = ev.groupBy(_.getLong(0)).values.map(
      _.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getString(3)).toSeq)
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    def bump(s: String, t: String): Unit = trans((s, t)) = trans.getOrElse((s, t), 0L) + 1
    byUser.foreach { seq =>
      bump("start", seq.head)
      seq.sliding(2).filter(_.length == 2).foreach { case Seq(a, b) =>
        bump(if (a == "purchase") "start" else a, b)
      }
      if (seq.last != "purchase") bump(seq.last, "null")
    }
    val rowTot = trans.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    def p(s: String, t: String): Long = {
      val tot = rowTot.getOrElse(s, 0L)
      if (tot == 0) 0L else trans.getOrElse((s, t), 0L) * Scale / tot
    }
    val channels = Seq("click", "error", "signup", "view")
    def conv(removed: Option[String]): Long = {
      val live = channels.filterNot(removed.contains)
      var mass = Map("start" -> Scale); var c = 0L
      for (_ <- 1 to 12) {
        c += mass.map { case (s, m) => m * p(s, "purchase") / Scale }.sum
        mass = live.map(t => t -> mass.map { case (s, m) => m * p(s, t) / Scale }.sum)
          .toMap.filter(_._2 > 0)
      }
      c
    }
    val base = conv(None)
    val effs = channels.map(ch => ch -> math.max(base - conv(Some(ch)), 0L)).toMap
    val effTot = effs.values.sum
    val cents = ev.filter(_.getString(3) == "purchase")
      .map(r => math.round(r.getDouble(4) * 100)).sum
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.Analytics.attributionMarkov(spark, TestSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == channels)
    rows.foreach { r =>
      val eff = effs(r.getString(0))
      assert(r.getDouble(1) == r5(base.toDouble / Scale), "p_conv")
      assert(r.getDouble(2) == r5((base - eff).toDouble / Scale), "p_conv_without")
      assert(r.getDouble(3) == (if (base == 0) 0.0 else r5(eff.toDouble / base)), "effect")
      assert(r.getDouble(4) ==
        (if (effTot == 0) 0L else cents * eff / effTot) / 100.0, "revenue")
    }
    // floor-division credit never exceeds the exact purchase total
    assert(rows.map(r => math.round(r.getDouble(4) * 100)).sum <= cents)
  }

  test("peak load percentiles are ordered and totals recount") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytics.eventsPeakLoad(spark, TestSpark.sf).collect()
    val totals = Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == totals.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) == totals(r.getString(0)), "event totals")
      val (p50, p95, p99, mx) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))
      assert(p50 <= p95 && p95 <= p99 && p99 <= mx, "quantile order")
      assert(r.getDouble(7) >= 1.0, "a counted minute has >= 1 event")
    }
  }

  test("decayed co-occurrence: full driver recount of bit-shift weights and top lists") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("ts_ms"))
      .where(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.map(_._3).max
    val ui = ev.groupBy(t => (t._1, t._2))
      .map { case ((u, i), g) => (u, i, g.map(_._3).max) }.toSeq
    val baskets = ui.groupBy(_._1).filter(_._2.size <= 500)
    val exp = baskets.values.flatMap { items =>
      for (a <- items; b <- items if a._2 != b._2) yield {
        val k = math.min((ref - math.min(a._3, b._3)) / 604800000L, 20L)
        ((a._2, b._2), 1L << (20 - k).toInt)
      }
    }.groupBy(_._1).map { case (p, ws) => (p, ws.map(_._2).sum, ws.size.toLong) }
    val expTop = exp.groupBy(_._1._1).flatMap { case (item, ps) =>
      ps.toSeq.sortBy { case ((_, d), w, _) => (-w, d) }.take(5).zipWithIndex
        .map { case (((s, d), w, n), i) => (s, d, w, n, i + 1L) }
    }.toSet
    val got = graft.operators.Analytics.itemCoocDecayed(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expTop, "decayed top lists diverge from the driver recount")
    // fresher pairs can only outrank staler ones of equal user count:
    // weight per contributing user is in [1, 2^20]
    got.foreach { case (_, _, w, n, _) =>
      assert(w >= n && w <= n * (1L << 20), "weight bounds per contributor")
    }
  }

  test("user erasure plan recounts every artifact row from the cohort events") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .where(col("user_id") % 97 === 0)
      .select(col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("item"), col("ts_ms"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    val inter = ev.collect { case (u, t, Some(i), _)
      if Set("view", "click", "purchase")(t) => (u, i) }
    val perUser = inter.groupBy(_._1)
    val exp = Map(
      "cohort" -> ev.map(_._1).distinct.length.toLong,
      "events.rows" -> ev.length.toLong,
      "events.day_partitions" -> ev.map(_._4 / 86400000L).distinct.length.toLong,
      "interactions.pairs" -> inter.distinct.length.toLong,
      "interactions.touched_items" -> inter.map(_._2).distinct.length.toLong,
      "als.user_factors" -> perUser.size.toLong,
      "seq_prep.windows" -> perUser.values.map { g =>
        val n = g.length; if (n >= 2 && n <= 200) (n - 1).toLong else 0L }.sum,
      "cooc.pair_contributions" -> perUser.values.map { g =>
        val b = g.map(_._2).distinct.length.toLong
        if (b <= 500) b * (b - 1) else 0L }.sum)
    val got = graft.operators.Curation.userErasurePlan(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == exp, s"erasure manifest diverges: got=$got exp=$exp")
    val actions = graft.operators.Curation.userErasurePlan(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(actions("cooc.pair_contributions") == "rebuild_artifact" &&
      actions("events.rows") == "delete_rows")
  }

  test("session co-occurrence recounts from a driver sessionization") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replay the 30-min gap rule over the (ts, event_id) order key
    val si = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var sess = 0L; var prev = Long.MinValue
      sorted.map { r =>
        if (prev == Long.MinValue || r._3 - prev > 1800000L) sess += 1
        prev = r._3
        (u, sess, r._4)
      }
    }.distinct
    val capped = si.groupBy(t => (t._1, t._2)).filter(_._2.map(_._3).distinct.size <= 100)
      .values.flatten.toSeq
    val pairs = capped.groupBy(t => (t._1, t._2)).values.flatMap { items =>
      val is = items.map(_._3).toSeq.distinct
      for (a <- is; b <- is if a != b) yield (a, b)
    }.groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
    val expTop = pairs.groupBy(_._1._1).flatMap { case (item, ps) =>
      ps.toSeq.sortBy { case ((_, d), n) => (-n, d) }.take(5).zipWithIndex
        .map { case (((s, d), n), i) => (s, d, n, i + 1L) }
    }.toSet
    val got = graft.operators.Analytics.itemCoocSession(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expTop, "session co-occurrence diverges from the driver recount")
    assert(got.nonEmpty)
  }

  test("ALS fold-in: affected users only, new users get NULL base factors") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"), col("ts_ms"))
      .where(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val split = ev.map(_._3).max - 86400000L
    val affected = ev.filter(_._3 >= split).map(_._1).distinct.toSet
    val baseUsers = ev.filter(_._3 < split).map(_._1).distinct.toSet
    val rows = graft.operators.Rec.alsFoldIn(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // the drift table is COMPLETE: exactly the affected users, no
    // drops (a user whose ratings touch only brand-new items stays
    // present with NULL new factors)
    val outUsers = rows.map(_.getLong(0)).toSet
    assert(outUsers == affected, "fold-in output must be exactly the affected users")
    rows.foreach { r =>
      val u = r.getLong(0)
      if (!baseUsers(u)) {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(5),
          s"new user $u must have NULL base factors and delta")
      } else {
        assert(!r.isNullAt(1), s"returning user $u lost base factors")
        // a base user's rated base items are in the frozen model by
        // construction, so their solve always lands
        assert(!r.isNullAt(3) && !r.isNullAt(5), s"returning user $u lost new factors")
        val l1 = math.abs(r.getLong(3) - r.getLong(1)) + math.abs(r.getLong(4) - r.getLong(2))
        assert(r.getLong(5) == l1, "l1_delta is not the exact factor L1")
      }
    }
  }

  test("ALS item-similar: exact factor dots recount against the trained factors") {
    val (_, qDf) = graft.operators.Rec.alsFactors(spark, TestSpark.sf)
    val qf = qDf.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = graft.operators.Rec.alsItemSimilar(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val expTop = qf.keys.filter(_ % 10 == 0).flatMap { t =>
      val (t1, t2) = qf(t)
      qf.toSeq.collect { case (i, (s1, s2)) if i != t => (i, t1 * s1 + t2 * s2) }
        .sortBy { case (i, s) => (-s, i) }.take(5).zipWithIndex
        .map { case ((i, s), r) => (t, r + 1L, i, s) }
    }.toSet
    assert(got.toSet == expTop, "factor-space neighbors diverge from the recount")
  }

  test("feature PSI: categorical drift recounts exactly, numeric bins from engine edges") {
    import org.apache.spark.sql.functions.{col, expr}
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("value"), col("ts_ms")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val tsplit = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val (ref, cur) = ev.partition(_._3 < tsplit)
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    def psiOf(refBins: Seq[String], curBins: Seq[String]): (Long, Long, Long, Double) = {
      val bins = (refBins ++ curBins).distinct
      val (nr, nc, b) = (refBins.size.toLong, curBins.size.toLong, bins.size.toLong)
      val terms = bins.map { bin =>
        val p = (refBins.count(_ == bin) + 0.5) / (nr + b * 0.5)
        val q = (curBins.count(_ == bin) + 0.5) / (nc + b * 0.5)
        (p - q) * math.log(p / q)
      }
      (b, nr, nc, terms.sum)
    }
    val got = graft.operators.Analytics.featurePsi(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == Set("event_type", "value"))
    // categorical feature: full independent recount
    val (b1, nr1, nc1, psi1) = psiOf(ref.map(_._1), cur.map(_._1))
    assert(got("event_type")._1 == b1 && got("event_type")._2 == nr1 &&
      got("event_type")._3 == nc1)
    assert(math.abs(got("event_type")._4 - r5(psi1)) <= 1e-5)
    // numeric feature: bins recounted from the ENGINE's own rounded
    // decile edges (the edge fit is the events_quantiles contract)
    val edges = Tables.events(spark, TestSpark.sf)
      .crossJoin(graft.Tables.events(spark, TestSpark.sf)
        .agg(expr("(min(ts_ms) + max(ts_ms)) div 2").as("tsplit")))
      .where(col("ts_ms") < col("tsplit"))
      .agg(expr("transform(percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), e -> round(e, 5))"))
      .head.getSeq[Double](0)
    def bin(v: Double) = edges.count(v >= _).toString
    val (b2, nr2, nc2, psi2) = psiOf(ref.map(t => bin(t._2)), cur.map(t => bin(t._2)))
    assert(got("value")._1 == b2 && got("value")._2 == nr2 && got("value")._3 == nc2)
    assert(math.abs(got("value")._4 - r5(psi2)) <= 1e-5)
    // PSI terms share signs: the index is non-negative by construction
    got.values.foreach { case (_, _, _, psi) => assert(psi >= 0.0) }
  }

  test("point-in-time training set: leakage-free windows recount exactly") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms"),
        org.apache.spark.sql.functions.round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val byUser = ev.groupBy(_._1)
    val d7 = 7L * 86400000L
    val exp = ev.filter(_._3 == "click").map { case (u, id, _, t, _) =>
      val mine = byUser(u)
      val past = mine.filter(e => e._4 >= t - d7 && e._4 <= t - 1)
      val fut = mine.filter(e => e._4 >= t + 1 && e._4 <= t + d7 && e._3 == "purchase")
      (u, id, t, past.length.toLong, past.map(_._5).sum,
        if (fut.nonEmpty) 1L else 0L)
    }.toSet
    val got = graft.operators.Analytics.pitTrainingSet(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == exp, "point-in-time rows diverge from the driver recount")
    assert(got.nonEmpty)
    // leakage canary: no row's own event can contribute to its
    // features or its label (an event exactly at t is excluded from
    // both frames by construction — recount already enforces it; here
    // assert the spine rows carry only strictly-past/future evidence)
    got.foreach { case (_, _, _, pe, pc, _) =>
      assert(pe >= 0 && pc >= 0)
    }
  }

  test("rec coverage recounts from the co-occurrence top lists") {
    val recs = graft.operators.Analytics.itemCooccurrence(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCat = recs.map(_._1).distinct.length.toLong
    val slots = recs.groupBy(_._2).map { case (i, g) => i -> g.size.toLong }
    val nRec = slots.size.toLong
    val total = slots.values.sum
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val decile = slots.toSeq.sortBy { case (i, n) => (-n, i) }
      .take(math.ceil(nRec / 10.0).toInt).map(_._2).sum
    val row = graft.operators.Rec.recCoverage(spark, TestSpark.sf).collect().head
    assert(row.getLong(0) == nCat && row.getLong(1) == nRec)
    assert(row.getDouble(2) == r5(nRec.toDouble / nCat))
    assert(row.getLong(3) == total)
    assert(row.getDouble(4) == r5(slots.values.max.toDouble / total))
    assert(row.getDouble(5) == r5(decile.toDouble / total))
  }

  test("temporal split partitions the stream and audits train leakage") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Curation.temporalSplitPrep(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSet == Set("train", "val", "test"))
    assert(rows.map(_._2).sum == Tables.events(spark, TestSpark.sf).count())
    // boundaries are ordered and disjoint: each split starts after the
    // previous one ends
    val byStart = rows.sortBy(_._4)
    assert(byStart.map(_._1).toSeq == Seq("train", "val", "test"))
    byStart.zip(byStart.tail).foreach { case (a, b) => assert(a._5 < b._4) }
    // leakage audit recount at this SF
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), (col("ts_ms") / 86400000L).cast("long").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (d0, d1) = (ev.map(_._2).min, ev.map(_._2).max)
    val t1 = d0 + (d1 - d0 + 1) * 80 / 100
    val trainU = ev.filter(_._2 < t1).map(_._1).toSet
    rows.filter(_._1 != "train").foreach { case (s, _, _, from, to, inTrain) =>
      val us = ev.filter(e => e._2 * 86400000L >= from && e._2 * 86400000L <= to)
        .map(_._1).toSet
      assert(inTrain == us.count(trainU.contains), s"$s leakage")
    }
  }

  test("discount lift anchors at 1.0 for zero discount and recounts a level") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytics.discountLift(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val zero = rows.find(_._1 == 0L).get
    assert(zero._4 == 1.0, "zero-discount lift is the anchor")
    // recount one nonzero level from the raw table
    val some = rows.find(_._1 > 0L).get
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select((col("l_discount") * 100).cast("long").as("d"), col("l_quantity"))
      .where(col("d") === some._1).collect()
    assert(some._2 == li.length)
    val avg = li.map(_.getDouble(1).toLong).sum.toDouble / li.length
    assert(math.abs(some._3 - avg) < 1e-4)
    // every line lands in exactly one level
    assert(rows.map(_._2).sum == Tables.lineitem(spark, TestSpark.sf).count())
  }

  test("Welch t-test replays from a driver-side exact-cents recount") {
    import org.apache.spark.sql.functions.col
    val cents = Tables.events(spark, TestSpark.sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).sum) }
    val (a, b) = cents.partition(_._1 % 2 == 0)
    def mom(xs: Iterable[Long]) = {
      val n = xs.size.toLong
      (n, xs.sum, xs.map(x => x * x).sum)
    }
    val (na, sxa, sxxa) = mom(a.values); val (nb, sxb, sxxb) = mom(b.values)
    def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val muA = sxa / 100.0 / na; val muB = sxb / 100.0 / nb
    val se2a = (sxxa.toDouble - sxa.toDouble * sxa.toDouble / na) / (na - 1) / 10000.0 / na
    val se2b = (sxxb.toDouble - sxb.toDouble * sxb.toDouble / nb) / (nb - 1) / 10000.0 / nb
    val row = graft.operators.Analytics.experimentTtest(spark, TestSpark.sf).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(row.getDouble(2) == r(muA, 5) && row.getDouble(3) == r(muB, 5))
    assert(math.abs(row.getDouble(4) - (muA - muB) / math.sqrt(se2a + se2b)) < 1e-4)
    val df = (se2a + se2b) * (se2a + se2b) /
      (se2a * se2a / (na - 1) + se2b * se2b / (nb - 1))
    assert(math.abs(row.getDouble(5) - df) < 1e-2)
    // Welch df lives between min(n)-1 and n_a+n_b-2
    assert(row.getDouble(5) >= math.min(na, nb) - 1 && row.getDouble(5) <= na + nb - 2)
  }

  test("personalized pagerank concentrates mass at the seed and conserves it") {
    val rows = graft.operators.Graph.itemPpr(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val seed = rows.head._1
    assert(rows.forall(_._1 == seed))
    // the seed itself must carry the max mass (restart pins 15% there)
    assert(rows.head._2 == seed, s"top row ${rows.head} is not the seed")
    assert(rows.head._3 == rows.map(_._3).max)
    // floor division only LEAKS mass: total ≤ 2^34, and the seed keeps
    // at least the restart share
    assert(rows.map(_._3).sum <= (1L << 34))
    assert(rows.head._3 >= (15L * (1L << 34)) / 100L)
    // ranks strictly positive and sorted descending (ties by item id)
    assert(rows.forall(_._3 > 0))
    val rs = rows.map(_._3)
    assert(rs.zip(rs.tail).forall { case (x, y) => x >= y })
  }

  test("seq prep windows match a driver replay of every user sequence") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ev = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("ts_ms"), col("event_id")).where(col("item").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).filter(_._2.length <= 200).toSeq.flatMap {
      case (u, rows) =>
        val seq = rows.sortBy(r => (r._3, r._4)).map(_._2).toSeq
        seq.indices.drop(1).map { i =>
          val ctx = seq.slice(math.max(0, i - 5), i)
          (u, (i + 1).toLong, seq(i), ctx.mkString(":"), ctx.length.toLong)
        }
    }.sortBy(t => (t._1, t._2))
    val got = graft.operators.Rec.seqPrep(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == want)
    // every context is non-empty from position 2 on and never exceeds
    // the window
    got.foreach { case (_, pos, _, _, len) =>
      assert(len >= 1 && len <= 5 && len == math.min(pos - 1, 5L))
    }
  }

  test("rec holdout eval: hit rate is monotone in K and bounded by eligibility") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val rows = graft.operators.Rec.recHoldoutEval(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L))
    val eligible = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull).distinct()
      .groupBy("user_id").count()
      .where(col("count") >= 2 && col("count") <= 500).count()
    rows.foreach { case (_, nUsers, nHits, rate) =>
      assert(nUsers == eligible)
      assert(nHits >= 0 && nHits <= nUsers)
      assert(math.abs(rate - nHits.toDouble / nUsers) < 1e-5)
    }
    // more slots can only add hits
    val hits = rows.sortBy(_._1).map(_._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b })
  }

  test("user-user CF recs: own items excluded, contiguous ranks, exact neighbor-sum scores") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val got = graft.operators.Rec.recUserCfTopK(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val own = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (u, _, item, score, nNbrs) =>
      assert(u % 50 == 0)
      assert(!own((u, item)), s"recommended own item: $u -> $item")
      assert(score >= nNbrs, "each contributing neighbor has sim_scaled >= 1")
      assert(nNbrs >= 1 && nNbrs <= 20)
    }
    // ranks are 1..n per user, scores non-increasing along the rank
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(sorted.length <= 10)
    }
  }

  test("rank-2 ALS: driver replay matches factors, recs exclude seen items, fit report recounts") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val S = 100000L; val lam = 1000000000L; val cl = 5000000L
    // interactions with the r <= 20 confidence cap
    val r = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(identity).map { case ((u, i), g) => (u, i, math.min(g.size, 20).toLong) }.toSeq
    assert(r.nonEmpty)
    // replay: hash init + two alternating sweeps with the engine's
    // exact integer sums and fixed double Cramer tree
    def init(i: Long, t: String) = java.lang.Long.parseLong(md5hex(s"als$t:$i").take(8), 16) % S
    def solve(side: Seq[(Long, Long, Long)], g: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] =
      side.groupBy(_._1).map { case (a, rows) =>
        var a11 = 0L; var a12 = 0L; var a22 = 0L; var b1 = 0L; var b2 = 0L
        rows.foreach { case (_, b, rr) =>
          val (f1, f2) = g(b)
          a11 += f1 * f1; a12 += f1 * f2; a22 += f2 * f2; b1 += rr * f1; b2 += rr * f2
        }
        val (va11, va12, va22) = ((a11 + lam).toDouble, a12.toDouble, (a22 + lam).toDouble)
        val (vb1, vb2) = ((b1 * S).toDouble, (b2 * S).toDouble)
        val det = va11 * va22 - va12 * va12
        def quant(x: Double) =
          math.min(math.max(math.floor(x * 100000.0 + 0.5).toLong, -cl), cl)
        a -> ((quant((vb1 * va22 - vb2 * va12) / det), quant((va11 * vb2 - va12 * vb1) / det)))
      }
    var qf = r.map(_._2).distinct.map(i => i -> ((init(i, "q1"), init(i, "q2")))).toMap
    var pf = Map.empty[Long, (Long, Long)]
    val ri = r.map(t => (t._2, t._1, t._3))
    for (_ <- 1 to 2) { pf = solve(r, qf); qf = solve(ri, pf) }
    val (pDf, qDf) = graft.operators.Rec.alsFactors(spark, TestSpark.sf)
    val pGot = pDf.collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val qGot = qDf.collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(pGot == pf, "user factors diverge from the driver replay")
    assert(qGot == qf, "item factors diverge from the driver replay")
    // recommendations: sampled users only, own items excluded, exact
    // replayed dot scores, contiguous ranks with non-increasing scores
    val seen = r.map(t => (t._1, t._2)).toSet
    val recs = graft.operators.Rec.recAlsTopK(spark, TestSpark.sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(recs.nonEmpty)
    recs.foreach { case (u, _, i, s) =>
      assert(u % 50 == 0)
      assert(!seen((u, i)), s"recommended an already-seen item: $u -> $i")
      val (p1, p2) = pf(u); val (q1, q2) = qf(i)
      assert(s == p1 * q1 + p2 * q2, "score is not the exact factor dot")
    }
    recs.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq && sorted.length <= 5)
      val ss = sorted.map(_._4)
      assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    }
    // fit report: exact replayed RMSEs (BigInt squared-residual sum —
    // the DECIMAL(38,0) twin), distincts and nnz recounted
    val fit = graft.operators.Rec.alsFitReport(spark, TestSpark.sf).collect().head
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nnz = r.size.toLong
    val sse = r.map { case (u, i, rr) =>
      val (p1, p2) = pf(u); val (q1, q2) = qf(i)
      val e = BigInt(rr * S * S - (p1 * q1 + p2 * q2)); e * e
    }.sum
    val (sr, sr2) = (r.map(_._3).sum, r.map(t => t._3 * t._3).sum)
    assert(fit.getLong(0) == r.map(_._1).distinct.size.toLong)
    assert(fit.getLong(1) == r.map(_._2).distinct.size.toLong)
    assert(fit.getLong(2) == nnz)
    assert(fit.getDouble(3) == r5(math.sqrt(
      (sr2.toDouble - sr.toDouble * sr.toDouble / nnz.toDouble) / nnz.toDouble)))
    assert(fit.getDouble(4) == r5(math.sqrt(sse.toDouble / nnz.toDouble) / 1.0e10))
  }

  test("interaction-matrix stats recount from the distinct pair frame") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (nU, nI, nnz) = (ui.map(_._1).distinct.length.toLong,
      ui.map(_._2).distinct.length.toLong, ui.length.toLong)
    val deg = ui.groupBy(_._2).map { case (i, g) => i -> g.size.toLong }
    val decile = deg.toSeq.sortBy { case (i, d) => (-d, i) }
      .take(math.ceil(deg.size / 10.0).toInt).map(_._2).sum
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = graft.operators.Rec.uiMatrixStats(spark, TestSpark.sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((nU, nI, nnz)))
    assert(row.getDouble(3) == r5(nnz.toDouble / (nU * nI)))
    assert(row.getDouble(4) == r5(nnz.toDouble / nU))
    assert(row.getDouble(5) == r5(nnz.toDouble / nI))
    assert(row.getDouble(6) == r5(decile.toDouble / nnz))
  }

  test("content holdout eval shares the split with the behavioral eval") {
    val content = graft.operators.Rec.recContentHoldout(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val behavioral = graft.operators.Rec.recHoldoutEval(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(content.map(_._1).toSeq == Seq(1L, 5L, 10L))
    // identical eligibility: both evals rank the same holdout users
    assert(content.map(_._2).toSet == behavioral.map(_._2).toSet)
    content.foreach { case (_, nUsers, nHits, rate) =>
      assert(nHits >= 0 && nHits <= nUsers)
      assert(math.abs(rate - nHits.toDouble / nUsers) < 1e-5)
    }
    val hits = content.sortBy(_._1).map(_._3)
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b })
  }

  test("scale-approx mode: sketch paths agree with exact within their documented bounds") {
    val names = Seq("events_quantiles", "interevent_gaps", "ship_latency",
      "events_peak_load", "len_deciles", "ui_matrix_stats")
    def runAll() = names.map(n =>
      n -> SparkEntry.queries(n)(spark, TestSpark.sf)).toMap
    val exactDf = runAll()
    val exact = exactDf.map { case (n, df) => n -> df.collect() }
    spark.conf.set("spark.graft.scale.approx", "true")
    val (approxDf, approx) = try {
      val dfs = runAll()
      (dfs, dfs.map { case (n, df) => n -> df.collect() })
    } finally spark.conf.unset("spark.graft.scale.approx")
    // identical column names and types on both paths (nullability may
    // differ — a literal-derived column loses its not-null mark) —
    // the flag must never change the query's contract
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    names.foreach { n =>
      assert(shape(approxDf(n)) == shape(exactDf(n)),
        s"$n: approx schema drifted: ${shape(approxDf(n))} vs ${shape(exactDf(n))}")
    }
    // per-type rows align and the exact (non-sketch) columns agree
    for (n <- Seq("events_quantiles", "interevent_gaps", "ship_latency", "events_peak_load")) {
      val (e, a) = (exact(n), approx(n))
      assert(a.map(_.get(0)).toSeq == e.map(_.get(0)).toSeq, s"$n: key rows differ")
      val counts = exactDf(n).schema.fieldNames.zipWithIndex
        .filter { case (f, _) => f.startsWith("n_") || f.startsWith("sum_") || f.startsWith("max_") }
      counts.foreach { case (f, i) =>
        assert(a.map(_.get(i)).toSeq == e.map(_.get(i)).toSeq, s"$n.$f must stay exact") }
    }
    // the sketch's guarantee is on RANK, not value: the approx median
    // must be an actual order statistic bracketing the target rank
    // (rank error ≤ n/10000 < 1 at this scale → ±1 index)
    {
      import org.apache.spark.sql.functions.{col, min => smin, datediff}
      val days = Tables.lineitem(spark, TestSpark.sf)
        .groupBy(col("l_orderkey")).agg(smin(col("l_shipdate")).as("fs"))
        .join(Tables.orders(spark, TestSpark.sf), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), datediff(col("fs"), col("o_orderdate")).cast("long").as("d"))
        .collect().groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
      approx("ship_latency").foreach { r =>
        val sorted = days(r.getString(0))
        val m = r.getDouble(3) // median_days, 3-decimal round of a true sample
        val v = math.round(m * 1000).toDouble / 1000
        val first = sorted.indexWhere(_.toDouble == v)
        assert(first >= 0, s"${r.getString(0)}: approx median $v is not an actual latency value")
        val last = sorted.lastIndexWhere(_.toDouble == v)
        val target = 0.5 * (sorted.length - 1)
        assert(target >= first - 1 && target <= last + 1,
          s"${r.getString(0)}: approx median rank [$first,$last] misses target $target beyond the bound")
      }
    }
    // len_deciles approx path: tile populations may shift on boundary
    // ties (documented) but mass and the overall range are conserved
    locally {
      val (e, a) = (exact("len_deciles"), approx("len_deciles"))
      def l(r: org.apache.spark.sql.Row, i: Int) = r.getAs[Number](i).longValue
      assert(a.map(l(_, 1)).sum == e.map(l(_, 1)).sum, "len_deciles mass")
      assert(a.map(l(_, 2)).min == e.map(l(_, 2)).min, "global min length")
      assert(a.map(l(_, 3)).max == e.map(l(_, 3)).max, "global max length")
    }
    // ui_matrix_stats: nnz stays exact; HLL distincts within 5%
    locally {
      val (e, a) = (exact("ui_matrix_stats").head, approx("ui_matrix_stats").head)
      assert(a.getLong(2) == e.getLong(2), "nnz must stay exact")
      Seq(0, 1).foreach { i =>
        val (ev, av) = (e.getLong(i).toDouble, a.getLong(i).toDouble)
        assert(math.abs(av - ev) / ev <= 0.05, s"HLL col $i off by >5%: $av vs $ev")
      }
    }
  }

  test("content shortlist scores match exact rescoring; ranks never beat the exhaustive twin") {
    def byUser(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val lsh = byUser(graft.operators.Rec.contentRanks(spark, TestSpark.sf, shortlist = true))
    val ex = byUser(graft.operators.Rec.contentRanks(spark, TestSpark.sf, shortlist = false))
    assert(lsh.nonEmpty, "the LSH blocking must shortlist at least one holdout at test scale")
    // a shortlisted holdout is by definition scorable by the exhaustive path
    assert(lsh.keySet.subsetOf(ex.keySet))
    lsh.foreach { case (u, (h, sH, rank)) =>
      val (hE, sE, rankE) = ex(u)
      assert(h == hE)
      assert(sH == sE, s"user $u: the shortlist path must score the holdout with the same exact cosine")
      assert(rank <= rankE, s"user $u: rank among a candidate SUBSET can only improve ($rank vs $rankE)")
    }
  }

  test("cohort LTV conserves revenue and accumulates monotonically") {
    import org.apache.spark.sql.functions.{col, round => rnd, sum => ssum}
    val rows = graft.operators.Analytics.userCohortLtv(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // total cents across the triangle = total purchase revenue cents
    val totalCents = Tables.events(spark, TestSpark.sf)
      .where(col("event_type") === "purchase")
      .agg(ssum(rnd(col("value") * 100).cast("long"))).collect().head.getLong(0)
    assert(math.round(rows.map(_._4).sum * 100) == totalCents)
    // per cohort: ages strictly increase and cum LTV never decreases
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byAge = g.sortBy(_._2)
      assert(byAge.map(_._2).distinct.length == byAge.length)
      val ltv = byAge.map(_._5)
      assert(ltv.zip(ltv.tail).forall { case (a, b) => a <= b + 1e-9 })
    }
    // cohort sizes partition the full user base
    val users = Tables.events(spark, TestSpark.sf).select("user_id").distinct().count()
    assert(rows.groupBy(_._1).map(_._2.head._3).sum == users)
  }

  test("type overlap matches a driver-side audience recount") {
    import org.apache.spark.sql.functions.col
    val d = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = d.groupBy(_._2).map { case (t, g) => t -> g.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    val want = (for {
      a <- types; b <- types if a < b
      both = (byType(a) & byType(b)).size.toLong if both > 0
    } yield {
      val j = BigDecimal(both.toDouble / (byType(a).size + byType(b).size - both))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b) -> ((byType(a).size.toLong, byType(b).size.toLong, both, j))
    }).toMap
    val got = graft.operators.Analytics.eventsTypeOverlap(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == want)
  }

  test("survival curve telescopes its risk set and never increases") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Analytics.eventsSurvival(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val buyers = Tables.events(spark, TestSpark.sf)
      .where(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.head._2 == buyers, "day-0 risk set = all first-purchasers")
    // consecutive rows: next risk set = this one minus exits
    rows.zip(rows.tail).foreach { case ((_, r1, e1, c1, _, _), (_, r2, _, _, _, _)) =>
      assert(r2 == r1 - e1 - c1, "risk telescope")
    }
    val s = rows.map(_._6)
    assert(s.zip(s.tail).forall { case (a, b) => a >= b - 1e-9 }, "S non-increasing")
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
    // exits are fully accounted: everyone converts or censors
    assert(rows.map(r => r._3 + r._4).sum == buyers)
  }

  test("mixture plan: weights normalize and alpha=1 reduces to proportional") {
    val rows = graft.operators.Curation.mixturePlan(spark, TestSpark.sf).collect()
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getLong(5)).sum - 1000000L) < 1000L)
    // alpha < 1 upsamples the tail: min weight rises vs proportional p
    val minW = rows.map(r => r.getDouble(4)).min
    val minP = rows.map(r => r.getDouble(3)).min
    assert(minW >= minP - 1e-9)
    val prop = graft.operators.Curation.mixturePlan(spark, TestSpark.sf, alpha = 1.0)
      .collect()
    prop.foreach(r => assert(math.abs(r.getDouble(4) - r.getDouble(3)) <= 2e-5,
      s"alpha=1 weight ${r.getDouble(4)} vs p ${r.getDouble(3)}"))
  }

  test("popularity baseline replays a driver rank recount on the shared split") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Rec.recPopularityBaseline(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 5L, 10L))
    // driver replay: same split, same popularity ranking, same
    // own-items-above subtraction
    val ui: Seq[(Long, Long, Long)] = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .selectExpr("user_id", "cast(get_json_object(props, '$.k') as long) as item_id", "ts_ms")
      .where(col("item_id").isNotNull)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((u, i), g) => (u, i, g.map(_._3).max) }.toSeq
    val byUser = ui.groupBy(_._1).filter { case (_, g) => g.size >= 2 && g.size <= 500 }
    val holdTrain = byUser.map { case (u, g) =>
      val sorted = g.toSeq.sortBy(t => (-t._3, -t._2))
      (u, sorted.head._2, sorted.tail.map(_._2).toSet)
    }.toSeq
    val pop = holdTrain.flatMap(_._3).groupBy(identity).map { case (i, g) => i -> g.size }
    val glist = pop.toSeq.sortBy { case (i, p) => (-p, i) }.take(510).map(_._1)
    val gpos = glist.zipWithIndex.map { case (i, p) => i -> (p + 1L) }.toMap
    val ranks = holdTrain.flatMap { case (_, h, train) =>
      gpos.get(h).map(g => g - train.count(t => gpos.get(t).exists(_ < g)))
    }
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == holdTrain.length.toLong, "n_users")
      assert(r.getLong(2) == ranks.count(_ <= k).toLong, s"n_hits@$k")
    }
    // the floor exists: hits monotone in K, bounded by users
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).sorted.toSeq)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("events changepoint matches a driver CUSUM recount per type") {
    val got = graft.operators.Analytics.eventsChangepoint(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val daily = Tables.events(spark, TestSpark.sf)
      .selectExpr("event_type", "ts_ms div 86400000 as day").collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case ((t, d), g) => (t, d, g.size.toLong) }.toSeq
    got.foreach { r =>
      val t = r.getString(0)
      val series = daily.filter(_._1 == t).sortBy(_._2)
      val total = series.map(_._3).sum
      val nDays = series.length.toLong
      assert(r.getLong(1) == nDays && r.getLong(2) == total)
      // integer-exact argmax of |prefix*D - t*T|, ties to earlier day
      val cands = series.zipWithIndex.map { case ((_, day, _), i) =>
        val prefix = series.take(i + 1).map(_._3).sum
        (day, i + 1L, prefix, (prefix * nDays - (i + 1) * total).abs)
      }
      val best = cands.maxBy { case (day, _, _, num) => (num, -day) }
      assert(r.getLong(3) == best._1 * 86400000L, s"$t cp day")
      assert(r.getDouble(4) == r5(best._4.toDouble / nDays), s"$t cusum")
      assert(r.getDouble(5) == r5(best._3.toDouble / best._2), s"$t mean_before")
      if (best._2 == nDays) assert(r.isNullAt(6), s"$t last-day peak must NULL after")
      else assert(r.getDouble(6) ==
        r5((total - best._3).toDouble / (nDays - best._2)), s"$t mean_after")
    }
  }
}
