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

  test("graph walks: deterministic, edge-valid, contiguous, hash-selected") {
    val a = Graph.graphWalks(spark, TestSpark.sf).collect()
    val b = Graph.graphWalks(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq, "hash-driven walks must be bit-deterministic")
    assert(a.nonEmpty)
    // rebuild the neighbor lists the operator walked over
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull).distinct()
    val edges = ui.as("a").join(ui.as("b"), "user_id")
      .where(col("a.item_id") =!= col("b.item_id"))
      .select(col("a.item_id").as("src"), col("b.item_id").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).toSeq.sorted }
    val walks = a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
    walks.foreach { case ((seed, w), rows) =>
      val path = rows.sortBy(_._3)
      // positions contiguous from 0; step 0 sits at the seed
      assert(path.map(_._3).toSeq == path.indices.map(_.toLong))
      assert(path.head._4 == seed)
      // every hop is a real edge AND the md5-selected neighbor
      path.sliding(2).foreach {
        case Array((_, _, t, u), (_, _, _, v)) =>
          assert(edges.contains((u, v)), s"walk used a non-edge $u->$v")
          val ns = nbrs(u)
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$seed:$w:$t:$u".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString
          assert(v == ns((java.lang.Long.parseLong(hex, 16) % ns.length).toInt),
            s"hop at ($seed,$w,$t) picked the wrong neighbor")
        case _ => ()
      }
      // a truncated walk is only legal at a sink
      if (path.length < 5) assert(!nbrs.contains(path.last._4))
    }
  }

  test("node2vec walks: deterministic, first step uniform-degenerate, biased draws recount") {
    val a = Graph.node2vecWalks(spark, TestSpark.sf).collect()
    val b = Graph.node2vecWalks(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq)
    // first hop has no prev → all weights wFar → the draw degenerates
    // to graphWalks' uniform hash choice: pos-1 nodes must agree
    val dw = Graph.graphWalks(spark, TestSpark.sf).collect()
      .filter(_.getLong(2) <= 1)
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    a.filter(_.getLong(2) <= 1).foreach { r =>
      assert(dw((r.getLong(0), r.getLong(1), r.getLong(2))) == r.getLong(3),
        s"first-step divergence at $r")
    }
    // full recount of every biased hop: weights 1/2/1 over dst-sorted
    // candidates, cumulative intervals, r = u32(md5) mod total
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull).distinct()
    val edges = ui.as("a").join(ui.as("b"), "user_id")
      .where(col("a.item_id") =!= col("b.item_id"))
      .select(col("a.item_id").as("src"), col("b.item_id").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nbrs = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq.sorted }
    def u32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2)).foreach { case ((seed, w), rows) =>
        val path = rows.sortBy(_._3).map(_._4).toSeq
        path.indices.drop(1).foreach { t =>
          val (prev, cur) = (if (t >= 2) path(t - 2) else -1L, path(t - 1))
          val cands = nbrs(cur).map { x =>
            val wt = if (x == prev) 1L
                     else if (edges.contains((prev, x))) 2L else 1L
            (x, wt)
          }
          val tot = cands.map(_._2).sum
          val r = u32(s"$seed:$w:${t - 1}:$cur") % tot
          val pick = cands.scanLeft((-1L, 0L)) { case ((_, c), (x, wt)) => (x, c + wt) }
            .drop(1).find(_._2 > r).get._1
          assert(path(t) == pick, s"hop $t of walk ($seed,$w): ${path(t)} vs $pick")
        }
      }
  }

  test("sgns negatives: k per pair, each draw matches the alias-table replay") {
    val got = Graph.sgnsNegatives(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // exactly kNeg=3 rows per distinct pair
    got.groupBy(t => (t._1, t._2)).foreach { case (p, rows) =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L), p.toString)
    }
    // driver replay of the whole sampler: pow-free weights, sharded
    // cums, bucket ranges, md5 draw
    val counts = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull).distinct()
      .groupBy("item_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val w = counts.map { case (i, c) =>
      i -> math.floor(math.sqrt(c.toDouble) * math.sqrt(math.sqrt(c.toDouble)) * 1024).toLong
    }
    // shard-major cum order: shard asc, then item asc within shard
    val ordered = w.sortBy { case (i, _) => (i % 64, i) }
    val z = w.map(_._2).sum
    val bucketOf = new Array[Long](4096)
    var cum = 0L
    ordered.foreach { case (i, wi) =>
      val (lo, hi) = (cum * 4096 / z, (cum + wi) * 4096 / z)
      (lo until hi).foreach(b => bucketOf(b.toInt) = i)
      cum += wi
    }
    def u32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    got.foreach { case (c, x, j, neg) =>
      val b = (u32(s"$c:$x:$j") % 4096).toInt
      assert(neg == bucketOf(b), s"pair ($c,$x) draw $j: $neg vs ${bucketOf(b)}")
    }
  }

  test("skip-gram pairs conserve the walk corpus exactly") {
    val walks = Graph.graphWalks(spark, TestSpark.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // driver recount: every ordered within-window pair, by (center,
    // context, dist) — the operator's aggregate must match exactly
    val want = walks.values.toSeq.flatMap { rows =>
      val path = rows.sortBy(_._2).toSeq
      for {
        a <- path; b <- path
        if a._2 != b._2 && math.abs(a._2 - b._2) <= 2
      } yield (a._3, b._3, math.abs(a._2 - b._2))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Graph.walkSkipgrams(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == want)
    // symmetric window ⇒ the pair multiset is direction-symmetric
    got.foreach { case ((c, x, d), n) => assert(got((x, c, d)) == n) }
  }

  test("k-core matches a driver peel to convergence and is a true core") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val k = 3
    val got = Graph.itemKcore(spark, TestSpark.sf, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver third impl: peel to convergence (not fixed rounds) —
    // agreement also proves 8 rounds sufficed at test scale
    val ui = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = ui.groupBy(_._1).filter(_._2.length <= 500)
    val edges: Set[(Long, Long)] = baskets.values.flatMap { g =>
      val items = g.map(_._2).distinct.toSeq
      for (a <- items; b <- items if a != b) yield (a, b)
    }.toSet
    var alive: Set[Long] = edges.map(_._1)
    var changed = true
    while (changed) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (v, es) => v -> es.size }
      val next = deg.filter(_._2 >= k).keySet
      changed = next != alive
      alive = next
    }
    val deg = edges.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    assert(got.toMap == deg, s"spark=${got.length} driver=${deg.size}")
    got.foreach { case (_, d) => assert(d >= k) }
  }

  test("pagerank ranks a hub above a leaf") {
    // the item co-engaged with the most others should outrank the
    // bottom of the list strictly (sanity that iteration moved mass)
    val rows = Graph.itemPagerank(spark, TestSpark.sf, topN = 1000).collect()
    assert(rows.head.getLong(1) > rows.last.getLong(1),
      "a co-engagement graph with any structure must not be rank-uniform")
  }

  test("flow-HITS matches an independent driver replay of the integer rounds") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val HScale = 1L << 20
    val ev = graft.Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull)
      .collect()
    val byUser = ev.groupBy(_.getLong(0)).values
      .filter(_.length <= 2000)
      .map(_.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(3)).toSeq)
    val edges = byUser.flatMap(seq =>
      seq.sliding(2).filter(p => p.length == 2 && p(0) != p(1)).map(p => (p(0), p(1))))
      .toSeq.groupBy(identity).map { case ((s, d), g) => (s, d, g.size.toLong) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> HScale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      val araw = edges.groupBy(_._2).map { case (d, g) =>
        d -> g.map(e => e._3 * h.getOrElse(e._1, 0L)).sum }
      val amax = araw.values.max
      a = araw.map { case (k, v) => k -> v * HScale / amax }
      val hraw = edges.groupBy(_._1).map { case (s, g) =>
        s -> g.map(e => e._3 * a.getOrElse(e._2, 0L)).sum }
      val hmax = hraw.values.max
      h = hraw.map { case (k, v) => k -> v * HScale / hmax }
    }
    val expect = a.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val rows = graft.operators.Graph.itemFlowHits(spark, TestSpark.sf).collect()
    assert(rows.length == expect.length.min(20))
    rows.zip(expect).foreach { case (r, (id, s)) =>
      assert(r.getLong(0) == id, s"item order: got ${r.getLong(0)} want $id")
      assert(r.getLong(1) == s, s"authority_scaled for $id")
      assert(r.getDouble(2) ==
        BigDecimal(s.toDouble / HScale).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(3) ==
        BigDecimal(h.getOrElse(id, 0L).toDouble / HScale)
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble, s"hub for $id")
    }
  }
}
