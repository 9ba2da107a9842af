package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact dedup: dup count matches n - distinct(text)") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val expectedDups = docs.count() - docs.select("text").distinct().count()
    val got = Dedup.exact(spark, TestSpark.sf).where(col("is_dup")).count()
    assert(got == expectedDups)
  }

  test("ngram jaccard pairs are ordered, thresholded, and symmetric-free") {
    val rows = Dedup.ngramJaccard(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty, "synthetic corpus contains near-dups")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
  }

  test("minhash LSH finds the same high-jaccard pairs as exact ngram") {
    val exact = Dedup.ngramJaccard(spark, TestSpark.sf, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, TestSpark.sf, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates pass the same exact-jaccard filter, so lsh ⊆ exact;
    // at jaccard ≥ 0.9 with 8 bands × 2 rows, P(miss) = (1-j²)⁸ < 2e-6
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"LSH missed pairs: ${exact -- lsh}")
  }

  test("minhash cap sweep: nested candidates, priced recall, top row = the production gate") {
    val rows = Dedup.minhashCapSweep(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 8L, 64L, 1000L))
    // candidates and recall are monotone in the cap (sets nest)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 <= hi._2, s"candidates shrank cap ${lo._1}->${hi._1}")
      assert(lo._4 <= hi._4 && lo._5 <= hi._5, s"recall shrank cap ${lo._1}->${hi._1}")
    }
    // n_truth is the shared exact-Jaccard truth on every row
    val nTruth = Dedup.ngramJaccard(spark, TestSpark.sf).count()
    assert(rows.forall(_._3 == nTruth))
    // the sweep's largest cap replays the production gate exactly
    val gate = Dedup.minhashCandEst(spark, TestSpark.sf, 5, 16, 2).count()
    assert(rows.last._2 == gate,
      s"cap-1000 row ${rows.last._2} != minhashCandEst pair count $gate")
  }

  test("simhash matches a brute-force recount of its contract") {
    // contract: all pairs with hamming ≤ 6 that share ≥1 of the four
    // 16-bit chunks (pigeonhole ⇒ complete for hamming ≤ 3)
    val sigs = Dedup.simhashSignatures(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def chunksOf(s: Long) = (0 to 3).map(c => (c, (s >> (c * 16)) & 0xffffL))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 6 && chunksOf(sa).intersect(chunksOf(sb)).nonEmpty
    } yield ((a, b), h.toLong)).toMap
    val got = Dedup.simhash(spark, TestSpark.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("simhash candidate buckets are occupancy-capped (the anti-quadratic gate)") {
    // bucketCap = 0 drops EVERY bucket before the self-join — zero
    // candidates proves the gate sits on the candidate path, not on a
    // side branch the optimizer could prune away
    assert(Dedup.simhash(spark, TestSpark.sf, bucketCap = 0L).count() == 0L)
    // a restrictive cap yields a SUBSET of the default result (the
    // gate only ever drops candidates, never invents or rescores)
    val all = Dedup.simhash(spark, TestSpark.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val capped = Dedup.simhash(spark, TestSpark.sf, bucketCap = 2L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(capped.toSet.subsetOf(all.toSet))
    // wider 32-bit chunks: still a subset of the hamming≤6 pair set,
    // with every surviving pair agreeing on one of the two chunk halves
    val wide = Dedup.simhash(spark, TestSpark.sf, chunkBits = 32).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val sigMap = Dedup.simhashSignatures(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide.toSet.subsetOf(all.toSet))
    wide.keys.foreach { case (a, b) =>
      val (sa, sb) = (sigMap(a), sigMap(b))
      assert((sa & 0xffffffffL) == (sb & 0xffffffffL) || (sa >>> 32) == (sb >>> 32))
    }
  }

  test("connected components converge on a chain longer than one propagation hop") {
    import spark.implicits._
    // 1-2-3-4-5 chain (needs multiple rounds: 5's label reaches 1 only
    // via propagation), plus an isolated pair and a singleton-free node set
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L)).toDF("a_id", "b_id")
    // localThreshold = 0 pins the DISTRIBUTED min-label loop — the
    // default would solve a 5-edge graph on the driver
    val got = Dedup.connectedComponents(edges, localThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("local and distributed connected components agree on the corpus edge set") {
    val edges = Dedup.ngramJaccard(spark, TestSpark.sf).select("a_id", "b_id")
    val local = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(edges, localThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local.nonEmpty && local == dist)
  }

  test("connected components match a driver-side union-find over the same pairs") {
    val pairs = Dedup.ngramJaccard(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    // canonical = min id per component
    val canon = expected.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn)
    }
    val got = Dedup.dedupClusters(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == canon)
  }

  test("df cap bounds candidates under a universal boilerplate shingle without losing true dups") {
    import spark.implicits._
    // 40 docs sharing ONE boilerplate 5-gram (df=40) with otherwise
    // unique text, plus one genuine duplicate pair (docs 40/41) whose
    // shingles all have df=2
    val docs = (0 until 40).map { i =>
      (i.toLong, s"B1 B2 B3 B4 B5 u${i}a u${i}b u${i}c u${i}d u${i}e")
    } :+ (40L, "D1 D2 D3 D4 D5 D6 D7 D8 D9 D10") :+ (41L, "D1 D2 D3 D4 D5 D6 D7 D8 D9 D10")
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // threshold 0 surfaces EVERY candidate pair the blocked join
    // generated: uncapped, the universal shingle alone funnels
    // 40·39/2 = 780 pairs through one reducer key
    val uncapped = Dedup.ngramJaccard(spark, dir, threshold = 0.0).count()
    assert(uncapped >= 780L, s"expected the hot shingle to generate >=780 pairs, got $uncapped")
    // capped at df<=10 the boilerplate shingle is dropped, so the only
    // surviving candidate is the true duplicate pair — candidates are
    // bounded by REAL shared content, not boilerplate
    val capped = Dedup.ngramJaccard(spark, dir, threshold = 0.0, maxDf = 10L).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((40L, 41L)),
      s"capped candidates: ${capped.mkString(",")}")
    assert(capped.head.getDouble(2) == 1.0)
  }

  test("substring dedup flags an embedded verbatim passage that n-gram Jaccard misses") {
    import spark.implicits._
    val passage = (1 to 30).map(i => s"tok$i").mkString(" ")      // ~200 chars
    val host = (1 to 40).map(i => s"pre$i").mkString(" ") + " " + passage + " " +
      (1 to 40).map(i => s"post$i").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val docs = Seq((0L, host), (1L, passage), (2L, other)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-substr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.substringDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // the embedded passage is contained: overlap vs the SMALLER doc ≈ 1
    assert(rows.contains((0L, 1L)), s"got ${rows.keySet}")
    assert(rows((0L, 1L)) >= 0.9, s"containment overlap ${rows((0L, 1L))}")
    // the unrelated doc pairs with nothing
    assert(!rows.keySet.exists { case (a, b) => a == 2L || b == 2L })
    // ...while n-gram Jaccard scores the same pair LOW (the set measure
    // dilutes the shared passage by the host's length) — the reason
    // substring dedup exists as its own operator
    val jac = Dedup.ngramJaccard(spark, dir, threshold = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.get((0L, 1L)).forall(_ < 0.5), s"jaccard ${jac.get((0L, 1L))}")
  }

  test("repeated dedup invocations reuse cached intermediates (no cache growth)") {
    Dedup.ngramJaccard(spark, TestSpark.sf).count()
    Dedup.minhashLsh(spark, TestSpark.sf).count()
    val after1 = spark.sparkContext.getPersistentRDDs.size
    Dedup.ngramJaccard(spark, TestSpark.sf).count()
    Dedup.minhashLsh(spark, TestSpark.sf).count()
    val after2 = spark.sparkContext.getPersistentRDDs.size
    // <=, not ==: the shared session's ContextCleaner may asynchronously
    // reclaim unrelated (e.g. localCheckpoint) RDDs between the probes —
    // the invariant is that repeats ADD nothing
    assert(after2 <= after1,
      s"repeat invocations must not add cache entries ($after1 -> $after2)")
  }

  test("embedding near-dup pairs stay within label blocks") {
    val rows = Dedup.embeddingNearDup(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(3) >= 0.3))
  }

  test("LSH-blocked embedding near-dup: pairs verified exact, recall vs brute force, blocks bounded") {
    val threshold = 0.4
    val rows = Dedup.embeddingNearDupLsh(spark, TestSpark.sf, threshold = threshold)
      .collect()
    assert(rows.nonEmpty, "corpus has pairs above the default threshold")
    // brute-force ground truth: every pair >= threshold, driver-side
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toArray.sorted
    val exactPairs = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      if cos(vecs(ids(i)), vecs(ids(j))) >= threshold
    } yield (ids(i), ids(j))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every reported pair is exact-verified and a true >=threshold pair
    rows.foreach { r =>
      val exact = cos(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(math.abs(exact - r.getDouble(2)) < 1e-4)
      assert(r.getDouble(2) >= threshold)
    }
    assert(got.subsetOf(exactPairs), s"false positives: ${got -- exactPairs}")
    // recall of banded blocking vs the exact scan — deterministic
    // (seed-fixed hyperplanes); measured ≈0.9 at this threshold
    val recall = got.size.toDouble / exactPairs.size
    assert(recall >= 0.75, s"recall $recall = ${got.size}/${exactPairs.size}")
    // blocking is real: no single (band, bucket) block's pair count
    // approaches the all-pairs space (the claim label blocking can't make)
    val occ = graft.operators.Lsh.assignBandBuckets(spark, TestSpark.sf, 32, 6)
      .groupBy("band", "bucket").count().collect().map(_.getLong(2))
    val n = ids.length.toLong
    val maxBlockPairs = occ.map(c => c * (c - 1) / 2).max
    assert(maxBlockPairs < n * (n - 1) / 2 / 20,
      s"largest block generates $maxBlockPairs candidate pairs of ${n * (n - 1) / 2}")
  }

  test("labeled LSH near-dup: exact-scored subset of the label-blocked scan") {
    val exactRows = Dedup.embeddingNearDup(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val got = Dedup.embeddingNearDupLabeled(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exactRows.contains(key), s"pair $key not in the exact label-blocked scan")
      assert(math.abs(exactRows(key) - r.getDouble(3)) < 1e-9,
        s"score drift on $key: lsh ${r.getDouble(3)} vs exact ${exactRows(key)}")
    }
    // the LSH gate may deterministically miss low-cosine pairs; it must
    // still surface the bulk of what the exact scan finds
    val recall = got.length.toDouble / exactRows.size
    assert(recall >= 0.6, s"labeled recall $recall = ${got.length}/${exactRows.size}")
  }

  test("dedup report totals equal recounts over the per-document verdicts") {
    val rep = Dedup.dedupReport(spark, TestSpark.sf).collect()
    val exactDups = Dedup.exact(spark, TestSpark.sf).collect().count(_.getBoolean(2))
    val nearDocs = Dedup.ngramJaccard(spark, TestSpark.sf).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rep.map(_.getAs[Long]("n_exact_dups")).sum == exactDups.toLong)
    assert(rep.map(_.getAs[Long]("n_neardup_docs")).sum == nearDocs.size.toLong)
    rep.foreach { r =>
      assert(r.getAs[Double]("keep_frac") ==
        (r.getAs[Long]("n_docs") - r.getAs[Long]("n_exact_dups")).toDouble / r.getAs[Long]("n_docs"))
    }
  }

  test("decontamination matches a driver-side shingle-overlap recount") {
    val got = Dedup.decontaminate(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val gotWitness = Dedup.decontaminate(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4)
    def sh(text: String): Set[String] =
      text.split(' ').sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val (evalDocs, trainDocs) = docs.partition { case (id, _) => bucket(id) < "0ccc" }
    val evalShingles = evalDocs.flatMap(d => sh(d._2)).toSet
    assert(got.keySet == trainDocs.map(_._1).toSet, "every train doc is reported")
    trainDocs.foreach { case (id, text) =>
      val shared = (sh(text) & evalShingles).size.toLong
      assert(got(id) == ((shared, shared >= 3L)), s"doc $id")
      // witness: the eval doc sharing the most distinct shingles,
      // ties to the lowest id, (-1, 0) when nothing is shared
      val pair = evalDocs.map { case (eid, etext) => (eid, (sh(text) & sh(etext)).size.toLong) }
        .filter(_._2 > 0)
      val expectedW =
        if (pair.isEmpty) (-1L, 0L)
        else { val w = pair.minBy { case (eid, c) => (-c, eid) }; (w._1, w._2) }
      assert(gotWitness(id) == expectedW, s"witness for doc $id")
    }
    assert(got.values.exists(_._2), "the corpus's near-dups straddle the split")
    assert(got.values.exists(!_._2))
    assert(gotWitness.values.exists(_._1 >= 0L), "some witness is reported")
  }

  test("semantic dedup keeps exactly one doc per duplicate cluster, pairs cell-local") {
    val rows = Dedup.semanticDedup(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty, "corpus has within-cell pairs above the default threshold")
    // exactly one kept doc per cluster, and it is the cluster minimum
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      val kept = members.filter(_.getAs[Boolean]("is_kept"))
      assert(kept.length == 1, s"cluster $cid kept ${kept.length}")
      assert(kept.head.getAs[Long]("vec_id") == members.map(_.getAs[Long]("vec_id")).min)
      assert(cid == members.map(_.getAs[Long]("vec_id")).min)
    }
    // every clustered doc really has a high-cosine partner in its
    // k-means cell: verify against a driver-side exact recount over
    // the SAME persisted assignment the operator used
    val (assigned, _) = graft.operators.Ivf.ensureIndex(spark, TestSpark.sf, 16)
    val byCell = assigned.select("vec_id", "cell", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // the operator thresholds the ROUNDED score (SURVEY §4) — mirror it
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val inPairs = (for {
      a <- byCell; b <- byCell
      if a._2 == b._2 && a._1 < b._1 && r5(cos(a._3, b._3)) >= 0.4
    } yield Set(a._1, b._1)).flatten.toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet == inPairs,
      "clustered ids must be exactly the docs appearing in a within-cell pair")
  }

  /** Driver-side distinct trigram sets per doc — the recount base for
    * the boilerplate specs. */
  private def trigramSets(): Map[Long, Set[String]] =
    Tables.documents(spark, TestSpark.sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val sh = if (toks.length >= 3)
          (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
        else Set.empty[String]
        (r.getLong(0), sh)
      }.toMap

  test("incremental near-dup gate matches a driver-side split recount") {
    def md5hex4(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.take(2).map(b => f"${b & 0xff}%02x").mkString
    }
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 5-gram distinct sets (df cap is a no-op at this corpus size)
    val sets = Tables.documents(spark, TestSpark.sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val sh = if (toks.length >= 5)
          (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" ")).toSet
        else Set.empty[String]
        (r.getLong(0), sh)
      }.filter(_._2.nonEmpty)
    val (newDocs, corpus) = sets.partition { case (id, _) => md5hex4(id.toString) < "1999" }
    val expected = newDocs.flatMap { case (id, sa) =>
      val best = corpus.flatMap { case (cid, sb) =>
        val inter = (sa & sb).size
        val j = r5(inter.toDouble / (sa.size + sb.size - inter))
        if (inter > 0 && j >= 0.8) Some((cid, j)) else None
      }.sortBy { case (cid, j) => (-j, cid) }.headOption
      best.map { case (cid, j) => (id, (cid, j)) }
    }.toMap
    val got = Dedup.incrementalNearDup(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty, "the synthetic near-dups straddle the hash split")
    assert(got == expected)
    // the gate never flags corpus-side docs
    assert(got.keySet.forall(id => md5hex4(id.toString) < "1999"))
  }

  test("boilerplate ngrams match a driver-side df recount") {
    val sets = trigramSets()
    val df = sets.values.flatten.groupBy(identity).map { case (s, o) => (s, o.size.toLong) }
    val expected = df.filter(_._2 >= 3).toSeq
      .sortBy { case (s, d) => (-d, s) }.take(20)
    val got = Dedup.boilerplateNgrams(spark, TestSpark.sf, minDf = 3, topN = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("boilerplate ratio matches a per-doc recount against the df>=cap set") {
    val sets = trigramSets()
    val df = sets.values.flatten.groupBy(identity).map { case (s, o) => (s, o.size) }
    val boiler = df.filter(_._2 >= 3).keySet
    val got = Dedup.boilerplateRatio(spark, TestSpark.sf, minDf = 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // only docs with >=1 shingle appear
    assert(got.keySet == sets.filter(_._2.nonEmpty).keySet)
    sets.filter(_._2.nonEmpty).foreach { case (id, sh) =>
      val (nSh, nB) = got(id)
      assert(nSh == sh.size, s"doc $id shingle count")
      assert(nB == sh.count(boiler), s"doc $id boilerplate count")
    }
    assert(got.values.exists(_._2 > 0), "corpus has boilerplate-bearing docs")
  }

  test("source overlap matches a driver-side pairwise jaccard over source shingle sets") {
    val docs = Tables.documents(spark, TestSpark.sf).select("source", "text").collect()
    val bySource = docs.groupBy(_.getString(0)).map { case (s, rs) =>
      (s, rs.flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        if (toks.length >= 5)
          (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" "))
        else Seq.empty
      }.toSet)
    }
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (sa, xa) <- bySource; (sb, xb) <- bySource
      if sa < sb
      inter = (xa & xb).size
      if inter > 0
    } yield ((sa, sb), (inter.toLong, r5(inter.toDouble / (xa.size + xb.size - inter)))))
      .toMap
    val got = Dedup.sourceOverlap(spark, TestSpark.sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty, "synthetic near-dups straddle sources")
    assert(got == expected)
  }

  test("minhash recall eval: identical shingle sets are always found (pigeonhole)") {
    val rows = Dedup.minhashRecallEval(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty, "truth pairs exist at sf0.001")
    rows.foreach { r =>
      val (jac, found) = (r.getDouble(2), r.getBoolean(3))
      assert(jac >= 0.8)
      // jaccard 1.0 => equal capped shingle sets => equal signatures
      // => every band collides: a miss here is an implementation bug,
      // not sketch noise
      if (jac == 1.0) assert(found, s"exact-duplicate pair missed by banding: $r")
      if (found) {
        val est = r.getDouble(4)
        assert(est >= 0.0 && est <= 1.0)
      } else assert(r.isNullAt(4))
    }
  }

  test("semantic decontamination: split respected, witness is the max-cosine train match") {
    def isEval(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      hex < "1999"
    }
    val rows = Dedup.decontaminateSemantic(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty, "contaminated eval items exist at sf0.001")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one witness per eval item")
    rows.foreach { r =>
      assert(isEval(r.getLong(0)), s"eval side must be in the hash split: $r")
      assert(!isEval(r.getLong(1)), s"witness must be a train item: $r")
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("bloom prefilter is one-sided: candidates cover every exact contamination") {
    val exact = Dedup.decontaminate(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val bloom = Dedup.bloomDecontaminate(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(bloom.keySet == exact.keySet, "both report every train doc")
    exact.foreach { case (doc, (nShared, contaminated)) =>
      val (nHits, candidate) = bloom(doc)
      // a truly shared shingle has all its bits set, so the Bloom
      // count can only overcount (false positives), never undercount
      assert(nHits >= nShared, s"doc $doc: bloom hits $nHits < exact shared $nShared")
      if (contaminated) assert(candidate, s"doc $doc contaminated but not a bloom candidate")
    }
  }

  test("threshold sweep is monotone and agrees with ngramJaccard at 0.8") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Dedup.thresholdSweep(spark, TestSpark.sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    // tightening the threshold can only shrink pairs and flags
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) >= b.getLong(1), "pair count must fall with threshold")
        assert(a.getLong(2) >= b.getLong(2), "flag count must fall with threshold")
      case _ => ()
    }
    val at08 = rows.find(_.getDouble(0) == 0.8).get
    val pairs08 = graft.operators.Dedup.ngramJaccard(spark, TestSpark.sf).collect()
    assert(at08.getLong(1) == pairs08.length.toLong, "0.8 row must equal the dedup query")
    assert(at08.getLong(2) == pairs08.map(_.getLong(1)).distinct.length.toLong)
  }

  test("item coverage audit recounts against the three tables") {
    import org.apache.spark.sql.functions.{col, get_json_object}
    val refs = graft.Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(get_json_object(col("props"), "$.k").cast("long").as("i"))
      .where(col("i").isNotNull).collect().map(_.getLong(0))
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val items = refs.distinct
    val r = graft.operators.Curation.itemCoverageAudit(spark, TestSpark.sf).collect().head
    assert(r.getLong(0) == items.length.toLong)
    assert(r.getLong(1) == items.count(emb).toLong)
    assert(r.getLong(2) == items.count(docs).toLong)
    assert(r.getLong(4) == refs.length.toLong)
    assert(r.getLong(5) == refs.count(emb).toLong)
  }

  test("band sweep: nested-band monotonicity, r=2 row equals the recall eval") {
    val rows = graft.operators.Dedup.minhashBandSweep(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    // widths divide each other, so a coarse-band collision implies
    // collisions in every sub-band: candidates and recall only fall
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) >= b.getLong(2), "candidates must be non-increasing")
        assert(a.getDouble(5) >= b.getDouble(5), "recall must be non-increasing")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getLong(1) == 16 / r.getLong(0))
      assert(r.getLong(4) <= r.getLong(3) && r.getLong(4) <= r.getLong(2))
    }
    val at2 = rows.find(_.getLong(0) == 2L).get
    val eval2 = graft.operators.Dedup.minhashRecallEval(spark, TestSpark.sf).collect()
    assert(at2.getLong(3) == eval2.length.toLong, "truth count")
    assert(at2.getLong(4) == eval2.count(_.getBoolean(3)).toLong, "found count")
  }

  test("source affinity matrix folds exactly the thresholded LSH pair frame") {
    import org.apache.spark.sql.functions.col
    val mat = graft.operators.Dedup.dedupSourceMatrix(spark, TestSpark.sf).collect()
    val pairs = graft.operators.Dedup.embeddingNearDupLsh(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcOf = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.map { case (k, g) => k -> (g.length.toLong, r5(g.map(_._3).sum / g.length)) }
    assert(mat.length == want.size)
    mat.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (n, avg) = want(k)
      assert(r.getString(0) <= r.getString(1), s"unordered key $k")
      assert(r.getLong(2) == n, s"$k n_pairs")
      assert(math.abs(r.getDouble(3) - avg) < 2e-5, s"$k avg_score")
    }
    // conservation: matrix cells partition the pair frame
    assert(mat.map(_.getLong(2)).sum == pairs.length.toLong)
  }

  test("simhash radius sweep nests candidates and reconciles with the pair frames") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.Dedup.simhashRadiusSweep(spark, TestSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // monotone nesting: a wider radius can only add candidates/finds
    Seq(1, 3).foreach { c =>
      rows.map(_.getLong(c)).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"column $c not nested")
        case _ => ()
      }
    }
    // the radius-3 row reconciles with the surfaced pair frame and
    // the shared exact-Jaccard truth
    val at3 = rows.last
    val cand3 = graft.operators.Dedup.simhash(spark, TestSpark.sf, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(at3.getLong(1) == cand3.length.toLong, "radius-3 candidate count")
    val truth = graft.operators.Dedup.ngramJaccard(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at3.getLong(2) == truth.size.toLong, "truth count")
    assert(at3.getLong(3) ==
      cand3.count { case (a, b, _) => truth((a, b)) }.toLong, "radius-3 found count")
    // per-radius recounts from the same frames
    rows.foreach { r =>
      val rad = r.getLong(0)
      val cr = cand3.filter(_._3 <= rad)
      assert(r.getLong(1) == cr.length.toLong, s"radius $rad candidates")
      assert(r.getLong(3) == cr.count { case (a, b, _) => truth((a, b)) }.toLong,
        s"radius $rad found")
    }
  }
}
