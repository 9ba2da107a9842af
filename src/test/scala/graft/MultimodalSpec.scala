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

  test("frame sampling with stride 1 reassembles the original payload") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf).toDF().limit(20).cache()
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
    // collect_list order is not shuffle-stable; sort by frame_idx inside the array
    val rebuilt = frames
      .groupBy("media_id")
      .agg(sort_array(collect_list(struct(col("frame_idx"), col("frame")))).as("parts"))
      .as[(Long, Seq[(Long, Array[Byte])])].collect()
      .map { case (id, parts) => id -> parts.flatMap(_._2).toSeq }.toMap
    val orig = media.as[Multimodal.Media].collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    assert(rebuilt == orig)
  }

  test("frame sampling stride keeps every Nth frame only") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf).toDF().limit(20)
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
    val bad = frames.where(col("frame_idx") % 4 =!= 0).count()
    assert(bad == 0 && frames.count() > 0)
  }

  test("resize emits fixed-shape payloads, deterministically, without shuffling") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf).limit(20).cache()
    val resized = Multimodal.resizeStub(media, targetW = 16, targetH = 8)
    val rows = resized.collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.payload.length == 16 * 8 && r.width == 16 && r.height == 8))
    // deterministic: same input → same bytes
    val again = Multimodal.resizeStub(media, 16, 8).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(rows.map(r => r.media_id -> r.payload.toSeq).toMap == again)
    // narrow transform: no exchange in the plan
    val p = resized.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(600))
  }

  test("real JDK codec round-trips a generated PNG; stub handles the rest") {
    import spark.implicits._
    // paint a 40×24 PNG: left half dark (low luminance bins), right
    // half pure white (luminance 255 → bin 15)
    val img = new java.awt.image.BufferedImage(40, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 40)
      img.setRGB(x, y, if (x < 20) 0x101010 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // direct decode: true pixel dimensions + luminance histogram
    val Some((w, h, feat)) = Multimodal.decodeImage(png)
    assert(w == 40 && h == 24)
    assert(math.abs(feat(15) - 0.5f) < 1e-6, "white half fills luminance bin 15")
    assert(math.abs(feat.sum - 1.0f) < 1e-3)
    // non-image bytes refuse to decode (fall back to the stub seam)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    // through the distributed path: the PNG row gets REAL dimensions,
    // the text-payload row falls back to the stub
    val media = Seq(
      Multimodal.Media(1L, "image", png),
      Multimodal.Media(2L, "image", "plain text pretending".getBytes("UTF-8"))).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 40 && feats(1L).height == 24)
    val stubbed = Multimodal.stubDecode("plain text pretending".getBytes("UTF-8"))
    assert(feats(2L).width == stubbed._1 && feats(2L).height == stubbed._2)
    // real resize: 40×24 PNG → 8×8 PNG that decodes back at 8×8 with
    // both luminance extremes still present
    val resized = Multimodal.resizeImages(media, targetW = 8, targetH = 8).collect()
      .map(r => r.media_id -> r).toMap
    val Some((rw, rh, rfeat)) = Multimodal.decodeImage(resized(1L).payload)
    assert(rw == 8 && rh == 8)
    assert(rfeat(15) > 0.3f && rfeat.take(4).sum > 0.3f)
    // undecodable payload rides the stub fallback: fixed-length bytes
    assert(resized(2L).payload.length == 8 * 8)
  }

  test("decode stub is deterministic") {
    val a = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    val b = Multimodal.stubDecode("hello world".getBytes("UTF-8"))
    assert(a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3))
  }

  test("corpus embedding resolves the encoder per partition and embeds every doc") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = Multimodal.embedDocuments(docs, classOf[FakeQueryEncoder].getName)
    val rows = out.collect()
    assert(rows.length == docs.count())
    // the fake encoder is deterministic: every row carries its vector
    val expected = SparkEntry.demoQueryVec.toSeq
    assert(rows.forall(_.getSeq[Float](1) == expected))
  }

  /** Deterministic 64×64 test image: an id-seeded 8×8 BLOCK pattern
    * (each block one flat luminance), PNG-encoded through the REAL
    * JDK codec — so the dHash/quality specs exercise genuine decode →
    * downsample → hash paths, not the stub. Blocks (not gradients):
    * a monotone gradient makes every right-neighbor brighter and
    * hashes to all-ones for EVERY seed; block structure survives the
    * 9×8 bilinear downsample and varies per id.
    */
  private def png(id: Long, tweak: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        // the id must MULTIPLY position, not offset it: dHash is a
        // difference hash, so a constant per-seed luminance shift
        // cancels and every seed would collide
        val v = ((((x / 8) + 9 * (y / 8) + 1) * (2 * id + 1)) % 16).toInt * 16
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    if (tweak != 0) img.setRGB(32, 32, 0xffffff) // one-pixel edit
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def solidPng(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash is deterministic, edit-robust, and separates distinct images") {
    val a = Multimodal.dhash64(png(1)).get
    assert(Multimodal.dhash64(png(1)).get == a, "same bytes, same hash")
    // a one-pixel edit survives the 9x8 downsample nearly unchanged
    val edited = Multimodal.dhash64(png(1, tweak = 1)).get
    assert(java.lang.Long.bitCount(a ^ edited) <= 3,
      s"one-pixel edit moved ${java.lang.Long.bitCount(a ^ edited)} bits")
    // a different gradient seed lands far away in hamming space
    val other = Multimodal.dhash64(png(2)).get
    assert(a != other)
    // non-decodable bytes are None, never a garbage hash
    assert(Multimodal.dhash64("not an image".getBytes).isEmpty)
  }

  test("perceptual near-dup pairs the edited twin, not the stranger, " +
    "and the occupancy cap drops the solid-color bucket flood") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(0L, "image", png(1)),
      Multimodal.Media(1L, "image", png(1, tweak = 1)), // near-dup of 0
      Multimodal.Media(2L, "image", png(2)),        // unrelated
      Multimodal.Media(3L, "audio", "PCM???".getBytes)  // not decodable
    ).toDS()
    val pairs = Multimodal.imageNearDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)), s"expected the edited twin pair, got ${pairs.keySet}")
    assert(pairs((0L, 1L)) <= 3)
    assert(!pairs.keySet.exists { case (x, y) => x == 2L || y == 2L },
      "the unrelated image must not pair")
    // 40 solid-white images all hash to one fingerprint: bucketCap
    // drops the flooded buckets instead of emitting 40*39/2 pairs
    val flood = (10L until 50L).map(i => Multimodal.Media(i, "image", solidPng(0xffffff)))
    val flooded = (flood :+ Multimodal.Media(0L, "image", png(1))).toDS()
    assert(Multimodal.imageNearDup(flooded, bucketCap = 10L).count() == 0L)
  }

  test("image quality gate fails solids on entropy and sizes on resolution") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(0L, "image", png(1)),            // good
      Multimodal.Media(1L, "image", solidPng(0x808080)),// zero-entropy solid
      Multimodal.Media(2L, "audio", "noise".getBytes)   // not decodable → absent
    ).toDS()
    val rows = Multimodal.imageQualityGate(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L), "non-decodable rows drop out")
    assert(rows(0L).getAs[Boolean]("pass"), "the gradient image passes")
    assert(rows(1L).getAs[Boolean]("pass_res") && !rows(1L).getAs[Boolean]("pass_entropy"),
      "the solid image fails on entropy, not resolution")
    assert(rows(1L).getAs[Double]("lum_entropy") == 0.0)
    // driver recount of the entropy on the good image
    val (w, h, hist) = Multimodal.decodeImage(png(1)).get
    val ent = -hist.foldLeft(0.0)((s, p) => if (p > 0f) s + p * math.log(p.toDouble) else s)
    val r5 = BigDecimal(ent).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0L).getAs[Double]("lum_entropy") == r5)
    assert(rows(0L).getInt(1) == w && rows(0L).getInt(2) == h)
  }

  test("image-text pair prep admits only gate-passing images with bounded captions") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(0L, "image", png(1)),             // good image
      Multimodal.Media(1L, "image", solidPng(0x102030)), // fails gate
      Multimodal.Media(2L, "image", png(3))              // good image
    ).toDS()
    val docs = Seq(
      (0L, "a clean caption with several words"),
      (1L, "caption for the rejected image"),
      (2L, "hi")                                          // under minTokens
    ).toDF("doc_id", "text")
    val out = Multimodal.imageTextPairs(media, docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L),
      "only the good image with an admissible caption survives")
    assert(out.head.getAs[String]("caption").startsWith("a clean caption"))
    assert(out.head.getAs[Long]("n_tokens") == 6L)
  }

  /** Little-endian 16-bit PCM bytes for a known sample sequence. */
  private def pcm(samples: Seq[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    out
  }

  test("PCM frame energy recounts a known waveform exactly") {
    import spark.implicits._
    // 512 silent samples, 512 of a +/-8192 square wave, 256 silent:
    // frames of 256 -> frames 0,1 silent; 2,3 rms = 8192/32768 = 0.25;
    // 4 silent (trailing partial would need 1280+ samples; here exact)
    val wave = Seq.fill(512)(0.toShort) ++
      Seq.tabulate(512)(i => if (i % 2 == 0) 8192.toShort else (-8192).toShort) ++
      Seq.fill(256)(0.toShort)
    val media = Seq(Multimodal.Media(5L, "audio", pcm(wave))).toDS()
    val frames = Multimodal.pcmFrameEnergy(media, frameSamples = 256).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 5)
    assert(frames.map(_.n_samples).forall(_ == 256))
    assert(frames(0).silent && frames(1).silent && frames(4).silent)
    assert(!frames(2).silent && !frames(3).silent)
    assert(frames(2).rms == 0.25 && frames(3).rms == 0.25)
    // trailing PARTIAL frame: 300 samples -> frames of 256 + 44
    val partial = Seq(Multimodal.Media(6L, "audio",
      pcm(Seq.fill(300)(8192.toShort)))).toDS()
    val pf = Multimodal.pcmFrameEnergy(partial, frameSamples = 256).collect()
      .sortBy(_.frame_idx)
    assert(pf.map(_.n_samples).toSeq == Seq(256, 44))
    assert(pf.forall(f => f.rms == 0.25 && !f.silent))
  }

  test("audio activity summary reports trim offsets and drops-signal for all-silent clips") {
    import spark.implicits._
    val wave = Seq.fill(512)(0.toShort) ++
      Seq.tabulate(512)(i => if (i % 2 == 0) 8192.toShort else (-8192).toShort) ++
      Seq.fill(256)(0.toShort)
    val media = Seq(
      Multimodal.Media(5L, "audio", pcm(wave)),
      Multimodal.Media(7L, "audio", pcm(Seq.fill(600)(0.toShort))), // all silent
      Multimodal.Media(8L, "audio", Array.emptyByteArray)           // empty
    ).toDS()
    val rows = Multimodal.audioActivitySummary(media, frameSamples = 256).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r5 = rows(5L)
    assert(r5.getLong(1) == 5L && r5.getLong(2) == 2L)
    assert(r5.getDouble(3) == 0.4)
    assert(r5.getLong(4) == 2L && r5.getLong(5) == 1L, "trim = 2 leading, 1 trailing")
    val r7 = rows(7L)
    assert(r7.getLong(2) == 0L && r7.getDouble(3) == 0.0)
    assert(r7.getLong(4) == r7.getLong(1), "all-silent: trim_lead = n_frames")
    assert(r7.getLong(5) == 0L, "all-silent counts the run once, not twice")
    assert(rows(8L).getLong(1) == 0L && rows(8L).getDouble(3) == 0.0)
  }

  test("synthetic PCM: writer round-trips the generative formula and the report reconciles with the VAD summary") {
    import spark.implicits._
    // byte-level round trip: the reader's short decode must recover
    // the formula's exact sample values (a byte-order/sign bug here is
    // precisely what the hard oracle exists to catch)
    for (id <- Seq(0L, 7L, 11L, 253L)) {
      val bytes = Multimodal.syntheticPcm(id)
      val leadS = ((id % 4) * 256).toInt
      val activeS = (300 + id % 213).toInt
      val trailS = ((id % 3) * 256).toInt
      val n = leadS + activeS + trailS
      assert(bytes.length == 2 * n)
      for (i <- Seq(0, leadS, leadS + 1, leadS + activeS - 1, n - 1)) {
        val got = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        val want = if (i < leadS || i >= leadS + activeS) 0
          else ((37 * id + 73 * i) % 20001).toInt - 10000
        assert(got == want, s"id $id sample $i: $got vs $want")
      }
    }
    // the hard-oracled report's summary columns must reconcile with
    // the REAL audioActivitySummary operator on the same fixtures —
    // the report and the spec-only VAD path are one code path
    val ids = Tables.documents(spark, TestSpark.sf).select(col("doc_id"))
      .where(col("doc_id") % 11 === 0).collect().map(_.getLong(0))
    val media = ids.toSeq.map(id =>
      Multimodal.Media(id, "audio", Multimodal.syntheticPcm(id))).toDS()
    val summary = Multimodal.audioActivitySummary(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    val report = Multimodal.audioActivityReport(spark, TestSpark.sf).collect()
    assert(report.nonEmpty && report.map(_.getLong(0)).toSet == ids.toSet)
    report.foreach { r =>
      val (nf, na, lead, trail) = summary(r.getLong(0))
      assert((r.getLong(2), r.getLong(3), r.getLong(7), r.getLong(8)) ==
        ((nf, na, lead, trail)), s"report row ${r.toSeq} vs summary")
      assert(r.getLong(1) * 2 == Multimodal.syntheticPcm(r.getLong(0)).length.toLong)
      assert(r.getLong(3) > 0, "every fixture has an active zone")
    }
  }

  test("synthetic BMP: JDK decode recovers the generative formula pixel-for-pixel, orientation included") {
    for (id <- Seq(0L, 7L, 23L, 101L)) {
      val bytes = Multimodal.syntheticBmp(id)
      val w = (4 + (id % 13)).toInt; val h = (4 + (id % 9)).toInt
      // closed-form file size (the oracle's n_bytes expression)
      assert(bytes.length == 54 + h * ((3 * w + 3) / 4 * 4))
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      // pixel-exact INCLUDING orientation: the luminance-stats oracle
      // is permutation-invariant, so a bottom-up row-order bug would
      // slip past it — this check pins pixel (x, y) itself
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == ((id * 13 + 41 * x + 17 * y) % 256).toInt, s"r at ($x,$y) id=$id")
        assert(((rgb >> 8) & 0xff) == ((id * 11 + 29 * x + 47 * y) % 256).toInt, s"g at ($x,$y) id=$id")
        assert((rgb & 0xff) == ((id * 7 + 53 * x + 31 * y) % 256).toInt, s"b at ($x,$y) id=$id")
      }
    }
  }

  test("media quality report: real-decode statistics match a driver recount") {
    val rows = Multimodal.mediaQualityReport(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = Multimodal.syntheticBmp(id)
      assert(r.getLong(3) == bytes.length.toLong, "n_bytes is the real file size")
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w == (4 + id % 13).toInt && h == (4 + id % 9).toInt)
      assert(r.getLong(4) == w.toLong * h)
      // recount luminance sum straight from the formula (no decode)
      var lumSum = 0L
      for (y <- 0 until h; x <- 0 until w)
        lumSum += (((id * 13 + 41 * x + 17 * y) % 256) * 299 +
          ((id * 11 + 29 * x + 47 * y) % 256) * 587 +
          ((id * 7 + 53 * x + 31 * y) % 256) * 114) / 1000
      assert(r.getLong(5) == lumSum, s"lum_sum recount for id=$id")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 4.0, "entropy in [0, log2 16]")
    }
    // the quality gate must exercise both branches on the fixture set
    assert(rows.exists(_.getBoolean(8)) || rows.length < 10,
      "some image should pass the gate at this sf")
    assert(rows.exists(!_.getBoolean(8)), "some image should fail the gate")
  }
}
