package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

case class TestEvent(event_id: Long, ts: Timestamp, user_id: Long,
                     event_type: String, value: Double)

case class QueryVec(q_id: Long, qv: Array[Float])

case class NewVec(vec_id: Long, embedding: Array[Float])

case class DocRow(doc_id: Long, text: String)

case class PropsEvent(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, props: String)

case class InterRow(user_id: Long, item_id: Long)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("streaming windowed counts match the batch plan on the same data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = Seq(
      TestEvent(1, t(5), 1, "view", 1.0), TestEvent(2, t(10), 1, "view", 2.0),
      TestEvent(3, t(65), 2, "click", 3.0), TestEvent(4, t(70), 2, "view", 4.0),
      TestEvent(5, t(200), 1, "view", 5.0))
    val stream = MemoryStream[TestEvent]
    val q = EventStreams.windowedCounts(stream.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("wc")
        .select("w_start", "event_type", "n", "total_value").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = EventStreams.windowedCounts(events.toDF(), "1 hour", "2 hours")
        .select("w_start", "event_type", "n", "total_value").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
      assert(got.contains((0L, "view", 2L, 3.0)))
    } finally q.stop()
  }

  test("sliding trending counts vote each event into every containing window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    case object Ignore
    val events = Seq(
      PropsEvent(1, t(45), 1, "view", """{"k":7}"""),
      PropsEvent(2, t(50), 2, "view", """{"k":7}"""),
      PropsEvent(3, t(95), 3, "view", """{"k":9}"""),
      PropsEvent(4, t(100), 4, "view", null),
      PropsEvent(5, t(400), 1, "view", """{"k":7}"""))
    val stream = MemoryStream[PropsEvent]
    val q = graft.streaming.EventStreams
      .trendingCounts(stream.toDF(), "1 hour", "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("trend").outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("trend").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2), r.getLong(3))).toSet
      // the minute-45/50 pair belongs to BOTH the window starting at 0
      // and the one starting at 30 — sliding membership
      assert(got.contains((0L, 7L, 2L)))
      assert(got.contains((30L, 7L, 2L)))
      // null-props rows are dropped, not hashed to an item
      assert(!got.exists(_._2 == 0L))
      // identical transform over the bounded frame — backfill parity
      val batch = graft.streaming.EventStreams
        .trendingCounts(events.toDF(), "1 hour", "30 minutes", "2 hours")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("anomaly flags z-score windows against the static baseline") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val baseline = Seq(("view", 2.0, 1.0)).toDF("event_type", "mean", "std")
    val events = Seq(
      TestEvent(1, t(5), 1, "view", 1.0), TestEvent(2, t(10), 2, "view", 1.0),
      // hour 1: a 6-event burst — z = (6-2)/1 = 4 >= 3
      TestEvent(3, t(61), 1, "view", 1.0), TestEvent(4, t(62), 2, "view", 1.0),
      TestEvent(5, t(63), 3, "view", 1.0), TestEvent(6, t(64), 4, "view", 1.0),
      TestEvent(7, t(65), 5, "view", 1.0), TestEvent(8, t(66), 6, "view", 1.0),
      // an event type with no baseline row
      TestEvent(9, t(70), 1, "signup", 1.0))
    val stream = MemoryStream[TestEvent]
    val q = graft.streaming.EventStreams
      .anomalyFlags(stream.toDF(), baseline, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("anom").outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("anom").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2), if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toSet
      assert(got.contains((0L, "view", 2L, Some(false))), "baseline-normal hour")
      assert(got.contains((60L, "view", 6L, Some(true))), "burst flagged")
      // unknown type surfaces with a NULL flag, is not dropped
      assert(got.contains((60L, "signup", 1L, None)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[TestEvent]
    val q = EventStreams.dedupedStream(stream.toDF(), "2 hours")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      stream.addData(
        TestEvent(1, t(5), 1, "view", 1.0), TestEvent(2, t(6), 1, "view", 2.0),
        TestEvent(1, t(5), 1, "view", 1.0)) // replayed duplicate
      q.processAllAvailable()
      stream.addData(TestEvent(2, t(7), 1, "view", 2.0)) // replay in a later batch
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("streaming session windows close on gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[TestEvent]
    val q = EventStreams.sessionWindows(stream.toDF(), "30 minutes", "1 minute")
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    try {
      stream.addData(
        TestEvent(1, t(0), 1, "view", 1.0), TestEvent(2, t(10), 1, "click", 2.0),
        TestEvent(3, t(100), 1, "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to finalize all sessions
      stream.addData(TestEvent(99, t(100000), 9, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sw")
        .where(col("user_id") === 1)
        .select("n_events", "sess_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((2L, 3.0), (1L, 3.0)))
    } finally q.stop()
  }

  test("stream-stream interval join bounds the lookback and matches batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[TestEvent]
    val purchases = MemoryStream[TestEvent]
    val q = EventStreams.viewPurchaseAttribution(
        views.toDF(), purchases.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("vp").outputMode("append").start()
    try {
      val vData = Seq(
        TestEvent(1, t(5), 1, "view", 0.0), TestEvent(2, t(50), 1, "view", 0.0),
        TestEvent(3, t(10), 2, "view", 0.0), TestEvent(4, t(30), 3, "view", 0.0))
      val pData = Seq(
        TestEvent(10, t(60), 1, "purchase", 9.0),   // views 5 & 50 in window
        TestEvent(11, t(100), 2, "purchase", 5.0),  // view 10 older than 1h lag
        TestEvent(12, t(30), 3, "purchase", 1.0))   // simultaneous view: strict <
      views.addData(vData: _*)
      purchases.addData(pData: _*)
      q.processAllAvailable()
      val got = spark.table("vp").select("purchase_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((10L, 1L), (10L, 2L)))
      // the SAME plan runs bounded for backfill
      val batch = EventStreams.viewPurchaseAttribution(
          vData.toDF(), pData.toDF(), "1 hour", "2 hours")
        .select("purchase_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming LSH kNN matches the same pipeline run as a batch") {
    import spark.implicits._
    import graft.streaming.VectorServing
    implicit val ctx = spark.sqlContext
    val index = graft.operators.Lsh.ensureIndex(spark, TestSpark.sf, nBits = 8)
    val qvecs = Tables.embeddings(spark, TestSpark.sf)
      .where(col("vec_id").isin(0L, 7L, 42L))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => QueryVec(r.getLong(0), r.getSeq[Float](1).toArray))
    val stream = MemoryStream[QueryVec]
    // k=6: the stream includes the query's own corpus row, lshTopK
    // excludes it — one extra slot keeps the candidate sets comparable
    val q = VectorServing.streamingLshTopK(stream.toDF(), index, nBits = 8, k = 6)
      .writeStream.format("memory").queryName("vserve").outputMode("complete").start()
    try {
      stream.addData(qvecs.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("vserve").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val batch = VectorServing.streamingLshTopK(qvecs.toSeq.toDF(), index, nBits = 8, k = 6)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got == batch)
      // each query's own vector is in the corpus → top-1 is itself at 1.0
      assert(Set(0L, 7L, 42L).forall(id => got.contains((id, id, 1.0, 1L))))
      // multi-probe parity with the BATCH search: after dropping the
      // self-hit, the stream's ranking equals Lsh.lshTopK (which probes
      // the same hamming≤1 bucket set and excludes the query row)
      for (qid <- Seq(0L, 7L, 42L)) {
        val streamed = got.toSeq.filter(r => r._1 == qid && r._2 != qid)
          .sortBy(r => (-r._3, r._2)).map(r => (r._2, r._3))
        val batchTopK = graft.operators.Lsh.lshTopK(spark, TestSpark.sf, qid, nBits = 8, k = 5)
          .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
        assert(streamed == batchTopK, s"q=$qid streamed=$streamed batch=$batchTopK")
      }
    } finally q.stop()
  }

  test("streaming ingest commits each micro-batch as one idempotent index epoch") {
    import spark.implicits._
    import graft.sources.IndexStore
    import graft.streaming.IndexIngest
    implicit val ctx = spark.sqlContext
    // isolated index root: the ingested epochs must not leak into the
    // shared fingerprint-addressed artifacts other suites probe
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-root").toString
    spark.conf.set("spark.graft.index.root", root)
    try {
      val nBits = 4
      graft.operators.Lsh.ensureIndex(spark, TestSpark.sf, nBits).count()
      val path = graft.operators.Lsh.indexPath(spark, TestSpark.sf, nBits)
      val before = spark.read.parquet(path).count()
      def vec(seed: Int): Array[Float] = Array.tabulate(64)(i => ((i + seed) % 5 - 2) * 0.25f)
      // batch 1 ingests a CLONE of corpus vector 0: same hyperplanes →
      // same bucket, so the serving path must surface it at cosine 1.0
      val clone0 = Tables.embeddings(spark, TestSpark.sf).where(col("vec_id") === 0L)
        .select("embedding").head.getSeq[Float](0).toArray
      val stream = MemoryStream[NewVec]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
      val q = IndexIngest.intoLshIndex(spark, stream.toDF(), path, nBits, ckpt)
      try {
        stream.addData(NewVec(10001L, vec(1)), NewVec(10002L, vec(2)))
        q.processAllAvailable()
        stream.addData(NewVec(10003L, clone0))
        q.processAllAvailable()
      } finally q.stop()
      IndexStore.invalidate(spark, path)
      val after = spark.read.parquet(path)
      assert(after.where(col("vec_id") >= 10000L).count() == 3)
      assert(after.count() == before + 3)
      // epoch per micro-batch, named by batch id (the idempotence key)
      val epochs = new java.io.File(path).listFiles.map(_.getName)
        .filter(_.startsWith("epoch=ingest-b")).toSet
      assert(epochs == Set("epoch=ingest-b0", "epoch=ingest-b1"), epochs.mkString(","))
      // a replayed (already-committed) batch is a no-op — exactly-once
      IndexIngest.appendLshBatch(spark, path, nBits)(
        Seq(NewVec(10001L, vec(1)), NewVec(10002L, vec(2))).toDF(), 0L)
      IndexStore.invalidate(spark, path)
      assert(spark.read.parquet(path).count() == before + 3, "replay must not duplicate")
      // the serving path sees the ingested vectors within one batch:
      // the clone of vector 0 hashes to 0's own bucket and must come
      // back as the top hit at cosine 1.0 — no rebuild, no restart
      val top = graft.operators.Lsh.lshTopK(spark, TestSpark.sf, 0L, nBits, k = 5).head
      assert(top.getLong(0) == 10003L && top.getDouble(2) == 1.0, top.toString)
      // the high-water mark outlives the epoch dirs: even after
      // maintenance folds an ingest epoch away (simulated delete), a
      // replay of that batch stays a no-op — the compaction-proof half
      // of the exactly-once contract
      assert(IndexIngest.readHwm(spark, path) == 1L)
      val fsys = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.delete(new org.apache.hadoop.fs.Path(path, "epoch=ingest-b1"), true)
      IndexIngest.appendLshBatch(spark, path, nBits)(
        Seq(NewVec(10003L, clone0)).toDF(), 1L)
      IndexStore.invalidate(spark, path)
      assert(spark.read.parquet(path).count() == before + 2,
        "hwm must keep the replay a no-op after its epoch dir is gone")
    } finally {
      spark.conf.unset("spark.graft.index.root")
      IndexStore.invalidate(spark, graft.operators.Lsh.indexPath(spark, TestSpark.sf, 4))
    }
  }

  test("streaming ALS fold-in publishes idempotent drift epochs equal to the batch core") {
    import spark.implicits._
    import graft.streaming.AlsStreams
    implicit val ctx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-als-epochs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-als-ckpt").toString
    // two real (user, item) interaction pairs from the corpus, plus a
    // brand-new user rating ONLY a brand-new item — the all-new-items
    // edge the drift table must keep with NULL new factors
    val pairs = Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .where(col("item_id").isNotNull).distinct().orderBy("user_id", "item_id")
      .limit(2).collect().map(r => (r.getLong(0), r.getLong(1)))
    val Array((u1, i1), (u2, i2)) = pairs
    val b0 = Seq(InterRow(u1, i1), InterRow(999999L, 888888L))
    val b1 = Seq(InterRow(u1, i1), InterRow(u2, i2))
    val stream = MemoryStream[InterRow]
    val q = AlsStreams.start(spark, TestSpark.sf, stream.toDF(), path, ckpt)
    try {
      stream.addData(b0: _*); q.processAllAvailable()
      stream.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "old_f1", "old_f2", "new_f1", "new_f2", "l1_delta")
      .collect().map(r => (0 until 6).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .sortBy(_.head)
    // stream ≡ batch core, epoch by epoch
    val e0 = rows(spark.read.parquet(s"$path/epoch=ingest-b0"))
    val exp0 = rows(graft.operators.Rec.alsFoldInDelta(spark, TestSpark.sf,
      b0.toDF()))
    assert(e0.toSeq == exp0.toSeq, "epoch b0 diverges from the batch core")
    val e1 = rows(spark.read.parquet(s"$path/epoch=ingest-b1"))
    val exp1 = rows(graft.operators.Rec.alsFoldInDelta(spark, TestSpark.sf,
      b1.toDF()))
    assert(e1.toSeq == exp1.toSeq, "epoch b1 diverges from the batch core")
    // the all-new-items user is PRESENT with NULL factors end-to-end
    val nu = e0.find(_.head.contains(999999L)).get
    assert(nu(3).isEmpty && nu(4).isEmpty && nu(5).isEmpty,
      s"all-new-items user must carry NULL new factors: $nu")
    // serving view: u1 was folded in by both batches — the later wins
    val latest = AlsStreams.latestUserFactors(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(latest(u1) == 1L && latest(u2) == 1L && latest(999999L) == 0L)
    // replayed batch is a no-op (epoch dir + hwm idempotence)
    val dirsBefore = new java.io.File(path).listFiles.map(_.getName)
      .filter(_.startsWith("epoch=")).toSet
    AlsStreams.foldInBatch(spark, TestSpark.sf, path)(b0.toDF(), 0L)
    val dirsAfter = new java.io.File(path).listFiles.map(_.getName)
      .filter(_.startsWith("epoch=")).toSet
    assert(dirsBefore == dirsAfter && dirsBefore == Set("epoch=ingest-b0", "epoch=ingest-b1"))
  }

  test("ingest hwm survives torn files and compaction (crash-recovery ledger)") {
    import spark.implicits._
    import graft.sources.IndexStore
    import graft.streaming.IndexIngest
    val root = java.nio.file.Files.createTempDirectory("graft-hwm-root").toString
    spark.conf.set("spark.graft.index.root", root)
    try {
      val nBits = 4
      graft.operators.Lsh.ensureIndex(spark, TestSpark.sf, nBits).count()
      val path = graft.operators.Lsh.indexPath(spark, TestSpark.sf, nBits)
      val before = spark.read.parquet(path).count()
      def vec(seed: Int): Array[Float] = Array.tabulate(64)(i => ((i + seed) % 7 - 3) * 0.2f)
      IndexIngest.appendLshBatch(spark, path, nBits)(Seq(NewVec(20001L, vec(1))).toDF(), 0L)
      IndexIngest.appendLshBatch(spark, path, nBits)(Seq(NewVec(20002L, vec(2))).toDF(), 1L)
      val fsys = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hwm = new org.apache.hadoop.fs.Path(path, "_ingest_hwm")
      // a torn/garbage hwm (crash mid-write) must not wedge the
      // stream: readHwm repairs from the committed epoch dirs
      val out = fsys.create(hwm, true); out.write("not-a-number".getBytes); out.close()
      assert(IndexIngest.readHwm(spark, path) == 1L)
      val empty = fsys.create(hwm, true); empty.close()
      assert(IndexIngest.readHwm(spark, path) == 1L)
      // crash window: batches committed but the hwm write lost
      // entirely. compaction must fold the max ingest epoch INTO the
      // hwm file before deleting the epoch dirs, or a post-compaction
      // replay would pass both guards and append duplicates
      fsys.delete(hwm, false)
      assert(IndexIngest.readHwm(spark, path) == 1L)
      IndexStore.addTombstones(spark, path, Seq(20001L))
      graft.operators.Lsh.compactIndex(spark, TestSpark.sf, nBits)
      assert(!fsys.exists(new org.apache.hadoop.fs.Path(path, "epoch=ingest-b1")),
        "compaction folds ingest epochs away")
      assert(IndexIngest.readHwm(spark, path) == 1L,
        "compact must persist the folded ingest hwm")
      IndexIngest.appendLshBatch(spark, path, nBits)(Seq(NewVec(20002L, vec(2))).toDF(), 1L)
      IndexStore.invalidate(spark, path)
      assert(spark.read.parquet(path).where(col("vec_id") === 20002L).count() == 1L,
        "post-compaction replay must stay a no-op")
      assert(spark.read.parquet(path).count() == before + 1) // 20001 tombstoned away
    } finally {
      spark.conf.unset("spark.graft.index.root")
      IndexStore.invalidate(spark, graft.operators.Lsh.indexPath(spark, TestSpark.sf, 4))
    }
  }

  test("streaming curation gates and redacts exactly like the batch plan") {
    import spark.implicits._
    import graft.streaming.CurationStreams
    implicit val ctx = spark.sqlContext
    val good = "the big table " + Seq.tabulate(40)(i => s"tok$i").mkString(" ")
    val docs = Seq(
      DocRow(1L, good + " mail me at a.b@example.com now"),
      DocRow(2L, "a a a a a a a a"), // stopword sludge → gated out
      DocRow(3L, good))
    val stream = MemoryStream[DocRow]
    val q = CurationStreams.curate(stream.toDF())
      .writeStream.format("memory").queryName("cur").outputMode("append").start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("cur").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1).toSeq
      val batch = CurationStreams.curate(docs.toDF()).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1).toSeq
      assert(got == batch, "stream and batch must admit identical rows")
      assert(got.map(_._1) == Seq(1L, 3L), "the low-quality doc must be gated out")
      val redacted = got.find(_._1 == 1L).get
      assert(redacted._2.contains("<EMAIL>") && redacted._3 == 1L)
      assert(got.find(_._1 == 3L).get._3 == 0L)
    } finally q.stop()
  }

  test("streaming near-dup gate admits and flags exactly like the batch core") {
    import spark.implicits._
    import graft.streaming.DedupStreams
    implicit val ctx = spark.sqlContext
    // one incoming doc duplicates a corpus doc verbatim, one is novel
    val dupOf = Tables.documents(spark, TestSpark.sf)
      .orderBy(col("doc_id")).select("doc_id", "text").head()
    val docs = Seq(
      DocRow(900001L, dupOf.getString(1)),
      DocRow(900002L, Seq.tabulate(30)(i => s"novel$i").mkString(" ")))
    val stream = MemoryStream[DocRow]
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = DedupStreams.start(spark, TestSpark.sf, stream.toDF()) { (out, _) =>
      flagged ++= out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val batch = graft.operators.Dedup
      .gateAgainstCorpus(spark, TestSpark.sf, docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(flagged.sortBy(_._1).toSeq == batch.sortBy(_._1), "stream ≡ batch")
    // the verbatim copy is flagged at jaccard 1.0; the novel doc passes
    val hit = flagged.find(_._1 == 900001L)
    assert(hit.isDefined && hit.get._3 == 1.0)
    assert(!flagged.exists(_._1 == 900002L))
    // witness really is an identical-shingle doc (the copied source or
    // a member of its duplicate cluster)
    val witnessText = Tables.documents(spark, TestSpark.sf)
      .where(col("doc_id") === hit.get._2).head().getAs[String]("text")
    assert(witnessText.split(" ", -1).sliding(5).map(_.mkString(" ")).toSet ==
      dupOf.getString(1).split(" ", -1).sliding(5).map(_.mkString(" ")).toSet)
  }

  test("streaming percolation fires exactly like the batch core on each micro-batch") {
    import spark.implicits._
    import graft.streaming.PercolateStreams
    implicit val ctx = spark.sqlContext
    // craft one doc that fires a known subscription (two of its terms)
    // and one that cannot (no subscription vocabulary at all)
    val subs = graft.operators.TextAnalysis.sourceLogOdds(spark, TestSpark.sf, topN = 3,
        docFilter = graft.operators.TextAnalysis.trainSplit)
      .collect().map(r => (r.getString(0), r.getString(2)))
    val (src, terms) = subs.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._1).head
    val docs = Seq(
      DocRow(910001L, s"alert me about ${terms(0)} and also ${terms(1)} today"),
      DocRow(910002L, "zz9xq qq8zx totally unrelated nonwords"))
    val stream = MemoryStream[DocRow]
    val fired = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = PercolateStreams.start(spark, TestSpark.sf, stream.toDF()) { (out, _) =>
      fired ++= out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    }
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    // stream ≡ batch core on the same frame
    val batch = graft.operators.TextAnalysis
      .percolateDocs(spark, TestSpark.sf, docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(fired.sortBy(r => (r._1, r._2)).toSeq == batch.sortBy(r => (r._1, r._2)),
      "stream ≡ batch")
    // the crafted doc fires its subscription with exactly the two
    // planted terms; the nonword doc fires nothing
    val hit = fired.find(f => f._1 == 910001L && f._2 == src)
    assert(hit.isDefined && hit.get._3 == 2L, s"expected a 2-term firing for $src")
    assert(!fired.exists(_._1 == 910002L))
  }

  test("stateful flatMapGroupsWithState sessionizer closes on gap and timeout") {
    import spark.implicits._
    import graft.streaming.{SessionOut, UserEvent}
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = EventStreams.statefulSessions(stream.toDS(), gapMs = 1800000L, watermark = "1 minute")
      .writeStream.format("memory").queryName("ss").outputMode("append").start()
    try {
      // user 1: two sessions (gap at t=101min); second closes via timeout.
      // events start at t=1min — a row at epoch 0 ties the initial
      // watermark and is dropped as late.
      stream.addData(
        UserEvent(1, t(1), 1.0), UserEvent(1, t(11), 2.0), UserEvent(1, t(101), 3.0))
      q.processAllAvailable()
      stream.addData(UserEvent(9, t(100000), 0.0)) // advance watermark
      q.processAllAvailable()
      stream.addData(UserEvent(9, t(200000), 0.0)) // trigger timeout pass
      q.processAllAvailable()
      val got = spark.table("ss").where(col("user_id") === 1)
        .select("n_events", "sess_value", "start_ms", "end_ms").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2) / 60000, r.getLong(3) / 60000)).toSet
      assert(got == Set((2L, 3.0, 1L, 11L), (1L, 3.0, 101L, 101L)))
    } finally q.stop()
  }
}
