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
}
