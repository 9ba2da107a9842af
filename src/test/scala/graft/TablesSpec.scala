package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression coverage for Tables.events `ts` handling. The driver has
  * regenerated events.parquet with three different parquet timestamp
  * physical types across rounds; ts_ms must be identical epoch millis
  * under every representation (round 8 broke on TIMESTAMP_NTZ).
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def writeAndLoad(castTo: String): Map[Long, Long] = {
    val dir = Files.createTempDirectory("graft-ts").toFile
    dir.deleteOnExit()
    val base = Seq(
      (1L, 0L),                   // epoch
      (2L, 1700000000123L),       // ms precision preserved
      (3L, 4102444800000L)        // 2100-01-01, beyond int seconds
    ).toDF("event_id", "ms")
    val df = castTo match {
      case "ntz"   => base.withColumn("ts", timestamp_millis($"ms").cast("timestamp_ntz"))
      case "tz"    => base.withColumn("ts", timestamp_millis($"ms"))
      case "nanos" => base.withColumn("ts", ($"ms" * 1000000L).cast("long"))
    }
    df.select($"event_id", $"ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir.toString)
      .select($"event_id", $"ts_ms").as[(Long, Long)].collect().toMap
  }

  private val expected = Map(1L -> 0L, 2L -> 1700000000123L, 3L -> 4102444800000L)

  test("events ts_ms is stable for TIMESTAMP_NTZ parquet (round-8 regression)") {
    assert(writeAndLoad("ntz") === expected)
  }

  test("events ts_ms is stable for UTC-adjusted TIMESTAMP parquet") {
    assert(writeAndLoad("tz") === expected)
  }

  test("events ts_ms is stable for legacy epoch-nanos LongType") {
    assert(writeAndLoad("nanos") === expected)
  }

  test("real testdata events table loads with non-null ts_ms") {
    val ev = Tables.events(spark, TestSpark.sf)
    val n = ev.count()
    assert(n > 0)
    assert(ev.filter($"ts_ms".isNull).count() === 0L)
    // sanity: timestamps are in a plausible epoch-millis range (year 2000..2100)
    val (mn, mx) = ev.agg(min($"ts_ms"), max($"ts_ms")).as[(Long, Long)].head()
    assert(mn > 946684800000L && mx < 4102444800000L)
  }
}
