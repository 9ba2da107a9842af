package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Print a named query's result rows (measurement aid: familyEval's
  * AvgQueryTime_ms column IS the per-family serving-latency table).
  * Usage: ShowQ <sfDir> <query...>
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, sfDir).show(200, truncate = false)
    }
    spark.stop()
  }
}
