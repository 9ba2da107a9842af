package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Measurement harness (guide §1): `runMain graft.tools.JobProfile
  * <sfDir> <reps> <query...>` times each named SparkEntry query like
  * graft.Bench does (warm-up + timed `.count()`), and per timed rep
  * reports the JOB-LEVEL breakdown — number of Spark jobs the query
  * ran, per-job wall ms, task counts — so driver-loop overhead
  * (many tiny jobs) separates from genuine stage compute. Also prints
  * `show()` output when SHOW=1, for eyeballing result shapes.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // job-level accounting listener
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]() // id -> (t0, t1, nTasks)
    val tasksPerJob = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, (j.time, 0L, 0))
        tasksPerJob.put(j.jobId, new java.util.concurrent.atomic.AtomicInteger(0))
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val v = jobs.get(j.jobId)
        if (v != null) jobs.put(j.jobId, (v._1, j.time, tasksPerJob.get(j.jobId).get()))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(t.stageId)
        val c = tasksPerJob.get(jid)
        if (c != null) c.incrementAndGet()
      }
    })

    names.foreach { n =>
      // warm-up (like Bench's untimed first pass)
      spark.catalog.clearCache()
      try SparkEntry.queries(n)(spark, sfDir).count() catch { case t: Throwable => println(s"$n WARMUP ERR: $t") }
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        jobs.clear(); tasksPerJob.clear(); stageToJob.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let job-end events drain
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._1)
        val jobSum = js.map { case (_, (a, b, _)) => math.max(0L, b - a) }.sum / 1e3
        println(f"== $n rep$rep wall=$wall%.2fs jobs=${js.size} jobTimeSum=$jobSum%.2fs gap=${wall - jobSum}%.2fs")
        val big = js.map { case (id, (a, b, nt)) => (id, b - a, nt) }.sortBy(-_._2).take(12)
        big.foreach { case (id, ms, nt) => println(f"   job$id%-5d ${ms}ms tasks=$nt") }
      }
    }
    spark.stop()
  }
}
