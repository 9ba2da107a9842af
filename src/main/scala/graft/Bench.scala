package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up pass: JIT-compile the generated code paths and
    // fault in the OS page cache so the timed pass measures the
    // engine, not first-run JVM noise
    SparkEntry.queries.foreach { case (_, fn) =>
      spark.catalog.clearCache()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // a throwing query must surface as an error, never as a (fast,
    // bogus) timing — a regression would otherwise look like a speedup
    val results = SparkEntry.queries.map { case (name, fn) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case t: Throwable => Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(120)}")
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // bench hygiene: this host is a shared VM whose identical-run totals
    // vary several-fold (documented in BASELINE.md), so any single raw
    // timing can be noise. Re-time every over-budget query with two
    // extra warm reps and report the per-query MINIMUM under "retimed"
    // — a reader can then separate host noise (retimed under budget)
    // from a real regression (retimed still over) without a second run.
    val budgets: Map[String, Double] = {
      val f = new java.io.File("BASELINE.md")
      if (!f.exists) Map.empty
      else {
        val re = """\|\s*`([a-z0-9_]+)`\s*\|\s*[0-9.]+\s*\|\s*([0-9.]+)\s*\|""".r
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().collect { case re(name, budget) => name -> budget.toDouble }.toMap
        finally src.close()
      }
    }
    val retimed = results.collect {
      case (name, t, None) if budgets.get(name).exists(t > _) =>
        // a transient flake (FS hiccup, OOM) in a retime rep must not
        // abort main() after the full timed pass — fall back to the
        // raw timing for that rep
        val extra = (1 to 2).flatMap { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try { SparkEntry.queries(name)(spark, sfDir).count()
                Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None }
        }
        name -> (t +: extra).min
    }
    val rt = retimed.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // strip control chars too (Spark messages embed newlines/tabs) —
    // one bad error string must not corrupt the JSON line. Group queries
    // by (truncated) message: a single root cause breaking N queries
    // must cost one dict entry, not N — in round 8, 24 per-query error
    // strings pushed the JSON line past the driver's stdout-tail capture
    // and the whole bench parsed as null. Full messages go to stderr.
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    results.foreach { case (k, _, Some(e)) => System.err.println(s"BENCH ERROR $k: $e"); case _ => () }
    val errs = results.collect { case (k, _, Some(e)) => (e.take(100), k) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (msg, ks) =>
        jstr(msg) + ":" + ks.map(p => jstr(p._2)).mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"retimed":$rt,"errors":$errs,"sf":"$sfDir"}"""
    // the full per-query map also lands on disk: the driver's
    // stdout-tail capture truncates long lines (round 9 parsed as
    // null at 214 queries), but a file is read whole
    val outFile = new java.io.File("target/bench.json")
    outFile.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.println(json) finally w.close()
    System.err.println(s"BENCH JSON written to ${outFile.getAbsolutePath}")
    println(json)
    spark.stop()
  }
}
