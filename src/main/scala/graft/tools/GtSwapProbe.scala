package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence probe for the recall-sweep GT seam and the cross-family
  * table: runs recallEval / lshBitsEval / familyEval at a given sfDir
  * under the selected ground-truth sources and prints the frames —
  * the sf0.1 exact-vs-graph delta and the sf50 graph-GT rows
  * BASELINE.md records.
  *
  * Usage: GtSwapProbe <sfDir> [gt=exact,graph] [mod=100]
  *                    [what=sweeps|family|both] [member=true|false]
  * (at the 1 M-vector point run gt=graph only: the exact GT pass is
  * the n²/mod brute force the seam exists to avoid)
  *
  * `member=false` runs the familyEval rows in the NON-member mode
  * (query vectors held out of every build, caller-vector doors) —
  * its GT is the bounded per-query exact flat scan, so it is payable
  * at any corpus size regardless of the gt= seam setting.
  */
object GtSwapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def opt(key: String, dflt: String): String =
      args.drop(1).find(_.startsWith(key + "=")).map(_.drop(key.length + 1)).getOrElse(dflt)
    val sources = opt("gt", "exact,graph").split(",").toSeq
    val mod = opt("mod", "100").toInt
    val what = opt("what", "sweeps")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (src <- sources) {
      spark.conf.set("spark.graft.recall.gt", src)
      if (what == "sweeps" || what == "both") {
        val t0 = System.nanoTime()
        val rc = graft.operators.Ivf.recallEval(spark, dir, nCells = 16,
          queryMod = mod, k = 10, nprobes = Seq(1, 2, 4)).collect()
        val t1 = System.nanoTime()
        val lb = graft.operators.Lsh.lshBitsEval(spark, dir, queryMod = mod).collect()
        val t2 = System.nanoTime()
        println(f"== gt=$src recallEval (${(t1 - t0) / 1e9}%.1f s):")
        rc.foreach(r => println(s"  $r"))
        println(f"== gt=$src lshBitsEval (${(t2 - t1) / 1e9}%.1f s):")
        lb.foreach(r => println(s"  $r"))
      }
      if (what == "family" || what == "both") {
        val member = opt("member", "true").toBoolean
        val t0 = System.nanoTime()
        val fe = graft.operators.Ivf.familyEval(spark, dir, queryMod = mod,
          k = 10, memberQueries = member).collect()
        println(f"== gt=$src familyEval member=$member (${(System.nanoTime() - t0) / 1e9}%.1f s):")
        fe.foreach(r => println(s"  $r"))
      }
    }
    spark.stop()
  }
}
