package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot evidence probe for the recall-sweep GT seam: runs
  * recallEval and lshBitsEval at a given sfDir under BOTH ground-truth
  * sources and prints the two frames — the sf0.1 delta BASELINE.md
  * records to license the graph-GT swap at scale points where the
  * exact pass is unpayable.
  */
object GtSwapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (src <- Seq("exact", "graph")) {
      spark.conf.set("spark.graft.recall.gt", src)
      val t0 = System.nanoTime()
      val rc = graft.operators.Ivf.recallEval(spark, dir, nCells = 16,
        queryMod = 100, k = 10, nprobes = Seq(1, 2, 4)).collect()
      val t1 = System.nanoTime()
      val lb = graft.operators.Lsh.lshBitsEval(spark, dir).collect()
      val t2 = System.nanoTime()
      println(s"== gt=$src recallEval (${(t1 - t0) / 1e9}%.1f s):")
      rc.foreach(r => println(s"  $r"))
      println(s"== gt=$src lshBitsEval (${(t2 - t1) / 1e9} s):")
      lb.foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
