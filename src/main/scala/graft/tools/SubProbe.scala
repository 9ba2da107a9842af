package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SubProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs.count())
    println(docs.agg(sum(length(col("text"))), avg(length(col("text"))), max(length(col("text")))).collect()(0))
    val k=8; val w=4
    val win = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, w-1)
    val t0=System.nanoTime()
    val fps = docs.select(col("doc_id"), posexplode(when(length(col("text")) >= k,
        expr(s"transform(sequence(0, length(text) - $k), i -> substring(text, i + 1, $k))"))
        .otherwise(array().cast("array<string>")))).toDF("doc_id","pos","g")
      .select(col("doc_id"), col("pos"), substring(md5(col("g")),1,8).as("hh"))
      .withColumn("sel", min(col("hh")).over(win))
      .select(col("doc_id"), col("sel")).distinct().cache()
    println("fps=" + fps.count() + " in " + (System.nanoTime()-t0)/1e9)
    val df = fps.groupBy("sel").agg(count(lit(1)).as("df"))
    println(df.agg(max(col("df")), sum(when(col("df") > 1000, col("df")))).collect()(0))
    val capped = fps.join(broadcast(df.where(col("df")>1000).select("sel")), Seq("sel"), "left_anti").cache()
    println("capped=" + capped.count())
    val t1=System.nanoTime()
    val pairs = capped.as("a").join(capped.as("b"), col("a.sel")===col("b.sel") && col("a.doc_id")<col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
    println("pairrows=" + pairs.count() + " in " + (System.nanoTime()-t1)/1e9)
    // df distribution
    df.groupBy().agg(sum(col("df")*col("df"))).show()
    spark.stop()
  }
}
