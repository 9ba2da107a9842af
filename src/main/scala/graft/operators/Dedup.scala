package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Deduplication operators for large-scale corpus curation.
  *
  * None of these ever materializes the O(n²) pair space: every
  * near-dup variant generates candidates through an equi-join on a
  * blocking key (shared shingle, LSH band bucket, simhash chunk,
  * cluster label) so the shuffle is keyed by bucket, and only
  * candidate pairs are verified exactly.
  */
object Dedup {

  /** Exact dedup: content hash + keep-first flag per document. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("hash")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("hash"))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("hash"), (col("rn") > 1).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** Distinct n-token shingles per document (word n-grams).
    * Documents shorter than n tokens yield no shingles (matches the
    * oracle's `range(len-n+1)` semantics on empty ranges).
    */
  def shingles(docs: DataFrame, n: Int = 5): DataFrame = {
    val toks = split(col("text"), " ")
    docs.select(col("doc_id"),
      explode(when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  /** Near-dup pairs by exact n-gram Jaccard, blocked on shared
    * shingles: a pair is only scored if the docs share ≥1 shingle, so
    * candidate generation is a shingle-keyed equi-join (shuffle by
    * shingle), never a cross join.
    */
  def ngramJaccard(spark: SparkSession, dir: String, n: Int = 5, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(Tables.documents(spark, dir), n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .withColumn("jaccard", round(col("inter") / (col("a_sz") + col("b_sz") - col("inter")), 5))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash signatures: k independent hash functions realized as the
    * lexicographic min of md5(seed || '|' || shingle) — deterministic
    * and reproducible in any engine with md5.
    * Returns (doc_id, i, mh) with i in [0, k).
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.IntegerType
    sh.crossJoin(broadcast(
        sh.sparkSession.range(k).select(col("id").cast(IntegerType).as("i"))))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit("|"), col("shingle")))).as("mh"))
  }

  /** MinHash + LSH near-dup: signatures → band buckets (rows-per-band
    * concatenated) → candidates share a (band, bucket) key → verified
    * with exact Jaccard; reports both the minhash estimate and the
    * exact value.
    */
  def minhashLsh(spark: SparkSession, dir: String, n: Int = 5, k: Int = 16,
                 rowsPerBand: Int = 2, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(Tables.documents(spark, dir), n).cache()
    val hs = minhashSignatures(sh, k).cache()
    // collect_list order is nondeterministic — sort (i, mh) pairs first.
    val bandsSorted = hs
      .withColumn("band", floor(col("i") / rowsPerBand))
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws("", array_sort(collect_list(struct(col("i"), col("mh")))).getField("mh")).as("bv"))
    val cand = bandsSorted.as("a").join(bandsSorted.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val est = cand.join(hs.select(col("doc_id").as("a_id"), col("i"), col("mh").as("amh")), Seq("a_id"))
      .join(hs.select(col("doc_id").as("b_id"), col("i"), col("mh").as("bmh")), Seq("b_id", "i"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(round(avg(when(col("amh") === col("bmh"), 1.0).otherwise(0.0)), 5).as("est_jaccard"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .join(cand, Seq("a_id", "b_id"), "left_semi")
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    est.join(inter, Seq("a_id", "b_id"), "left")
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .withColumn("jaccard", round(coalesce(col("inter"), lit(0L)) /
        (col("a_sz") + col("b_sz") - coalesce(col("inter"), lit(0L))), 5))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("est_jaccard"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash near-dup: token-hash bit voting weighted by term
    * frequency; candidate pairs must agree on at least one of four
    * 16-bit chunks (pigeonhole: guaranteed complete for hamming ≤ 3,
    * heuristic above); verified by exact hamming distance.
    */
  /** 64-bit SimHash signatures (doc_id, sig): md5-based token hashes,
    * bit voting weighted by term frequency.
    */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val votes = new Array[Long](64)
        text.split(' ').foreach { tok =>
          val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
          var b = 0
          while (b < 64) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L); b += 1 }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        (id, sig)
      }.toDF("doc_id", "sig")
  }

  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    val sigs = simhashSignatures(spark, dir)
    val chunks = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("(sig >> (c * 16)) & 65535"))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("a.sig").as("a_sig"),
        col("b.doc_id").as("b_id"), col("b.sig").as("b_sig"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding-cosine near-dup, blocked by cluster label (at 100 TB the
    * blocking key is an IVF/LSH cell id; the synthetic `label` column
    * stands in). Only same-block pairs are scored.
    */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        col("a.label").cast("long").as("label"),
        cosine5(col("a.embedding"), col("b.embedding")).as("score"))
      .where(col("score") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }
}
