package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared persistence layout for build-once/probe-many index artifacts
  * (the engine's analog of the reference's faiss_*.index files,
  * reference app.py:63-102 loading them from disk).
  *
  * Three properties the per-operator paths previously lacked:
  *   - PORTABLE existence probes: the Hadoop FileSystem API honors the
  *     path's scheme (file:, hdfs:, s3a:), where `java.io.File` only
  *     ever saw the local disk — on a cluster that bug rebuilds the
  *     index on every call.
  *   - CONFIGURABLE root (`spark.graft.index.root`), so a deployment
  *     points index artifacts at durable shared storage instead of the
  *     build tree.
  *   - CONTENT FINGERPRINT in the path: the key hashes the source
  *     table's file listing (full path, length, mtime), so regenerating
  *     the corpus at the same path yields a NEW index path instead of
  *     silently serving results from a stale index, and distinct dirs
  *     can never collide (the hash covers the absolute path).
  */
object IndexStore {

  /** Artifact root; override with spark.graft.index.root. */
  def root(spark: SparkSession): String =
    spark.conf.get("spark.graft.index.root", "target/graft-index")

  /** Scheme-aware existence probe (file:/hdfs:/s3a:/...). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** 12-hex-char fingerprint of a table's file listing. Listing-based
    * (name + length + mtime), not content-based: O(files) driver-side
    * metadata calls, no data scan — the same trade Spark's own
    * relation cache makes. Good enough to catch regeneration; cheap
    * enough to run on every ensureIndex call.
    */
  def fingerprint(spark: SparkSession, table: String): String = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
                   else Seq(fs.getFileStatus(p)))
      .map(s => s"${s.getPath}|${s.getLen}|${s.getModificationTime}")
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(entries.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** Canonical artifact path: root/kind_fingerprint_params. */
  def indexPath(spark: SparkSession, kind: String, table: String, params: String): String =
    s"${root(spark)}/${kind}_${fingerprint(spark, table)}_$params"

  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Memoized open of a persisted artifact: partition discovery +
    * schema inference (expensive for a 2^nBits-dir bucket layout) run
    * once per (session, path) — the probe-many analog of the reference
    * keeping its loaded faiss index in memory (app.py:63-102
    * st.cache_resource). A DataFrame is a plan over an immutable,
    * fingerprint-addressed path, so the memo can never serve stale
    * data (regenerated corpora map to NEW paths) and pins no executor
    * memory.
    */
  def open(spark: SparkSession, path: String): DataFrame = {
    // evict entries of stopped sessions so session churn can't leak
    val it = loaded.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    loaded.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
  }

  /** Drop a memoized artifact (call after appending to its path —
    * the cached file listing no longer covers the new files).
    */
  def invalidate(spark: SparkSession, path: String): Unit =
    loaded.remove((spark, path))
}
