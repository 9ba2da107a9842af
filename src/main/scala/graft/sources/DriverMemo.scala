package graft.sources

import org.apache.spark.sql.SparkSession

/** Bounded per-process memo for SMALL, CONTENT-ADDRESSED index
  * metadata the driver-side probe planners re-read on every call —
  * IVF centroid tables ([[graft.operators.Ivf.rankCells]]), RP-tree
  * plane tables, SQ8 range stats: each is O(index params), never
  * O(corpus), and each lives under an [[IndexStore]] fingerprint so
  * the key changes whenever the source data does (regenerated corpus →
  * new fingerprint → new entry, the same staleness discipline as the
  * on-disk artifacts).
  *
  * Why: a single-query search (the reference's interactive path,
  * app.py:383-414) pays one Spark job per metadata collect — measured
  * at sf0.1 the 13-family eval harness spent ~30-80 ms per such job,
  * several per call. The metadata is immutable per fingerprint, so the
  * second call should not re-run the job (guide §1.2: remove work, not
  * tune it). This is the driver-side twin of [[graft.Tables.warm]] —
  * in-process serving state, rebuilt from the parquet artifacts in
  * every new JVM; nothing persists across runs beyond what IndexStore
  * already publishes.
  *
  * Entries are evicted LRU past `spark.graft.driver.memo.size`
  * (default 64) and when their session stops.
  */
object DriverMemo {

  private def capacity(spark: SparkSession): Int =
    spark.conf.get("spark.graft.driver.memo.size", "64").toInt

  private val lru =
    new java.util.LinkedHashMap[(SparkSession, String), AnyRef](16, 0.75f, true)

  /** Get-or-compute `value` under (session, key). `key` must be
    * content-addressed (carry an [[IndexStore.fingerprint]] or a
    * fingerprinted artifact path) so stale data can never be served.
    */
  def memo[T <: AnyRef](spark: SparkSession, key: String)(value: => T): T =
    synchronized {
      val dead = lru.keySet.iterator()
      while (dead.hasNext) if (dead.next()._1.sparkContext.isStopped) dead.remove()
      val k = (spark, key)
      val hit = lru.get(k)
      if (hit != null) hit.asInstanceOf[T]
      else {
        val v = value
        lru.put(k, v)
        val cap = capacity(spark)
        val it = lru.entrySet().iterator()
        while (lru.size() > cap && it.hasNext) { it.next(); it.remove() }
        v
      }
    }

  /** Drop every entry of this session whose key starts with `prefix` —
    * the hook maintenance ops that rewrite an artifact IN PLACE
    * ([[graft.operators.Ivf.rebalanceIndex]]) call next to
    * [[IndexStore.invalidate]].
    */
  def invalidatePrefix(spark: SparkSession, prefix: String): Unit = synchronized {
    val it = lru.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if ((k._1 eq spark) && k._2.startsWith(prefix)) it.remove()
    }
  }

  /** Test hook: drop everything. */
  def clear(): Unit = synchronized(lru.clear())

  /** Test hook: number of live entries. */
  def size: Int = synchronized(lru.size())
}
