package graft.util

import org.apache.spark.sql.SparkSession

/** Small bounded per-(session, key) artifact cache.
  *
  * Weak session keys do NOT work when the cached value is a DataFrame:
  * the value strongly references its SparkSession, which re-reaches the
  * key through the map and pins the entry forever (the WeakHashMap
  * value→key pitfall). So retention is bounded instead: access-ordered
  * LRU over (session, key) with a small capacity — the worst case is
  * `maxEntries` retained artifacts, not one per session×dir ever seen.
  * Evicting an entry drops the only strong reference to its value, so a
  * checkpointed frame's blocks become ContextCleaner-reclaimable (Spark's
  * normal path for unreferenced RDD storage; there is no public API to
  * free localCheckpoint blocks eagerly).
  *
  * Builds run OUTSIDE the monitor: a multi-second artifact build (k-means
  * training, label propagation) must not block cache hits for other
  * entries. Two racing builders for the same key both build; the first
  * insert wins and the loser's value is discarded (artifacts here are
  * idempotent and side-effect-free, so the duplicate work is benign).
  */
final class SessionCache[V](maxEntries: Int = 8) {

  private val map = new java.util.LinkedHashMap[(SparkSession, String), V](
    16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(SparkSession, String), V]): Boolean =
      size() > maxEntries
  }

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = {
    val k = (s, key)
    synchronized {
      val cur = map.get(k)
      if (cur != null) return cur
    }
    val v = build
    synchronized {
      val cur = map.get(k)
      if (cur != null) cur
      else {
        map.put(k, v)
        v
      }
    }
  }
}
