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
  */
final class SessionCache[V](maxEntries: Int = 8) {

  private val map = new java.util.LinkedHashMap[(SparkSession, String), V](
    16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(SparkSession, String), V]): Boolean =
      size() > maxEntries
  }

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = synchronized {
    val k = (s, key)
    val cur = map.get(k)
    if (cur != null) cur
    else {
      val v = build
      map.put(k, v)
      v
    }
  }
}
