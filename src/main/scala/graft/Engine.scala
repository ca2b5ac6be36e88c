package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL-text entry point — the Spark analog of the reference's
  * `Client::executeQuery` (`fpdb-main/src/Client.cpp:94-111`).
  *
  * The reference pipeline is: catalogue fetch → Calcite parse/optimize
  * (thrift to a JVM) → JSON → prephysical plan → physical actors. Here the
  * whole lifecycle is `spark.sql`: catalog registration replaces the
  * catalogue fetch (`Client.cpp:118-132`), Catalyst replaces Calcite
  * (SURVEY.md §3), and the Spark scheduler replaces the CAF actor system.
  * Spark's SQL surface is a strict superset of the reference's accepted
  * grammar (`CalcitePlanJsonDeserializer.cpp:68-89`), so every query the
  * reference runs is accepted unchanged.
  */
object Engine {

  /** Directories already registered, per session — registration re-reads
    * every table's footer (10 schema fetches), which at q32's size was
    * most of the query's wall time. The reference caches its catalogue
    * the same way (one fetch per connection, `Client.cpp:118-132`). */
  // weak keys: a stopped session must not be pinned by the cache
  private val lastDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String])

  /** Register the scale-factor directory's tables (skipped when this
    * session's views already point at `dir`) and run one SQL query.
    * `lastDir` is recorded only AFTER registration succeeds — a partial
    * registration that threw must not be mistaken for a complete one on
    * the next call (it would silently query mixed views). */
  def executeQuery(spark: SparkSession, dir: String, sql: String): DataFrame = {
    // registration AND analysis under one lock: spark.sql resolves view
    // plans eagerly, so once analyzed the returned DataFrame is immune to
    // later view swaps — but the analysis itself must not race a
    // concurrent registerAll for a different dir (execution of the
    // returned frame happens outside the lock, on the inlined plan)
    lastDir.synchronized {
      if (lastDir.get(spark) != dir) {
        Tables.registerAll(spark, dir)
        lastDir.put(spark, dir)
      }
      spark.sql(sql)
    }
  }
}
