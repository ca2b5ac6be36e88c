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

  /** Per-session registration state: the directory whose tables this
    * session's views point at, used as both record and lock. Registration
    * re-reads every table's footer (10 schema fetches), which at q32's
    * size was most of the query's wall time; the reference caches its
    * catalogue the same way (one fetch per connection, `Client.cpp:
    * 118-132`). Weak keys: a stopped session must not be pinned. */
  private[graft] final class Registration { var dir: String = null }
  private val reg = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, Registration])

  /** Register the scale-factor directory's tables (skipped when this
    * session's views already point at `dir`) and run one SQL query.
    * `Registration.dir` is recorded only AFTER registration succeeds — a
    * partial registration that threw must not be mistaken for a complete
    * one on the next call (it would silently query mixed views). */
  def executeQuery(spark: SparkSession, dir: String, sql: String): DataFrame = {
    // registration AND analysis under one PER-SESSION lock: spark.sql
    // resolves view plans eagerly, so once analyzed the returned DataFrame
    // is immune to later view swaps — but the analysis must not race a
    // concurrent registerAll for a different dir ON THE SAME SESSION
    // (execution of the returned frame happens outside the lock, on the
    // inlined plan). Temp views are session-scoped state, so sessions
    // never contend with each other — a concurrent-user engine must not
    // serialize all submissions on one JVM-wide monitor.
    val r = lockFor(spark)
    r.synchronized {
      if (r.dir != dir) {
        Tables.registerAll(spark, dir)
        r.dir = dir
      }
      spark.sql(sql)
    }
  }

  /** The per-session registration lock (spec hook: stripe assertions). */
  private[graft] def lockFor(spark: SparkSession): Registration =
    reg.computeIfAbsent(spark, _ => new Registration)
}
