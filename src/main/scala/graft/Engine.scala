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
  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]

  /** Register the scale-factor directory's tables (skipped when this
    * session's views already point at `dir`) and run one SQL query. */
  def executeQuery(spark: SparkSession, dir: String, sql: String): DataFrame = {
    if (lastDir.put(spark, dir) != dir) Tables.registerAll(spark, dir)
    spark.sql(sql)
  }
}
