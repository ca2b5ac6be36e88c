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

  /** Register the scale-factor directory's tables and run one SQL query. */
  def executeQuery(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(sql)
  }
}
