package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC source — the second columnar format a warehouse-adjacent engine
  * meets in practice (Hive-era lakes are ORC; Trino/Hive pipelines still
  * emit it). The reference's source surface is CSV + parquet
  * (`fpdb-tuple/include/fpdb/tuple/FileType.h`); ORC is pipeline-engine
  * breadth on the same write-once-fixture conventions as the JSONL path
  * ([[JsonLines]]), using Spark's built-in vectorized ORC reader.
  *
  * What carries over from parquet for free — and is worth saying at
  * 100 TB: ORC has its own stripe/row-group min-max statistics and
  * predicate pushdown (`spark.sql.orc.filterPushdown`, default on), so
  * the write-time clustering story ([[Layout]]) applies unchanged; and
  * the vectorized reader keeps scans inside columnar batches exactly
  * like the parquet path, so none of the engine's operators care which
  * of the two columnar formats fed them.
  *
  * The fixture is an ORC copy of `events` — deliberately the table with
  * a TIMESTAMP column and a JSON-string column: timestamps are where
  * format round-trips actually break (epoch vs local semantics,
  * INT96-era precision), and the entry's min/max-ts + text-checksum
  * aggregate would catch either corruption. The oracle runs against the
  * parquet ORIGINAL: the ORC path must change encoding, never content.
  */
object Orc {

  /** Path of the ORC copy of `dir`'s events, written once per (session,
    * dir) and reused across JVMs via [[Fixtures.cached]]. */
  private[graft] def orcEvents(s: SparkSession, dir: String): String =
    Fixtures.cached(s, dir, "events_orc") { out =>
      Tables.events(s, dir).write.mode("overwrite").orc(out)
    }

  /** o01 — aggregate over the ORC round-trip of events: per-type counts,
    * an exact integer value checksum (per-row millis cast, so no
    * float-summation-order noise), timestamp extrema, and a props-text
    * md5 checksum — any mangled character, shifted timestamp, or
    * lost row changes a value the oracle (over the parquet original)
    * pins exactly. */
  private def o01OrcScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = s.read.orc(orcEvents(s, dir))
    ev.groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        // floor, not a bare cast: Spark's double→long cast truncates
        // toward zero while DuckDB's rounds — floor() agrees everywhere
        sum(floor($"value" * 1000).cast("long")).as("value_millis"),
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"),
        sum(graft.sources.Tables.md5Checksum($"props")).as("props_checksum"))
      .orderBy($"event_type")
  }

  private val o01Sql =
    s"""SELECT event_type, count(*) AS n_events,
       |  sum(CAST(floor(value * 1000) AS BIGINT))::BIGINT AS value_millis,
       |  min(ts) AS first_ts, max(ts) AS last_ts,
       |  sum(${graft.sources.Tables.md5ChecksumSql("props")})::BIGINT AS props_checksum
       |FROM events
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o01_orc_scan" -> o01OrcScan _,
  )

  val oracleSql: Map[String, String] = Map(
    "o01_orc_scan" -> o01Sql,
  )
}
