package graft

import org.apache.spark.sql.functions._
import graft.sources.{Orc, Tables}

/** ORC source: content-identical round-trip and working predicate
  * pushdown through Spark's vectorized ORC reader. */
class OrcSpec extends SparkSpec {

  test("ORC round-trip of events preserves content exactly") {
    val orc = spark.read.orc(Orc.orcEvents(spark, sfDir))
    val pq = Tables.events(spark, sfDir)
    assert(orc.schema == pq.schema,
      s"ORC schema drifted: ${orc.schema.simpleString} vs ${pq.schema.simpleString}")
    // order-independent content fingerprint over every column, incl. the
    // timestamp (where format round-trips actually break)
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)),
        sum(hash(df.columns.map(col): _*).cast("long"))).collect().head.toSeq
    assert(fp(orc) == fp(pq), "ORC round-trip changed content")
  }

  test("ORC scans push predicates and prune columns like parquet") {
    val orc = spark.read.orc(Orc.orcEvents(spark, sfDir))
      .filter(col("event_type") === "click")
      .select("event_id", "event_type")
    val scan = orc.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("event_type"),
      s"ORC filter pushdown missing from the scan:\n$scan")
    assert(scan.contains("struct<event_id:bigint,event_type:string>") ||
      scan.contains("ReadSchema: struct<event_id"),
      s"ORC column pruning missing from the scan:\n$scan")
  }

  test("o01 entry equals the same aggregate over the parquet original") {
    val viaOrc = SparkEntry.queries("o01_orc_scan")(spark, sfDir).collect()
    assert(viaOrc.nonEmpty)
    // the oracle (driver-run) computes over parquet; here pin the Spark
    // side against itself on the parquet original to catch fixture rot
    val pq = Tables.events(spark, sfDir)
    import spark.implicits._
    val viaPq = pq.groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor($"value" * 1000).cast("long")).as("value_millis"),
        min($"ts").as("first_ts"), max($"ts").as("last_ts"),
        sum(conv(substring(md5($"props"), 1, 8), 16, 10).cast("long"))
          .as("props_checksum"))
      .orderBy($"event_type").collect()
    assert(viaOrc.toSeq == viaPq.toSeq,
      "ORC-path aggregate diverged from the parquet original")
  }
}
