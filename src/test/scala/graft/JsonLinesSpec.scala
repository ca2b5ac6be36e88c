package graft

import org.apache.spark.sql.functions._
import graft.sources.{JsonLines, Tables}

/** Declared-schema JSONL reading: round-trip fidelity, corrupt-line
  * quarantine, and no inference pass. */
class JsonLinesSpec extends SparkSpec {

  test("j01 JSONL round-trip equals the same aggregate over parquet") {
    val viaJsonl = SparkEntry.queries("j01_jsonl_scan")(spark, sfDir).collect()
    val viaParquet = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("text_checksum"))
      .orderBy(col("lang"), col("source"))
      .collect()
    assert(viaJsonl.toSeq == viaParquet.toSeq)
  }

  test("malformed lines quarantine to _corrupt_record instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-corrupt")
    val f = dir.resolve("part-00000.json")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}
        |{"doc_id": 2, "text": "also ok", "lang": "en", "source": "web", "n_chars": 7}
        |{"doc_id": 3, "text": "truncated...
        |not json at all
        |{"doc_id": 4, "text": "fine", "lang": "de", "source": "web", "n_chars": 4}
        |""".stripMargin)
    // Spark refuses plans that touch ONLY _corrupt_record
    // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — always
    // select a data column alongside, as a real quarantine sink would
    val rows = JsonLines.readDocuments(spark, dir.toString)
      .select(col("doc_id"), col("_corrupt_record")).collect()
    val (dirty, clean) = rows.partition(r => !r.isNullAt(1))
    assert(clean.length == 3)
    assert(dirty.length == 2)
    // quarantined rows keep the raw line for audit/repair
    assert(dirty.exists(_.getString(1).contains("not json at all")))
  }

  test("the read plans with the declared schema, no inference pass") {
    // a file whose fields would infer differently (doc_id as string) still
    // reads with the DECLARED types; the mismatched line quarantines
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-schema")
    java.nio.file.Files.writeString(dir.resolve("part-00000.json"),
      """{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "s", "n_chars": 1}
        |{"doc_id": 7, "text": "y", "lang": "en", "source": "s", "n_chars": 1}
        |""".stripMargin)
    val df = JsonLines.readDocuments(spark, dir.toString)
    assert(df.schema("doc_id").dataType == org.apache.spark.sql.types.LongType)
    val rows = df.select(col("doc_id"), col("_corrupt_record")).collect()
    assert(rows.count(r => !r.isNullAt(1)) == 1)
    assert(rows.count(r => !r.isNullAt(0) && r.getLong(0) == 7L) == 1)
  }
}
