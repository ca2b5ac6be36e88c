package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines source — the interchange format LLM corpus pipelines
  * actually exchange (one JSON object per line: WebText/C4/RedPajama
  * dumps, annotation exports, API logs). The reference's source surface
  * is CSV + parquet (`fpdb-tuple/include/fpdb/tuple/FileType.h`); JSONL
  * is pipeline-engine breadth on the same [[Catalog]] conventions as the
  * declared-schema CSV path.
  *
  * The two decisions that matter at 100 TB:
  *
  *  - **Schema is DECLARED, never inferred.** Spark's JSON schema
  *    inference is a full extra pass over the data before the real scan
  *    (100 TB read twice); worse, inference is sample-dependent — a rare
  *    field or a numeric string flips a column's type between runs and
  *    silently changes downstream semantics. The reader here takes the
  *    catalog schema plus a `_corrupt_record` column, so one malformed
  *    line quarantines to a row instead of failing the job or (FAILFAST)
  *    or silently nulling (DROPMALFORMED) — PERMISSIVE + audit is the
  *    only mode that both survives and reports dirty web data.
  *  - **Plain JSONL splits by line; gzip does not.** An uncompressed
  *    (or zstd-framed) JSONL shard parallelizes within the file like
  *    CSV; a .json.gz shard is one task no matter its size — the same
  *    sharding discipline [[Catalog]] documents for CSV applies, which
  *    is why corpus dumps ship as many ~100 MB-1 GB shards.
  *
  * `LayoutSpec`-style write-once fixture: the JSONL copy of `documents`
  * is produced from the parquet original per (session, dir), then read
  * back through the declared-schema path — the oracle runs against the
  * parquet original, so the entry proves the JSONL round-trip loses
  * nothing (delimiters, quotes, and unicode in `text` survive the JSON
  * escaping that breaks naive CSV round-trips).
  */
object JsonLines {

  /** Documents schema as declared (mirrors the parquet catalog schema). */
  private[graft] val documentsSchema = StructType(Seq(
    StructField("doc_id", org.apache.spark.sql.types.LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", org.apache.spark.sql.types.LongType)))

  /** Path of the JSONL copy of `dir`'s documents, written once. */
  private[graft] def jsonlDocuments(s: SparkSession, dir: String): String =
    Fixtures.cached(s, dir, "documents_jsonl") { out =>
      Tables.documents(s, dir).write.mode("overwrite").json(out)
    }

  /** Declared-schema JSONL read with corrupt-line quarantine. */
  private[graft] def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(documentsSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** j01 — aggregate over the JSONL round-trip of documents: per-(lang,
    * source) counts, total chars, and a content checksum (sum of per-doc
    * text md5 prefixes — any mangled character in any document changes
    * it). The oracle computes the same over the parquet ORIGINAL: the
    * JSONL path must change encoding, never content. */
  private def j01JsonlScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = readDocuments(s, jsonlDocuments(s, dir))
    docs.filter($"_corrupt_record".isNull)
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        sum(Tables.md5Checksum($"text")).as("text_checksum"))
      .orderBy($"lang", $"source")
  }

  private val j01Sql =
    s"""SELECT lang, source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
      |  sum(${Tables.md5ChecksumSql("text")})::BIGINT AS text_checksum
      |FROM documents
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j01_jsonl_scan" -> j01JsonlScan _,
  )

  val oracleSql: Map[String, String] = Map(
    "j01_jsonl_scan" -> j01Sql,
  )
}
