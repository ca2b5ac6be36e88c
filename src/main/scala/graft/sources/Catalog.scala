package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Typed catalog entry — the Spark analog of the reference's
  * `schema.json` + `stats.json` metadata directory (`README.md:61-66`,
  * `fpdb-catalogue/include/fpdb/catalogue/CatalogueEntry.h`): name, format,
  * declared schema, and the file shards making up the table. */
case class TableSpec(
    name: String,
    format: String,               // "parquet" | "csv" | "csv.gz" | "json" | "orc"
    paths: Seq[String],
    schema: Option[StructType],   // None => infer from footer (parquet)
    delimiter: String = "|",
    // Some(opts): this spec re-reads a USER relation (a routed leaf) —
    // the relation's own reader options, carried VERBATIM, are the parse
    // authority and none of the catalog's pinned defaults apply, so
    // header'd CSV, custom timestamp formats, JSONL and ORC parse
    // exactly as the user's relation does (r14 verdict item 4)
    relationOptions: Option[Map[String, String]] = None)

/** Catalog layer: declared-schema tables over parquet or (gzipped) CSV
  * shards — the reference's two storage formats
  * (`fpdb-tuple/include/fpdb/tuple/FileFormatType.h:10-13`).
  *
  * Parquet tables self-describe via footers; CSV tables require the
  * declared schema, exactly like the reference's catalogue JSON. Schema
  * declarations use the same field-type vocabulary the reference accepts
  * (int64 / double / string / boolean / date — SURVEY.md §1), parsed from a
  * `schema.json`-shaped document.
  */
object Catalog {

  /** Parse a reference-style schema.json:
    * `{"name": "...", "format": "csv", "delimiter": "|",
    *   "fields": [{"name": "l_orderkey", "type": "int64"}, ...]}` */
  def parseTableSpec(json: String, pathsForTable: String => Seq[String]): TableSpec = {
    val ast = JsonMethods.parse(json)
    def str(field: String): Option[String] = ast \ field match {
      case JString(s) => Some(s); case _ => None
    }
    val name = str("name").getOrElse(sys.error("schema.json: missing name"))
    val fields = (ast \ "fields") match {
      case JArray(fs) => fs.map { f =>
        // descriptive failure, not a ClassCastException: name WHICH
        // table/attribute is malformed (the `name` path's discipline)
        def fstr(attr: String): String = f \ attr match {
          case JString(s) => s
          case _ => sys.error(s"schema.json: table '$name' has a field " +
            s"with missing/non-string '$attr'")
        }
        StructField(fstr("name"), sparkType(fstr("type")))
      }
      case _ => Nil
    }
    TableSpec(
      name,
      str("format").getOrElse("parquet"),
      pathsForTable(name),
      if (fields.isEmpty) None else Some(StructType(fields)),
      str("delimiter").getOrElse("|"))
  }

  /** Reference type vocabulary → Spark types (SURVEY.md §1 table: all ints
    * widened to int64, DECIMAL collapsed to double, DATE_MS → date). */
  def sparkType(t: String): DataType = t.toLowerCase match {
    case "int64" | "long" | "int" | "int32" | "integer" => LongType
    case "double" | "decimal" | "float"                 => DoubleType
    case "string" | "varchar" | "utf8"                  => StringType
    case "boolean" | "bool"                             => BooleanType
    case "date" | "date_ms"                             => DateType
    case "timestamp"                                    => TimestampType
    case other => sys.error(s"unsupported catalog type: $other")
  }

  /** `csv.gz`/`jsonl` are catalog aliases; the Spark source name differs. */
  private def sourceFormat(f: String): String = f match {
    case "csv.gz" => "csv"
    case "jsonl"  => "json"
    case other    => other
  }

  /** Read one table per its spec. Multi-shard tables (`T.parquet.0 …`,
    * `README.md:57-59`) pass all shard paths — Spark parallelizes per file
    * split natively; `.gz` CSV decompresses transparently per file. */
  def read(spark: SparkSession, spec: TableSpec): DataFrame = spec.relationOptions match {
    case Some(opts) =>
      // routed-leaf re-read: the original relation's options verbatim
      // (path options stripped — the spec's explicit paths rule), no
      // pinned defaults, so the parse is identical to the user's by
      // construction
      val r0 = spark.read.format(sourceFormat(spec.format))
        .options(opts.filterNot { case (k, _) =>
          val lk = k.toLowerCase; lk == "path" || lk == "paths" })
      spec.schema.fold(r0)(r0.schema).load(spec.paths: _*)
    case None => spec.format match {
      case "parquet" =>
        val r = spark.read
        spec.schema.map(r.schema).getOrElse(r).parquet(spec.paths: _*)
      case "orc" =>
        val r = spark.read
        spec.schema.map(r.schema).getOrElse(r).orc(spec.paths: _*)
      case "csv" | "csv.gz" =>
        val schema = spec.schema.getOrElse(
          sys.error(s"CSV table ${spec.name} requires a declared schema"))
        spark.read
          .schema(schema)
          .option("delimiter", spec.delimiter)
          .option("header", "false")
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .csv(spec.paths: _*)
      case "json" | "jsonl" =>
        val schema = spec.schema.getOrElse(
          sys.error(s"JSONL table ${spec.name} requires a declared schema"))
        spark.read.schema(schema).json(spec.paths: _*)
      case other => sys.error(s"unsupported format: $other")
    }
  }

  /** Register a set of specs as temp views (SQL catalog). */
  def register(spark: SparkSession, specs: Seq[TableSpec]): Unit =
    specs.foreach(s => read(spark, s).createOrReplaceTempView(s.name))
}
