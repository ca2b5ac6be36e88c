package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-shard Bloom-filter sidecar: plan-time shard pruning for EQUALITY
  * lookups on columns with no range correlation to the shard layout —
  * exactly where [[ZoneMapPruner]] is blind. A hash-bucketed table (the
  * common data-lake layout) gives every shard a (min, max) spanning the
  * whole key domain, so zone maps prune nothing; but each key lives in
  * few shards, so a membership sketch prunes almost all of them. The two
  * sidecars are complements: zone maps answer range predicates on
  * range-correlated layouts, blooms answer point predicates on hashed
  * layouts. Reference analog: the same `zoneMap.json`-style
  * catalogue-sidecar slot (`fpdb-catalogue/include/fpdb/catalogue/
  * Partition.h:23-41`), with a sketch instead of min/max scalars.
  *
  * At 100 TB the sidecar stays tiny relative to data (1 bloom per file,
  * ~100 KB at 1% fpp for 100k keys) and pruning happens before the file
  * list reaches `spark.read` — skipped shards never become input splits,
  * the same contract as the reference's plan-construction-time pruner
  * (`fpdb-executor/src/physical/prune/PartitionPruner.cpp:23-51`).
  */
object BloomPruner {

  /** One shard's membership sketch over a long key column. False
    * positives only — a bloom says "maybe here" or "definitely not". */
  case class ShardBloom(path: String, keyCol: String, bloom: BloomFilter)

  /** Build the sidecar in ONE distributed pass: Spark's own
    * `BloomFilterAggregate` (the expression behind runtime join filters)
    * grouped by `input_file_name()` — no per-file driver loop, so ingest
    * cost is a single scan however many shards exist. */
  def build(df: DataFrame, keyCol: String, expectedItems: Long = 100000L): Seq[ShardBloom] = {
    val agg = GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(col(keyCol).cast("long")), expectedItems)
        .toAggregateExpression())
    df.groupBy(input_file_name().as("__file")).agg(agg.as("__bloom"))
      .collect() // one row per shard — sidecar construction, not a data path
      .map(r => ShardBloom(r.getAs[String]("__file"), keyCol,
        BloomFilter.readFrom(r.getAs[Array[Byte]]("__bloom"))))
      .toSeq
  }

  /** [[build]] for a STRING key column (r16): entity-id strings (UUIDs,
    * "cust-42"-style composite ids) are THE common hash-bucketed lake
    * key, and the long-only builder left them unprunable. Spark's
    * `BloomFilterAggregate` takes a LONG child, so the string hashes
    * through the engine's own `xxhash64` — the SAME expression the
    * lookup side evaluates driver-side ([[xx64]]), so a key present in
    * the data can never miss its shard's bloom (hash collisions only
    * ever ADD false positives; the residual equality is mandatory
    * anyway). */
  def buildString(df: DataFrame, keyCol: String,
      expectedItems: Long = 100000L): Seq[ShardBloom] = {
    val agg = GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(xxhash64(col(keyCol))),
        expectedItems).toAggregateExpression())
    df.groupBy(input_file_name().as("__file")).agg(agg.as("__bloom"))
      .collect()
      .map(r => ShardBloom(r.getAs[String]("__file"), keyCol,
        BloomFilter.readFrom(r.getAs[Array[Byte]]("__bloom"))))
      .toSeq
  }

  /** The engine's own 64-bit hash of a string, evaluated driver-side —
    * MUST be the exact `xxhash64` the build pass used, or a present key
    * could miss its bloom (a false NEGATIVE — row loss). */
  private[graft] def xx64(key: String): Long =
    // the auxiliary constructor carries the SQL function's default seed
    // (42), the same seed `xxhash64(col)` compiles to on the build side
    new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(key),
        org.apache.spark.sql.types.StringType)))
      .eval(null).asInstanceOf[Long]

  /** Shards that may contain `key` (false positives possible, never false
    * negatives — pruning is always sound). */
  def prune(shards: Seq[ShardBloom], key: Long): Seq[ShardBloom] =
    shards.filter(_.bloom.mightContainLong(key))

  /** [[prune]] for a string key against a [[buildString]] sidecar. */
  def pruneString(shards: Seq[ShardBloom], key: String): Seq[ShardBloom] =
    prune(shards, xx64(key))

  /** Read only the shards whose bloom admits `key`, then re-apply the
    * exact equality (false positives make the residual mandatory). An
    * empty sidecar (a table with no shards at build time) reads
    * nothing — no key column to consult. */
  def readPruned(spark: SparkSession, spec: TableSpec,
      shards: Seq[ShardBloom], key: Long): DataFrame = {
    if (shards.isEmpty) return Catalog.read(spark, spec).limit(0)
    val keep = prune(shards, key).map(_.path)
    val df =
      if (keep.isEmpty) Catalog.read(spark, spec).limit(0) // definitely absent
      else Catalog.read(spark, spec.copy(paths = keep))
    df.filter(col(shards.head.keyCol) === key)
  }

  /** [[readPruned]] for a string key against a [[buildString]] sidecar. */
  def readPrunedString(spark: SparkSession, spec: TableSpec,
      shards: Seq[ShardBloom], key: String): DataFrame = {
    if (shards.isEmpty) return Catalog.read(spark, spec).limit(0)
    val keep = pruneString(shards, key).map(_.path)
    val df =
      if (keep.isEmpty) Catalog.read(spark, spec).limit(0) // definitely absent
      else Catalog.read(spark, spec.copy(paths = keep))
    df.filter(col(shards.head.keyCol) === key)
  }

  // ---- end-to-end demonstration entry ------------------------------------

  /** Ingest-once artifact: `orders` hash-sharded 8 ways by o_custkey into
    * CSV (each custkey lands in exactly one shard; every shard's key
    * RANGE spans the whole domain, so zone maps cannot prune this layout
    * at all) with one bloom per shard built in a single pass. */
  private val artifact = new graft.util.SessionCache[(TableSpec, Seq[ShardBloom])]()

  private[graft] def shardedByCustkey(s: SparkSession, dir: String): (TableSpec, Seq[ShardBloom]) =
    artifact.getOrBuild(s, dir) {
      // write-once via Fixtures: the old mode("overwrite") into a
      // dir-keyed /tmp path let a SECOND session on the same dir delete
      // the part-files the first session's cached spec still points at
      val out = Fixtures.ensure(s, Fixtures.path(dir, "orders_bloom_csv")) {
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
          .repartition(8, col("o_custkey"))
          .write.mode("overwrite")
          .option("delimiter", "|").option("header", "false")
          .csv(Fixtures.path(dir, "orders_bloom_csv"))
      }
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
        .map(_.getPath.toString).sorted.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType)))
      val spec = TableSpec("orders_bloom_csv", "csv", files, Some(schema), "|")
      (spec, build(Catalog.read(s, spec), "o_custkey"))
    }

  /** z02 — bloom-sidecar point lookup end-to-end: `o_custkey = 42`
    * against the hash-sharded CSV table reads only the (expectedly 1 of
    * 8, ± false positives — `SourcesSpec` asserts the count) shards whose
    * bloom admits the key; the result must equal DuckDB running the same
    * predicate over the parquet original. */
  private def z02BloomPrune(s: SparkSession, dir: String): DataFrame = {
    val (spec, blooms) = shardedByCustkey(s, dir)
    readPruned(s, spec, blooms, 42L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Tables.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val z02Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_custkey = 42
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** STRING-keyed twin of [[shardedByCustkey]]: orders hash-bucketed 8
    * ways by the synthesized entity id `cust_id = 'cust-' || o_custkey`
    * — the UUID/composite-id lake shape where the key is a string and
    * zone maps prune nothing (every shard's string interval spans the
    * domain). */
  private[graft] def shardedByCustId(s: SparkSession, dir: String)
      : (TableSpec, Seq[ShardBloom]) =
    artifact.getOrBuild(s, s"$dir#custid") {
      val out = Fixtures.ensure(s, Fixtures.path(dir, "orders_bloomstr_csv")) {
        Tables.orders(s, dir)
          .select(concat(lit("cust-"), col("o_custkey")).as("cust_id"),
            col("o_totalprice"), col("o_orderstatus"))
          .repartition(8, col("cust_id"))
          .write.mode("overwrite")
          .option("delimiter", "|").option("header", "false")
          .csv(Fixtures.path(dir, "orders_bloomstr_csv"))
      }
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
        .map(_.getPath.toString).sorted.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cust_id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType)))
      val spec = TableSpec("orders_bloomstr_csv", "csv", files, Some(schema), "|")
      (spec, buildString(Catalog.read(s, spec), "cust_id"))
    }

  /** z13 (r16) — STRING-key bloom point lookup end-to-end:
    * `cust_id = 'cust-42'` against the string-hash-bucketed CSV table
    * reads only the shards whose bloom admits xxhash64('cust-42')
    * (expectedly 1 of 8 ± false positives — spec-pinned); the oracle is
    * the equivalent numeric predicate over the parquet original
    * ('cust-' || o_custkey = 'cust-42'  ⇔  o_custkey = 42). */
  private def z13BloomStringPrune(s: SparkSession, dir: String): DataFrame = {
    val (spec, blooms) = shardedByCustId(s, dir)
    readPrunedString(s, spec, blooms, "cust-42")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Tables.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val z13Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_custkey = 42
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z02_bloom_prune" -> z02BloomPrune _,
    "z13_bloom_string" -> z13BloomStringPrune _,
  )

  val oracleSql: Map[String, String] = Map(
    "z02_bloom_prune" -> z02Sql,
    "z13_bloom_string" -> z13Sql,
  )
}
