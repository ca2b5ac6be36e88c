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
    * cost is a single scan however many shards exist.
    *
    * Key encoding follows the zone-map discipline (r16 review): DATE
    * keys insert as epoch DAYS and TIMESTAMP keys as epoch MICROS — the
    * SAME dimensions [[graft.plans.ModeExec.rangePreds]] encodes those
    * literals in. A bare `cast("long")` on a timestamp yields epoch
    * SECONDS, so a micros-valued lookup would miss every shard's
    * bloom — a false NEGATIVE, i.e. row loss behind a "sound" sketch.
    * Integral keys cast as before (identity). String keys must use
    * [[buildString]]. */
  def build(df: DataFrame, keyCol: String, expectedItems: Long = 100000L): Seq[ShardBloom] = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    val enc = df.schema(keyCol).dataType match {
      case DateType      => unix_date(col(keyCol)).cast("long")
      case TimestampType => unix_micros(col(keyCol))
      case _             => col(keyCol).cast("long")
    }
    val agg = GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(enc), expectedItems)
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
      shards: Seq[ShardBloom], key: Long): DataFrame =
    readKept(spark, spec, shards, prune(shards, key), lit(key))

  /** [[readPruned]] for a string key against a [[buildString]] sidecar. */
  def readPrunedString(spark: SparkSession, spec: TableSpec,
      shards: Seq[ShardBloom], key: String): DataFrame =
    readKept(spark, spec, shards, pruneString(shards, key), lit(key))

  private def readKept(spark: SparkSession, spec: TableSpec,
      shards: Seq[ShardBloom], kept: Seq[ShardBloom],
      key: Column): DataFrame = {
    if (shards.isEmpty) return Catalog.read(spark, spec).limit(0)
    val keep = kept.map(_.path)
    val df =
      if (keep.isEmpty) Catalog.read(spark, spec).limit(0) // definitely absent
      else Catalog.read(spark, spec.copy(paths = keep))
    df.filter(col(shards.head.keyCol) === key)
  }

  // ---- persisted sidecar (r16): the deployment-reachable form ----------

  /** The bloom sidecar's file name — underscore-prefixed like the zone
    * sidecar so file indexes skip it as data; same catalogue-sidecar
    * slot as the reference's partition metadata (`Partition.h:23-41`).
    * Format: header `v=1<TAB>keyCol=<col><TAB>kind=<long|string>`, then
    * one `fileName<TAB>base64(bloom bytes)` line per shard (file NAMES
    * relative so the directory can move). */
  val SidecarName = "_graft_bloom"

  /** Key kind the sidecar was built over: `long` blooms insert the
    * column cast to long; `string` blooms insert xxhash64 of the string
    * — the lookup side must hash the same way, so the kind is part of
    * the persisted contract. */
  sealed abstract class KeyKind(val name: String)
  case object LongKey extends KeyKind("long")
  case object StringKey extends KeyKind("string")

  /** Persist `blooms` as `dir/_graft_bloom` (tmp + rename — readers
    * never see a torn file). */
  def writeSidecar(s: SparkSession, dir: String, keyCol: String,
      kind: KeyKind, blooms: Seq[ShardBloom]): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".${SidecarName}.tmp.${System.nanoTime}")
    val target = new org.apache.hadoop.fs.Path(root, SidecarName)
    val text = new StringBuilder(s"v=1\tkeyCol=$keyCol\tkind=${kind.name}\n")
    blooms.sortBy(_.path).foreach { b =>
      val name = new org.apache.hadoop.fs.Path(b.path).getName
      val buf = new java.io.ByteArrayOutputStream()
      b.bloom.writeTo(buf)
      text.append(name).append('\t')
        .append(java.util.Base64.getEncoder.encodeToString(buf.toByteArray))
        .append('\n')
    }
    val out = fs.create(tmp, true)
    try out.write(text.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      sys.error(s"could not publish bloom sidecar $target")
  }

  // Parsed-sidecar memo keyed by (uri path, sidecar len, sidecar
  // mtime) — SELF-invalidating: any rewrite changes (len, mtime) and
  // misses, so no writer hook is needed (r16 review: the conf route
  // classifies per query per leaf, and re-decoding base64 sketches of
  // 5k shards per query is exactly the per-decision cost the r15
  // driver-cheap work removed; one stat per query replaces the full
  // decode). Bounded LRU; values are immutable parses, nothing to
  // release on eviction.
  private val SidecarCacheMax = 64
  private val sidecarCache = new java.util.LinkedHashMap[
      (String, Long, Long), Option[(String, KeyKind, Seq[ShardBloom])]](
      16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (String, Long, Long),
        Option[(String, KeyKind, Seq[ShardBloom])]]): Boolean =
      size() > SidecarCacheMax
  }

  /** Load `dir/_graft_bloom` if present: (keyCol, kind, shard blooms
    * with absolute paths). Malformed → None (pruning is an
    * optimization, never a correctness input). Parses are memoized on
    * the sidecar file's (length, mtime) — see [[sidecarCache]]. */
  def readSidecar(s: SparkSession, dir: String)
      : Option[(String, KeyKind, Seq[ShardBloom])] =
    try {
      val root0 = new org.apache.hadoop.fs.Path(dir)
      val fs0 = root0.getFileSystem(s.sparkContext.hadoopConfiguration)
      val target0 = new org.apache.hadoop.fs.Path(root0, SidecarName)
      if (!fs0.exists(target0)) return None
      val st = fs0.getFileStatus(target0)
      val ck = (target0.toUri.getPath, st.getLen, st.getModificationTime)
      sidecarCache.synchronized {
        val hit = sidecarCache.get(ck)
        if (hit != null) return hit
      }
      val parsed = parseSidecar(s, dir)
      sidecarCache.synchronized { sidecarCache.put(ck, parsed) }
      parsed
    } catch { case e: Exception =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"ignoring unreadable bloom sidecar under $dir: ${e.getMessage}")
      None
    }

  private def parseSidecar(s: SparkSession, dir: String)
      : Option[(String, KeyKind, Seq[ShardBloom])] =
    try {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      val target = new org.apache.hadoop.fs.Path(root, SidecarName)
      if (!fs.exists(target)) return None
      val in = fs.open(target)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8")
      } finally in.close()
      val lines = text.linesIterator.toSeq
      val header = lines.headOption.getOrElse(return None).split('\t')
      if (!header.headOption.contains("v=1") || header.length < 3) return None
      val keyCol = header(1).stripPrefix("keyCol=")
      val kind = header(2).stripPrefix("kind=") match {
        case "long"   => LongKey
        case "string" => StringKey
        case _        => return None
      }
      Some((keyCol, kind, lines.drop(1).filter(_.nonEmpty).map { line =>
        val Array(name, b64) = line.split('\t')
        ShardBloom(new org.apache.hadoop.fs.Path(root, name).toString, keyCol,
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(b64))))
      }))
    } catch { case e: Exception =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"ignoring unreadable bloom sidecar under $dir: ${e.getMessage}")
      None
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
      val blooms = build(Catalog.read(s, spec), "o_custkey")
      // publish the sidecar next to the data (write-once like the
      // files): the conf-mode rewriter detects it and prunes point
      // lookups with no library call (r16)
      val sidecar = new org.apache.hadoop.fs.Path(out, SidecarName)
      if (!fs.exists(sidecar))
        writeSidecar(s, out.toString, "o_custkey", LongKey, blooms)
      (spec, blooms)
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
      val blooms = buildString(Catalog.read(s, spec), "cust_id")
      val sidecar = new org.apache.hadoop.fs.Path(out, SidecarName)
      if (!fs.exists(sidecar))
        writeSidecar(s, out.toString, "cust_id", StringKey, blooms)
      (spec, blooms)
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

  // same oracle shape as z02 by construction ('cust-' || o_custkey =
  // 'cust-42' iff o_custkey = 42): one definition, three consumers
  private def z13Sql = z02Sql

  /** z14 (r16) — the bloom sidecar through the DEPLOYMENT path: a plain
    * view over the string-hash-bucketed directory + `SET
    * spark.graft.scanMode=hybrid`, no library call anywhere. The
    * conf-mode rewriter detects `_graft_bloom`, routes the leaf per
    * shard (zones synthesized bound-free — a hash layout has no ranges
    * to prune), and the `cust_id = 'cust-42'` equality drops every
    * shard whose sketch rejects xxhash64('cust-42'). Oracle = the
    * equivalent numeric predicate over the parquet original. */
  private def z14ConfBloom(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = shardedByCustId(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_bloomstr_csv")
    val sql =
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_bloomstr_csv
        |WHERE cust_id = 'cust-42'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    val prev = s.conf.getOption("spark.graft.scanMode")
    s.conf.set("spark.graft.scanMode", "hybrid")
    try graft.Engine.executeQuery(s, dir, sql)
    finally prev match {
      case Some(v) => s.conf.set("spark.graft.scanMode", v)
      case None    => s.conf.unset("spark.graft.scanMode")
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z02_bloom_prune" -> z02BloomPrune _,
    "z13_bloom_string" -> z13BloomStringPrune _,
    "z14_conf_bloom"  -> z14ConfBloom _,
  )

  val oracleSql: Map[String, String] = Map(
    "z02_bloom_prune" -> z02Sql,
    "z13_bloom_string" -> z13Sql,
    "z14_conf_bloom"  -> z13Sql,
  )
}
