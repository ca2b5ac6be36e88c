package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-shard zone map: column → (min, max) over that shard's rows —
  * the reference's `zoneMap.json` / `Partition::getZoneMap()`
  * (`fpdb-catalogue/include/fpdb/catalogue/Partition.h:23-41`). Numeric
  * bounds in `ranges`; STRING bounds (r16 — the reference prunes on typed
  * Scalars including strings, its `litToScalar` converts `StringLiteral`,
  * `fpdb-executor/src/physical/prune/PartitionPruner.cpp:100-104`) in
  * `strRanges`, ordered by UTF-8 bytes — the SAME ordering Spark's
  * UTF8String comparisons use, so a zone decision can never disagree with
  * the residual filter. An all-NULL string shard is simply omitted from
  * `strRanges` (kept conservatively; the numeric side keeps its
  * empty-interval encoding). Contract note: bounds round-trip through
  * java.lang.String, which is lossless exactly when the data is valid
  * UTF-8 — true by construction for CSV/JSON (their readers decode with
  * replacement BEFORE the filter sees values, so bounds and filter agree
  * even on malformed input) and required by the format spec for parquet
  * string columns (out-of-spec binary-as-UTF8 data is outside this
  * sidecar's contract). */
case class ShardZoneMap(path: String,
    ranges: Map[String, (Double, Double)],
    strRanges: Map[String, (String, String)] = Map.empty)

/** Plan-time shard pruning for formats without embedded statistics (CSV).
  *
  * Parquet needs none of this — row-group min/max + predicate pushdown are
  * native (assert via `PushedFilters` in `.explain`). For CSV shards the
  * reference keeps an external `zoneMap.json` and drops partitions whose
  * predicate simplifies to false *during plan construction*
  * (`fpdb-executor/src/physical/prune/PartitionPruner.cpp:23-51`); this is
  * the same: prune the file list before `spark.read` ever sees it, so the
  * skipped shards never become input splits. On a 100 TB table with
  * range-correlated shards (date-partitioned logs), this is the difference
  * between scanning everything and scanning one shard.
  */
object ZoneMapPruner {

  /** Conjunctive range predicates — the pruning-relevant subset of the
    * reference's expression surface (its pruner likewise walks
    * and/or/compare/literal nodes and gives up on anything else,
    * `fpdb-executor/src/physical/prune/PartitionPruner.cpp:23-88`).
    * Numeric (`Gt`…`Between`), string-typed (`SGt`…`SBetween` — UTF-8
    * byte order, [[utf8Cmp]]), and the OR combinator ([[OrPred]]: a
    * disjunction of extracted conjunctions; a shard survives iff SOME
    * branch may match — the reference's OR arm prunes a partition only
    * when EVERY branch is invalid, `PartitionPruner.cpp:70-88`). */
  sealed trait RangePred { def col: String }
  case class Gt(col: String, v: Double) extends RangePred
  case class Ge(col: String, v: Double) extends RangePred
  case class Lt(col: String, v: Double) extends RangePred
  case class Le(col: String, v: Double) extends RangePred
  case class EqTo(col: String, v: Double) extends RangePred
  /** `col <> v`: prunes only a shard whose interval is EXACTLY the
    * single value v (common under status/category sharding, where a
    * shard holds one key value). */
  case class Neq(col: String, v: Double) extends RangePred
  case class Between(col: String, lo: Double, hi: Double) extends RangePred
  /** `col IS NOT NULL`: prunes all-NULL shards — the numeric side
    * stores those as the empty interval (lo > hi); string zones omit
    * the column (conservatively kept). */
  case class NotNull(col: String) extends RangePred
  case class SGt(col: String, v: String) extends RangePred
  case class SGe(col: String, v: String) extends RangePred
  case class SLt(col: String, v: String) extends RangePred
  case class SLe(col: String, v: String) extends RangePred
  case class SEq(col: String, v: String) extends RangePred
  case class SBetween(col: String, lo: String, hi: String) extends RangePred
  /** String twin of [[Neq]]. */
  case class SNeq(col: String, v: String) extends RangePred
  /** `col LIKE 'v%'` (Catalyst `StartsWith` after LikeSimplification). */
  case class SPrefix(col: String, v: String) extends RangePred
  case class OrPred(branches: Seq[Seq[RangePred]]) extends RangePred {
    def col: String = branches.flatten.map(_.col).distinct.mkString("|")
  }

  /** Spark's string ordering: UTF8String compares the UTF-8 BYTES
    * unsigned (= code-point order), which differs from Java's
    * `String.compareTo` (UTF-16 code units) exactly where supplementary
    * characters meet [U+E000, U+FFFF] — zone decisions must use the
    * engine's ordering or a shard could be pruned that the residual
    * filter would have kept rows from. */
  private[graft] def utf8Cmp(a: String, b: String): Int =
    bytesCmp(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Can any row of a shard with `ranges` satisfy a NUMERIC `p`?
    * (Unknown column → conservatively true, like the reference's
    * unprunable fallback. String/Or predicates need the full zone —
    * [[mayMatch(z:ShardZoneMap,p:RangePred)*]] — and are conservatively
    * true here.) */
  def mayMatch(ranges: Map[String, (Double, Double)], p: RangePred): Boolean =
    ranges.get(p.col).forall { case (lo, hi) =>
      p match {
        case Gt(_, v)          => hi > v
        case Ge(_, v)          => hi >= v
        case Lt(_, v)          => lo < v
        case Le(_, v)          => lo <= v
        case EqTo(_, v)        => lo <= v && v <= hi
        // single-value shard at exactly v -> no row differs; the empty
        // all-NULL interval (lo > hi) prunes too (<> is null-rejecting)
        case Neq(_, v)         => lo <= hi && !(lo == v && hi == v)
        case Between(_, l, h)  => hi >= l && lo <= h
        case NotNull(_)        => lo <= hi // empty interval = all NULL
        case _                 => true
      }
    }

  /** Can any row of shard `z` satisfy `p`, across all predicate kinds. */
  def mayMatch(z: ShardZoneMap, p: RangePred): Boolean = p match {
    case OrPred(branches) => branches.exists(_.forall(mayMatch(z, _)))
    case sp @ (_: SGt | _: SGe | _: SLt | _: SLe | _: SEq | _: SBetween |
               _: SNeq | _: SPrefix) =>
      z.strRanges.get(sp.col).forall { case (lo, hi) =>
        sp match {
          case SGt(_, v)         => utf8Cmp(hi, v) > 0
          case SGe(_, v)         => utf8Cmp(hi, v) >= 0
          case SLt(_, v)         => utf8Cmp(lo, v) < 0
          case SLe(_, v)         => utf8Cmp(lo, v) <= 0
          case SEq(_, v)         => utf8Cmp(lo, v) <= 0 && utf8Cmp(v, hi) <= 0
          case SBetween(_, l, h) => utf8Cmp(hi, l) >= 0 && utf8Cmp(lo, h) <= 0
          case SNeq(_, v) =>
            !(utf8Cmp(lo, v) == 0 && utf8Cmp(hi, v) == 0)
          // prefix range [p, nextPrefix(p)) WITHOUT constructing
          // nextPrefix — incrementing the last byte of a UTF-8 prefix
          // can produce an invalid sequence that cannot round-trip
          // through String. Byte-level intersection instead:
          //  - a string starting with p is >= p, so hi < p => none;
          //  - s >= lo implies s's first |p| bytes >= lo's first |p|
          //    bytes (unsigned lexicographic), so if lo's truncation
          //    already exceeds p, no s >= lo can start with p.
          case SPrefix(_, v) =>
            val pb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val lob = lo.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              .take(pb.length)
            utf8Cmp(hi, v) >= 0 && bytesCmp(lob, pb) <= 0
          case _                 => true
        }
      }
    case numeric => mayMatch(z.ranges, numeric)
  }

  /** Unsigned lexicographic compare of raw byte arrays. */
  private def bytesCmp(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Shards that could contain rows matching ALL predicates. */
  def prune(shards: Seq[ShardZoneMap], preds: Seq[RangePred]): Seq[ShardZoneMap] =
    shards.filter(s => preds.forall(mayMatch(s, _)))

  /** The exact decimal value of a native bound, for types whose values
    * may not render exactly as doubles (long/decimal). */
  private def exactBD(v: Any): Option[java.math.BigDecimal] = v match {
    case n: java.lang.Long    => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Integer => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Short   => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Byte    => Some(java.math.BigDecimal.valueOf(n.longValue))
    case bd: java.math.BigDecimal  => Some(bd)
    case bd: scala.math.BigDecimal => Some(bd.bigDecimal)
    case _ => None
  }

  /** Round an exact value OUTWARD to a double bound: a stored min must
    * never exceed the true min, a stored max never undercut the true max
    * (r14 verdict: min/max THROUGH `cast("double")` rounds-to-NEAREST,
    * so for |v| > 2^53 a stored bound could round INWARD and a strict
    * zone compare — `hi > v`, `lo < v` — wrongly pruned a shard that
    * contains matching rows; the reference never round-trips its typed
    * Scalar bounds through double, `PartitionPruner.cpp:23-51`).
    * `compareTo`, not equals: scale differences are not inexactness. */
  private[graft] def outward(bd: java.math.BigDecimal, isMin: Boolean): Double = {
    val d = bd.doubleValue()
    if (d == Double.PositiveInfinity) return if (isMin) Double.MaxValue else d
    if (d == Double.NegativeInfinity) return if (isMin) d else Double.MinValue
    val cmp = new java.math.BigDecimal(d).compareTo(bd)
    if (cmp == 0) d
    else if (isMin) { if (cmp > 0) Math.nextDown(d) else d }
    else { if (cmp < 0) Math.nextUp(d) else d }
  }

  /** Build zone maps for an existing table by file — one aggregation over
    * `input_file_name()`, the Spark-native way to generate the stats
    * sidecar (run once at ingest, persist next to the data).
    *
    * Bounds aggregate on an EXACT encoding of the NATIVE column type and
    * only then convert to double, rounded OUTWARD when inexact
    * ([[outward]]) — never through a round-to-nearest `cast("double")`.
    * Date columns encode as epoch DAYS and timestamps as epoch MICROS —
    * the same dimensions [[graft.plans.ModeExec.rangePreds]] encodes
    * date/timestamp literals in, so `WHERE d >= DATE '…'` prunes
    * date-sharded logs (the reference's zone maps carry typed date
    * bounds, `Partition.h:23-41`). */
  def build(df: DataFrame, columns: Seq[String]): Seq[ShardZoneMap] = {
    import org.apache.spark.sql.types._
    val dtypes = columns.map(c => c -> df.schema(c).dataType).toMap
    // string columns (UTF8_BINARY collation only — a non-binary collation
    // orders differently from [[utf8Cmp]] and must not produce bounds)
    def isStr(c: String): Boolean = dtypes(c) == StringType
    val (strCols, numCols) = columns.partition(isStr)
    def enc(c: String): Column = dtypes(c) match {
      case DateType      => unix_date(col(c)).cast("long")
      case TimestampType => unix_micros(col(c))
      case DoubleType | FloatType => col(c).cast("double")
      case _             => col(c)
    }
    val aggs = columns.flatMap(c =>
      Seq(min(enc(c)).as(s"min_$c"), max(enc(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        def bound(name: String, isMin: Boolean): Option[Double] =
          r.getAs[Any](name) match {
            case null => None
            // a NaN bound widens to the matching infinity: Spark orders
            // NaN ABOVE every value, so max() of a NaN-bearing column is
            // NaN and every strict zone compare against it (`hi > v`)
            // would be false — pruning a shard whose non-NaN rows match
            // (and whose NaN rows match every Gt/Ge under Spark's
            // ordering). The all-NULL case keeps the EMPTY interval; NaN
            // widens in the opposite, sound direction (r15 ADVICE).
            case d: java.lang.Double =>
              if (d.isNaN) Some(if (isMin) Double.NegativeInfinity
                                else Double.PositiveInfinity)
              else Some(d.doubleValue)
            case f: java.lang.Float =>
              if (f.isNaN) Some(if (isMin) Double.NegativeInfinity
                                else Double.PositiveInfinity)
              else Some(f.doubleValue)
            case other => Some(exactBD(other).map(outward(_, isMin)).getOrElse(
              sys.error(s"zone map: unencodable bound $other for $name")))
          }
        ShardZoneMap(
          r.getAs[String]("__file"),
          numCols.map { c =>
            (bound(s"min_$c", isMin = true), bound(s"max_$c", isMin = false)) match {
              case (Some(lo), Some(hi)) => c -> (lo, hi)
              // an all-NULL shard: no row can satisfy ANY extracted range
              // predicate (comparisons are null-rejecting; the residual
              // keeps IS NULL semantics), so the EMPTY interval — which
              // every mayMatch arm rejects — prunes it soundly
              case _ => c -> (Double.PositiveInfinity, Double.NegativeInfinity)
            }
          }.toMap,
          strCols.flatMap { c =>
            (Option(r.getAs[String](s"min_$c")),
             Option(r.getAs[String](s"max_$c"))) match {
              case (Some(lo), Some(hi)) => Some(c -> (lo, hi))
              case _ => None // all-NULL string shard: kept conservatively
            }
          }.toMap)
      }.toSeq
  }

  // ---- persisted sidecar -------------------------------------------------

  /** The sidecar file name, underscore-prefixed so Spark's file index
    * (and graft's own listings) skip it as a data file — the reference
    * keeps exactly this artifact next to its data (`zoneMap.json`
    * referenced from the catalogue's Partition metadata,
    * `Partition.h:23-41`). Line format, one shard per line after a
    * version header: `fileName<TAB>col=min,max<TAB>col=min,max…` —
    * file NAMES are relative so the table directory can move. String
    * bounds (r16) serialize as `col=s64:<base64(min)>,<base64(max)>`
    * (base64 of the UTF-8 bytes — a raw string value could contain the
    * format's own tab/comma/equals delimiters); a sidecar carrying any
    * string bound is versioned `v=2`, so an OLDER reader rejects the
    * whole file and falls back to the unrouted read (sound) instead of
    * misparsing, while numeric-only sidecars stay `v=1` byte-compatible. */
  val SidecarName = "_graft_zonemap"

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Persist `zones` as `dir/_graft_zonemap` (tmp + rename — a reader
    * never sees a torn file). Paths in `zones` may be absolute; only
    * their file names are stored. */
  def writeSidecar(s: SparkSession, dir: String,
      zones: Seq[ShardZoneMap]): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    // the format stores file NAMES: refuse a file that is not a DIRECT
    // child of the table root (r17, the bloom sidecar's r16 ADVICE
    // applied here too) — on a nested layout with repeated part-file
    // basenames the name-set gate collapses duplicates and
    // `Path(root, name)` resolves to the wrong (or no) file
    val rootUri = root.toUri.getPath.stripSuffix("/")
    zones.foreach { z =>
      val parent = new org.apache.hadoop.fs.Path(z.path).getParent
      require(parent != null && parent.toUri.getPath == rootUri,
        s"writeSidecar: ${z.path} is not a direct child of $dir")
    }
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".${SidecarName}.tmp.${System.nanoTime}")
    val target = new org.apache.hadoop.fs.Path(root, SidecarName)
    val version = if (zones.exists(_.strRanges.nonEmpty)) "v=2" else "v=1"
    val text = new StringBuilder(version).append('\n')
    zones.sortBy(_.path).foreach { z =>
      val name = new org.apache.hadoop.fs.Path(z.path).getName
      val cols = z.ranges.toSeq.sortBy(_._1)
        .map { case (c, (lo, hi)) => s"$c=$lo,$hi" } ++
        z.strRanges.toSeq.sortBy(_._1)
          .map { case (c, (lo, hi)) => s"$c=s64:${b64(lo)},${b64(hi)}" }
      text.append((name +: cols).mkString("\t")).append('\n')
    }
    val out = fs.create(tmp, true)
    try out.write(text.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      sys.error(s"could not publish zone-map sidecar $target")
  }

  /** Load `dir/_graft_zonemap` if present, file names resolved back to
    * absolute paths under `dir`. A malformed sidecar returns None (the
    * caller falls back to an unrouted/unpruned read — pruning is an
    * optimization, never a correctness input). */
  def readSidecar(s: SparkSession, dir: String): Option[Seq[ShardZoneMap]] =
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
      if (!lines.headOption.exists(h => h == "v=1" || h == "v=2")) return None
      // bounds parse with OUTWARD rounding: graft's own writer emits
      // shortest-round-trip doubles (exact either way), but a sidecar
      // written by another tool can carry decimal strings strictly
      // between adjacent doubles — nearest-rounding there could pull a
      // min up / a max down, the parse-time face of the build-side
      // hazard [[outward]] exists for. Non-decimal renderings
      // (Infinity) keep the plain parse; a parsed NaN widens to the
      // matching infinity like [[build]]'s bound() does — a NaN bound
      // fails every strict zone compare and would prune NaN-bearing
      // shards whose rows match (r15 ADVICE).
      def parseBound(s0: String, isMin: Boolean): Double = {
        val d = try outward(new java.math.BigDecimal(s0.trim), isMin)
                catch { case _: NumberFormatException => s0.trim.toDouble }
        if (d.isNaN) { if (isMin) Double.NegativeInfinity
                       else Double.PositiveInfinity }
        else d
      }
      Some(lines.drop(1).filter(_.nonEmpty).map { line =>
        val parts = line.split('\t')
        val (strKvs, numKvs) = parts.tail.partition(kv =>
          kv.substring(kv.indexOf('=') + 1).startsWith("s64:"))
        val ranges = numKvs.map { kv =>
          val i = kv.indexOf('=')
          val Array(lo, hi) = kv.substring(i + 1).split(',')
          kv.substring(0, i) -> ((parseBound(lo, isMin = true),
            parseBound(hi, isMin = false)))
        }.toMap
        val strRanges = strKvs.map { kv =>
          val i = kv.indexOf('=')
          // limit -1: an empty-string bound base64-encodes to "" and a
          // default split would drop the trailing empty token
          val Array(lo, hi) = kv.substring(i + 1 + "s64:".length).split(",", -1)
          kv.substring(0, i) -> ((unb64(lo), unb64(hi)))
        }.toMap
        ShardZoneMap(new org.apache.hadoop.fs.Path(root, parts.head).toString,
          ranges, strRanges)
      })
    } catch { case e: Exception =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"ignoring unreadable zone-map sidecar under $dir: ${e.getMessage}")
      None
    }

  // ---- sidecar lifecycle (r15, r14 verdict item 5) ----------------------

  private val driftN = new java.util.concurrent.atomic.AtomicLong(0)

  /** Times a routed-leaf detector found a sidecar that DISAGREES with
    * its directory's file set (leaf left unrouted — correct, but the
    * table silently loses per-shard routing until a rebuild). */
  def driftCount: Long = driftN.get

  /** Record one sidecar-drift observation (called by the conf-route
    * detector). Deliberately loud: drift is an operational condition an
    * operator fixes with [[rebuildSidecar]], not a steady state. */
  private[graft] def noteDrift(dir: String, relFiles: Set[String],
      zoneNames: Set[String], kind: String = "zone-map",
      repair: String = "ZoneMapPruner.rebuildSidecar",
      consequence: String = "leaf left unrouted"): Unit = {
    driftN.incrementAndGet()
    val missing = (zoneNames -- relFiles).take(3)
    val extra = (relFiles -- zoneNames).take(3)
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"$kind sidecar under $dir has DRIFTED from the directory " +
      s"(sidecar-only: ${missing.mkString(",")}; dir-only: " +
      s"${extra.mkString(",")}): $consequence — rebuild with " + repair)
  }

  /** Rebuild `dir`'s sidecar from the data files currently on disk —
    * ONE distributed aggregation pass ([[build]]) published tmp+rename
    * like [[writeSidecar]], then the writer-invalidation hooks (the
    * same pair [[Sink.compact]] calls after its swap) so cached
    * listings and Spark's own file-status/CacheManager state see the
    * new shard set. `template`'s format/schema/options describe how to
    * parse the shards; its paths are ignored — the DIRECTORY is listed
    * fresh (underscore/dot names skipped), because a drifted sidecar is
    * exactly the state where any cached path set is wrong. */
  def rebuildSidecar(s: SparkSession, dir: String, template: TableSpec,
      columns: Seq[String]): Seq[ShardZoneMap] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"rebuildSidecar: no data files under $dir")
    val zones = build(Catalog.read(s, template.copy(paths = files)), columns)
    writeSidecar(s, dir, zones)
    graft.cache.HybridScan.invalidateListings(dir)
    s.catalog.refreshByPath(dir)
    zones
  }

  /** Read only the shards surviving pruning, then apply the full filter
    * (zone maps overapproximate; the residual predicate still runs). */
  def readPruned(
      spark: SparkSession,
      spec: TableSpec,
      shards: Seq[ShardZoneMap],
      preds: Seq[RangePred],
      residual: Option[Column] = None): DataFrame = {
    val keep = prune(shards, preds).map(_.path)
    val df =
      if (keep.isEmpty) Catalog.read(spark, spec).limit(0) // all pruned
      else Catalog.read(spark, spec.copy(paths = keep))
    residual.map(df.filter).getOrElse(df)
  }

  // ---- end-to-end demonstration entry ------------------------------------

  /** Ingest-once cache: `orders` materialized as 8 range-sharded CSV files
    * (the reference's `T.csv.0 … T.csv.N` sharded layout, `README.md:57-59`)
    * with zone maps built at write time — the sidecar a 100 TB ingest job
    * would persist next to the data. Range sharding by key gives each
    * shard a tight (min,max), the date-partitioned-logs shape pruning
    * exists for. */
  // bounded per-(session, dir) cache of the parsed spec + sidecar; the
  // FILES follow the Fixtures write-once discipline — the old
  // mode("overwrite") into a dir-keyed /tmp path meant a SECOND session
  // on the same dir deleted the first session's part-files out from
  // under its cached TableSpec paths (server mode runs many sessions)
  private val shardCache =
    new graft.util.SessionCache[(TableSpec, Seq[ShardZoneMap])]()

  private[graft] def shardedOrders(s: SparkSession, dir: String): (TableSpec, Seq[ShardZoneMap]) =
    shardedOrdersN(s, dir, 8, "orders_zonemap_csv")

  /** [[shardedOrders]] at a caller-chosen shard count — the bench's
    * shard-router block uses 16 shards so zone pruning has a realistic
    * keep-ratio to demonstrate (2/16 ≈ the date-partitioned-logs
    * shape). Fixture name carries the count (write-once discipline). */
  private[graft] def shardedOrdersN(s: SparkSession, dir: String,
      nShards: Int, fixtureName: String): (TableSpec, Seq[ShardZoneMap]) =
    shardCache.getOrBuild(s, s"$dir#zonemap-$fixtureName") {
      val out = Fixtures.ensure(s, Fixtures.path(dir, fixtureName)) {
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
          .repartitionByRange(nShards, col("o_orderkey"))
          .write.mode("overwrite")
          .option("delimiter", "|").option("header", "false")
          .csv(Fixtures.path(dir, fixtureName))
      }
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
        .map(_.getPath.toString).sorted.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType)))
      val spec = TableSpec("orders_csv", "csv", files, Some(schema), "|")
      val zones = build(Catalog.read(s, spec), Seq("o_orderkey"))
      // publish the sidecar next to the data (write-once like the files
      // themselves): the conf-mode rewriter detects it and routes the
      // DIRECTORY per shard (r14) — the reference's zoneMap.json lives
      // exactly there, referenced from the catalogue
      val sidecar = new org.apache.hadoop.fs.Path(out, SidecarName)
      if (!fs.exists(sidecar)) writeSidecar(s, out.toString, zones)
      (spec, zones)
    }

  /** DATE-sharded orders: 8 range shards by `o_orderdate` (cast to
    * DATE) with the date-typed zone sidecar built at write — THE
    * canonical log-pruning shape (the reference's TPC-H zone maps carry
    * `o_orderdate` bounds in its Partition metadata,
    * `fpdb-catalogue/include/fpdb/catalogue/Partition.h:23-41`). Bounds
    * encode as epoch days ([[build]]); [[graft.plans.ModeExec
    * .rangePreds]] encodes date literals the same way, so a plain
    * `WHERE o_orderdate >= DATE '…'` prunes shards through the conf
    * route. */
  private[graft] def dateShardedOrders(s: SparkSession, dir: String)
      : (TableSpec, Seq[ShardZoneMap]) =
    shardCache.getOrBuild(s, s"$dir#zonemap-orders-datezone") {
      val name = "orders_datezone_csv"
      val out = Fixtures.ensure(s, Fixtures.path(dir, name)) {
        Tables.orders(s, dir)
          .select(col("o_orderdate").cast("date").as("o_orderdate"),
            col("o_orderstatus"), col("o_totalprice"))
          .repartitionByRange(8, col("o_orderdate"))
          .write.mode("overwrite")
          .option("delimiter", "|").option("header", "false")
          .csv(Fixtures.path(dir, name))
      }
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
        .map(_.getPath.toString).sorted.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderdate", org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
      val spec = TableSpec("orders_datezone", "csv", files, Some(schema), "|")
      val zones = build(Catalog.read(s, spec), Seq("o_orderdate"))
      val sidecar = new org.apache.hadoop.fs.Path(out, SidecarName)
      if (!fs.exists(sidecar)) writeSidecar(s, out, zones)
      (spec, zones)
    }

  /** Run `body` with `spark.graft.scanMode` set (restored after) — the
    * conf-route bracket every z-entry repeats (r16 review: 5 hand-rolled
    * copies in this file drifted one fix away from divergence). */
  private def withScanMode[A](s: SparkSession, mode: String)(body: => A): A = {
    val prev = s.conf.getOption("spark.graft.scanMode")
    s.conf.set("spark.graft.scanMode", mode)
    try body
    finally prev match {
      case Some(v) => s.conf.set("spark.graft.scanMode", v)
      case None    => s.conf.unset("spark.graft.scanMode")
    }
  }

  /** Shared builder for STRING-keyed range-sharded orders fixtures: 6
    * CSV shards on (keyCol, o_orderkey), zone sidecar carrying BOTH
    * bound kinds (string bounds for the shard key, numeric for the
    * tiebreaker - one v=2 sidecar). */
  private def stringShardedOrders(s: SparkSession, dir: String,
      fixtureName: String, keyCol: String, otherStr: String)
      : (TableSpec, Seq[ShardZoneMap]) =
    shardCache.getOrBuild(s, s"$dir#zonemap-$fixtureName") {
      val out = Fixtures.ensure(s, Fixtures.path(dir, fixtureName)) {
        Tables.orders(s, dir)
          .select(col(keyCol), col(otherStr),
            col("o_orderkey"), col("o_totalprice"))
          .repartitionByRange(6, col(keyCol), col("o_orderkey"))
          .write.mode("overwrite")
          .option("delimiter", "|").option("header", "false")
          .csv(Fixtures.path(dir, fixtureName))
      }
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
        .map(_.getPath.toString).sorted.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(otherStr, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
      val spec = TableSpec(fixtureName.stripSuffix("_csv"), "csv", files,
        Some(schema), "|")
      val zones = build(Catalog.read(s, spec), Seq(keyCol, "o_orderkey"))
      val sidecar = new org.apache.hadoop.fs.Path(out, SidecarName)
      if (!fs.exists(sidecar)) writeSidecar(s, out, zones)
      (spec, zones)
    }

  /** STATUS-sharded orders (r16): range shards by the STRING key
    * (o_orderstatus, tie-broken by o_orderkey) with string-typed zone
    * bounds in the sidecar — the reference prunes on typed Scalars
    * including strings (`litToScalar` converts `StringLiteral`,
    * `fpdb-executor/src/physical/prune/PartitionPruner.cpp:100-104`);
    * status/category/country columns are the common string shard keys
    * this shape stands in for. */
  private[graft] def statusShardedOrders(s: SparkSession, dir: String)
      : (TableSpec, Seq[ShardZoneMap]) =
    stringShardedOrders(s, dir, "orders_statuszone_csv",
      keyCol = "o_orderstatus", otherStr = "o_orderpriority")

  /** PRIORITY-sharded orders (r16): the [[statusShardedOrders]] shape
    * keyed by the MULTI-character string column, for prefix-predicate
    * pruning (`LIKE '1-%'` — the category-prefix scan shape). */
  private[graft] def priorityShardedOrders(s: SparkSession, dir: String)
      : (TableSpec, Seq[ShardZoneMap]) =
    stringShardedOrders(s, dir, "orders_priorityzone_csv",
      keyCol = "o_orderpriority", otherStr = "o_orderstatus")

  /** JSONL-sharded orders (r15): same shape as [[shardedOrders]] in the
    * line-JSON format, for the widened sharded-leaf conf route. */
  private[graft] def shardedOrdersJsonl(s: SparkSession, dir: String)
      : (TableSpec, Seq[ShardZoneMap]) =
    shardCache.getOrBuild(s, s"$dir#zonemap-orders-jsonl") {
      val name = "orders_zonemap_jsonl"
      val out = Fixtures.ensure(s, Fixtures.path(dir, name)) {
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite")
          .json(Fixtures.path(dir, name))
      }
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(out, "part-*"))
        .map(_.getPath.toString).sorted.toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType)))
      val spec = TableSpec("orders_jsonl", "json", files, Some(schema))
      val zones = build(Catalog.read(s, spec), Seq("o_orderkey"))
      val sidecar = new org.apache.hadoop.fs.Path(out, SidecarName)
      if (!fs.exists(sidecar)) writeSidecar(s, out, zones)
      (spec, zones)
    }

  /** z01 — the reference's CSV partition-pruning story end-to-end
    * (`fpdb-executor/src/physical/prune/PartitionPruner.cpp:23-51`): a
    * key-range predicate against the sharded CSV table drops shards at
    * plan time via their zone maps (7 of 8 at sf0.01 — `SourcesSpec`
    * asserts the scanned-file count), the residual filter handles the
    * overapproximation, and the result must equal DuckDB running the same
    * predicate over the parquet original. */
  private def z01ZoneMapPrune(s: SparkSession, dir: String): DataFrame = {
    val (spec, zones) = shardedOrders(s, dir)
    readPruned(s, spec, zones,
      Seq(Le("o_orderkey", 1000.0)),
      residual = Some(col("o_orderkey") <= 1000L))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), Tables.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val z01Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderkey <= 1000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** z06 (r14) — zone-map pruning COMPOSED with the per-shard cache
    * router: the reference's `SegmentKey` third component is the RANGE
    * (`fpdb-cache/include/fpdb/cache/SegmentKey.h`), i.e. per-shard
    * caching over a flat sharded layout, and its PartitionPruner drops
    * zone-pruned partitions before the cache tier ever sees them
    * (`PartitionPruner.cpp:23-51`). Two heating passes over the low-key
    * window walk the per-SHARD admission ladder (plan-time leases, the
    * dm13 discipline); the reported query spans a wider key range, so
    * hot shards serve cache-side while cold ones ride one multi-path
    * scan. Shared session cache may be warm or cold on any driver call;
    * rows are route-independent (the entry contract). Oracle = the same
    * predicate over the parquet original. */
  private def z06ShardedRoute(s: SparkSession, dir: String): DataFrame = {
    import graft.cache.HybridScan
    val (spec, zones) = shardedOrders(s, dir)
    val r = new HybridScan.AdaptiveScanRouter(
      HybridScan.segmentCache(s, dir), pushdownSlots = 8)
    val cols = Seq("o_orderstatus", "o_totalprice")
    def lease(hi: Long) = r.scanShardedMode(s, spec, "orders_sharded", zones,
      Seq(Le("o_orderkey", hi.toDouble)), cols,
      col("o_orderkey") <= hi, HybridScan.ModeHybrid,
      leaseSpansExecution = false)
    (1 to 2).foreach(_ => lease(1000L).close())
    val l = lease(3000L)
    l.close() // plan-time lease; the driver executes the lazy frame later
    l.df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Tables.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val z06Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderkey <= 3000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** z07 (r15) — DATE-typed zone pruning through the conf route
    * (r14 verdict "what's missing" 1): a plain view over the
    * date-sharded CSV directory + `SET scanMode=hybrid`; the date-range
    * predicate's literals encode as epoch days and prune shards against
    * the sidecar's epoch-day bounds (shard count spec-pinned in
    * ShardRouterSpec). The oracle runs the equivalent timestamp range
    * over the parquet ORIGINAL — `CAST(ts AS DATE) >= D` ⇔ `ts >= D
    * 00:00:00`, so format, layout, and routing change bytes, never
    * rows. */
  private def z07DateZonePrune(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = dateShardedOrders(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_datezone_csv")
    val sql =
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_datezone_csv
        |WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1999-01-01'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    withScanMode(s, "hybrid") {
      (1 to 2).foreach(_ => graft.Engine.executeQuery(s, dir, sql))
      graft.Engine.executeQuery(s, dir, sql)
    }
  }

  private val z07Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** z08 (r15) — IN-list zone pruning through the conf route: the
    * extractor folds `o_orderkey IN (…)` into its sound Between
    * envelope ([[graft.plans.ModeExec.rangePreds]]), so a point-lookup
    * list over the range-sharded table reads only the shards the
    * envelope spans (gaps ride the residual filter — pruning only ever
    * overapproximates). Oracle = the same IN over the parquet
    * original. */
  private def z08InZonemap(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = shardedOrders(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_sharded_csv_in")
    val sql =
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_sharded_csv_in
        |WHERE o_orderkey IN (5, 12, 700, 850)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    withScanMode(s, "hybrid")(graft.Engine.executeQuery(s, dir, sql))
  }

  private val z08Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderkey IN (5, 12, 700, 850)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** z09 (r16) — STRING-typed zone pruning through the conf route
    * (r15 verdict "what's missing" 1): a plain view over the
    * status-sharded CSV directory + `SET scanMode=hybrid`; the string
    * equality extracts as an [[SEq]] against the sidecar's UTF-8-ordered
    * string bounds, so only the shards whose (min,max) status interval
    * contains 'F' are read (shard count spec-pinned in ShardRouterSpec).
    * Oracle = the same predicate over the parquet ORIGINAL. */
  private def z09StringZonemap(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = statusShardedOrders(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_statuszone_csv")
    val sql =
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_statuszone_csv
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    withScanMode(s, "hybrid")(graft.Engine.executeQuery(s, dir, sql))
  }

  private val z09Sql =
    """SELECT o_orderpriority, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** z10 (r16) — DISJUNCTIVE (OR-tree) zone pruning through the conf
    * route (r15 verdict "what's missing" 2): `k < lo OR k > hi` extracts
    * as an [[OrPred]] whose branches each carry a sound envelope; a
    * shard survives iff SOME branch may match, so the middle shards of
    * the range-sharded layout are dropped — the reference's pruner
    * recurses through OR exactly this way
    * (`fpdb-executor/src/physical/prune/PartitionPruner.cpp:70-88`).
    * Oracle = the same disjunction over the parquet ORIGINAL. */
  private def z10OrZonemap(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = shardedOrders(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_sharded_csv_or")
    val sql =
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_sharded_csv_or
        |WHERE o_orderkey < 700 OR o_orderkey > 13000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    withScanMode(s, "hybrid")(graft.Engine.executeQuery(s, dir, sql))
  }

  private val z10Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderkey < 700 OR o_orderkey > 13000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** z11 (r16) — PREFIX pruning through the conf route: `LIKE '1-%'`
    * simplifies to StartsWith, extracts as [[SPrefix]], and prunes the
    * priority-sharded layout to the shards whose string interval
    * intersects the prefix range (byte-level test — see the mayMatch
    * arm). The category-prefix scan shape over a string shard key.
    * Oracle = the same LIKE over the parquet original. */
  private def z11PrefixZonemap(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = priorityShardedOrders(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_priorityzone_csv")
    val sql =
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_priorityzone_csv
        |WHERE o_orderpriority LIKE '1-%'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    withScanMode(s, "hybrid")(graft.Engine.executeQuery(s, dir, sql))
  }

  private val z11Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderpriority LIKE '1-%'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** z12 (r16) — NOT-EQUAL pruning through the conf route: on a
    * status-sharded layout most shards hold a SINGLE key value, so
    * `o_orderstatus <> 'F'` drops the F-only shards via [[SNeq]] (a
    * shard whose string interval is exactly the excluded value can
    * contain no matching row). Oracle = the same predicate over the
    * parquet original. */
  private def z12NeqZonemap(s: SparkSession, dir: String): DataFrame = {
    val (spec, _) = statusShardedOrders(s, dir)
    val root = new org.apache.hadoop.fs.Path(spec.paths.head).getParent.toString
    s.read.schema(spec.schema.get).option("delimiter", "|").csv(root)
      .createOrReplaceTempView("orders_statuszone_csv_neq")
    val sql =
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
        |FROM orders_statuszone_csv_neq
        |WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    withScanMode(s, "hybrid")(graft.Engine.executeQuery(s, dir, sql))
  }

  private val z12Sql =
    """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
      |FROM orders WHERE o_orderstatus <> 'F'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z01_zonemap_prune" -> z01ZoneMapPrune _,
    "z06_sharded_route" -> z06ShardedRoute _,
    "z07_date_zonemap"  -> z07DateZonePrune _,
    "z08_in_zonemap"    -> z08InZonemap _,
    "z09_string_zonemap" -> z09StringZonemap _,
    "z10_or_zonemap"    -> z10OrZonemap _,
    "z11_prefix_zonemap" -> z11PrefixZonemap _,
    "z12_neq_zonemap"   -> z12NeqZonemap _,
  )

  val oracleSql: Map[String, String] = Map(
    "z01_zonemap_prune" -> z01Sql,
    "z06_sharded_route" -> z06Sql,
    "z07_date_zonemap"  -> z07Sql,
    "z08_in_zonemap"    -> z08Sql,
    "z09_string_zonemap" -> z09Sql,
    "z10_or_zonemap"    -> z10Sql,
    "z11_prefix_zonemap" -> z11Sql,
    "z12_neq_zonemap"   -> z12Sql,
  )
}
