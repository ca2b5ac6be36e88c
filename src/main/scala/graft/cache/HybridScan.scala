package graft.cache

import java.util.concurrent.Semaphore
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.SessionCache

/** Hybrid cache/storage execution — the reference's signature feature,
  * previously the two accepted-out-of-scope inventory rows, now closed:
  *
  *  - '''MergePOp''' (`fpdb-executor/src/physical/merge/MergeKernel.cpp:10-57`):
  *    a query whose cached segments cover only SOME of its columns serves
  *    the resident columns from the cache, fetches the missing columns
  *    from storage (predicate pushed down there), and zips the two column
  *    sets back into rows. The reference zips positionally because its
  *    segments are per-partition byte ranges; Spark has no per-column
  *    block assembly, so the zip is re-expressed as an equi-join on an
  *    explicit row ordinal — `(file id, row index)` from the parquet
  *    scan's `_metadata` — which is positionally exact (the ordinal is
  *    unique per row and identical on both sides by construction) and
  *    stays in whole-stage codegen.
  *  - '''AdaptPushdownManager'''
  *    (`fpdb-store-server/src/flight/AdaptPushdownManager.cpp:24-60`): the
  *    store admits a bounded number of concurrent pushdown requests; when
  *    saturated, a request falls back to pullup (compute-side filtering
  *    over cached/raw bytes). [[AdaptiveScanRouter]] reproduces that
  *    admission contract with a slot semaphore over two routes that are
  *    result-identical by construction.
  *
  * Scale notes (the 100 TB story, measured in HybridScanSpec):
  *  - the storage fetch reads ONLY the missing columns (`ReadSchema`) and
  *    pushes the predicate into the scan (`PushedFilters`) — the bytes
  *    that leave storage are the reference's pushdown bytes, not the row;
  *  - with a selective predicate the fetched side is small → Spark
  *    broadcasts it and ZERO cached bytes move (the zip is a broadcast
  *    hash join probe over the resident segment);
  *  - with a non-selective predicate the zip is a shuffled join on the
  *    ordinal; the segment is persisted pre-partitioned by the ordinal
  *    key, so only the thin fetched side pays an Exchange — the wide
  *    cached columns never re-shuffle (spec-asserted plan shape).
  */
object HybridScan {

  /** Ordinal column names — prefixed to stay clear of user schemas. */
  val FileCol = "_seg_file"
  val PosCol  = "_seg_pos"

  /** One shared segment cache per (session, sf-dir); released (unpersist
    * of every resident segment) at the bench's family boundaries via the
    * [[graft.util.SessionCache]] lifecycle like every other artifact. */
  private val caches = new SessionCache[SegmentCache](
    maxEntries = 4, releaseValue = (_: SegmentCache).invalidateAll())

  def segmentCache(s: SparkSession, dir: String): SegmentCache =
    caches.getOrBuild(s, s"hybrid-cache:$dir")(
      new SegmentCache(capacityBytes = 1L << 30, policy = LRU))

  /** Scan `cols` of a table with the `(file id, row index)` ordinal
    * prepended. File ids are assigned by sorting the table's file list —
    * deterministic across the cached and fetched sides of one table, so
    * equal ordinals mean THE SAME physical row. The id map is keyed by
    * FULL path under both URI renderings (`DataFrame.inputFiles` prints
    * `file:///x`, `_metadata.file_path` prints `file:/x` — measured), so
    * the per-row work is one hash-map probe on a column the reader fills
    * as a per-split constant; the earlier per-row `regexp_extract` was
    * measured as the dominant multi-file zip cost (8.6 → 1.8 s at 16×
    * sf0.1). An unmapped path fails the query loudly rather than
    * mis-zipping.
    *
    * At cluster scale the id map is a few thousand literal entries (one
    * per file) evaluated inside codegen — no shuffle, no driver loop past
    * the listing Spark already performs for the scan itself.
    */
  def ordinalScan(s: SparkSession, dir: String, table: String,
      cols: Seq[String]): DataFrame = {
    val df = s.read.parquet(Tables.path(dir, table))
    val files = df.inputFiles.sorted
    val fileId: Column =
      if (files.length == 1) lit(0) // single-file table: no per-row path work
      else {
        // two rendering variants per file, one id — lookup stays a single
        // element_at on the raw metadata column
        val entries = files.zipWithIndex.flatMap { case (f, i) =>
          val variants = Seq(f, f.replaceFirst("^([A-Za-z][A-Za-z0-9+.-]*):///", "$1:/")).distinct
          variants.flatMap(v => Seq(lit(v), lit(i)))
        }
        val mapped = element_at(map(entries.toSeq: _*), col("_metadata.file_path"))
        when(mapped.isNull,
          raise_error(concat(lit(s"ordinalScan($table): unmapped file "),
            col("_metadata.file_path"))))
          .otherwise(mapped)
      }
    df.select(
      fileId.as(FileCol) +:
      col("_metadata.row_index").as(PosCol) +:
      cols.map(col): _*)
  }

  /** MergeKernel: rows = cache-resident columns ⋈ ordinal-zipped storage
    * fetch of the missing columns, predicate pushed into the fetch scan.
    *
    * The segment enters the cache pre-partitioned by the ordinal key so
    * the zip never re-shuffles the cached bytes: Spark's
    * `EnsureRequirements` accepts the persisted plan's `HashPartitioning`
    * on exactly the join key, so only the fetched side exchanges (or
    * broadcasts, when the pushdown predicate made it small).
    */
  /** Fingerprint of a table's file listing. File ids are POSITIONS in
    * the sorted listing, so any layout change — compaction, a new part
    * file, a rewrite — reassigns them; a segment built under the old
    * listing would then zip WRONG rows against a fresh fetch side with
    * no error raised (worse than staleness: silent corruption). The
    * fingerprint goes into the segment key, so a layout change turns
    * the resident segment into a cache miss instead. The listing is the
    * same one the scan itself needs, so this adds no IO class. */
  def listingFingerprint(s: SparkSession, dir: String, table: String): String = {
    val files = s.read.parquet(Tables.path(dir, table)).inputFiles.sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(files.mkString("\n").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(8)
  }

  /** Cache key for an ordinal-carrying segment: the ordinals ARE columns
    * of the cached frame, so they belong in the key — a key must describe
    * exactly what a race-rebuild has to produce — and the table name
    * carries the listing fingerprint (see [[listingFingerprint]]). */
  def ordinalKey(table: String, fingerprint: String,
      cachedCols: Seq[String]): SegmentKey =
    SegmentKey(s"$table@$fingerprint", Seq(FileCol, PosCol) ++ cachedCols)

  def mergedScan(s: SparkSession, dir: String, table: String,
      cachedCols: Seq[String], fetchCols: Seq[String],
      fetchPredicate: Option[Column] = None,
      cache: SegmentCache): DataFrame = {
    val seg = cache.get(ordinalKey(table, listingFingerprint(s, dir, table), cachedCols)) {
      // partition by row index ALONE: a subset of the zip's join keys
      // always satisfies its ClusteredDistribution, while including the
      // file id would break the single-file case (the literal 0 constant-
      // folds out of the join keys, and hash(0, pos) is then NOT a subset
      // of {pos} — the cached side would re-shuffle, spec-caught)
      // ...then pre-SORT by (pos, file): the join keys are declared in
      // that order below, so the persisted ordering satisfies the merge
      // join's requiredOrdering exactly — and in the single-file case,
      // where the folded file id leaves {pos} as the sole key, as its
      // prefix. The wide cached columns pay neither an exchange NOR a
      // sort at query time (spec-pinned).
      ordinalScan(s, dir, table, cachedCols)
        .repartition(col(PosCol))
        .sortWithinPartitions(col(PosCol), col(FileCol))
    }
    val fetched0 = ordinalScan(s, dir, table, fetchCols)
    val fetched = fetchPredicate.fold(fetched0)(fetched0.filter)
    // Zip strategy by the planner's own size logic: a fetch side under
    // the broadcast threshold broadcasts (zero cached bytes move); above
    // it, hint a shuffled-HASH join — the ordinal key is unique, so the
    // sort-merge machinery buys nothing, and SHJ needs only distribution
    // (which the persisted segment already satisfies): no exchange AND no
    // sort on the cached side, one hash build over the thin fetch side
    // (measured 1.8 → 0.9 s on the 16× replicated Q6 merge).
    val threshold = s.sessionState.conf.autoBroadcastJoinThreshold
    val fetchBytes = fetched.queryExecution.optimizedPlan.stats.sizeInBytes
    val zipSide =
      if (fetchBytes > BigInt(threshold)) fetched.hint("shuffle_hash") else fetched
    seg.join(zipSide, Seq(PosCol, FileCol)).drop(FileCol, PosCol)
  }

  /** Partition-granular hybrid — the OTHER axis of the reference's
    * per-partition Mode wiring (`PrePToS3PTransformer.cpp:308-460`: each
    * partition independently CACHING or PUSHDOWN): partitions inside
    * `cachedRegion` are served from a cache-resident segment; every
    * other partition scans storage, where BOTH levers fire — partition
    * pruning drops the cached directories at listing time (the negated
    * region predicate is partition-column-only) and the query predicate
    * pushes into the surviving files. Partitions are disjoint, so the
    * row union is exact by construction.
    *
    * `segmentName` keys the resident region in the cache (a path + region
    * digest works; it only has to be stable per (table, region)).
    */
  def partitionHybridScan(s: SparkSession, path: String, cols: Seq[String],
      cachedRegion: Column, segmentName: String,
      predicate: Column, cache: SegmentCache): DataFrame = {
    val seg = cache.get(SegmentKey(segmentName, cols)) {
      s.read.parquet(path).filter(cachedRegion).select(cols.map(col): _*)
    }
    val rest = s.read.parquet(path)
      .filter(!cachedRegion).filter(predicate)
      .select(cols.map(col): _*)
    seg.filter(predicate).unionByName(rest)
  }

  // ---------------------------------------------------------------- router

  sealed trait Route
  /** Filter executes at storage (PushedFilters); only matching bytes move. */
  case object Pushdown extends Route
  /** Storage saturated: raw columns come from the segment cache (loaded
    * once, unfiltered) and the filter runs compute-side — the reference's
    * pullup fallback. */
  case object Pullup extends Route
  /** Every requested column is resident — no storage request at all. The
    * reference's pure cache hit, preferred unconditionally (even a free
    * pushdown slot can't beat not touching storage). */
  case object CacheOnly extends Route
  /** Some requested columns are resident: serve those from the cache,
    * fetch only the missing ones (predicate pushed when it references
    * only fetched columns), zip by ordinal — the hybrid plan that gives
    * the reference system its name. */
  case object Hybrid extends Route

  /** Column names a (possibly unresolved) predicate mentions — drives the
    * hybrid route's push-vs-post filter placement. */
  private def referencedCols(c: Column): Set[String] =
    org.apache.spark.sql.GraftBridge.expression(c).collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.nameParts.last
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
    }.toSet

  /** Bounded-admission pushdown, result-identical on every route.
    *
    * `pushdownSlots` is the store's concurrent-request budget. Admission
    * is decided at request time, like the reference's manager:
    * [[scan]] is plan-time (binary slot check — a lazy DataFrame cannot
    * hold a slot), while [[execute]] brackets a caller's action so the
    * slot spans the pushdown's real lifetime AND applies the reference's
    * full rule — a saturated request queues when estimated wait (queue
    * depth × measured pushdown-service EWMA) still beats the weighted
    * pullup estimate, and falls back past that point.
    */
  final class AdaptiveScanRouter(cache: SegmentCache, pushdownSlots: Int,
      initialPushdownEstNanos: Double = 0.0,
      initialPullupEstNanos: Double = 0.0,
      pullupWeight: Double = 1.0) {
    private val slots = new Semaphore(pushdownSlots)
    private val pushdownN  = new AtomicLong(0)
    private val pullupN    = new AtomicLong(0)
    private val cacheOnlyN = new AtomicLong(0)
    private val hybridN    = new AtomicLong(0)

    def pushdowns: Long = pushdownN.get
    def pullups: Long   = pullupN.get
    def cacheOnlys: Long = cacheOnlyN.get
    def hybrids: Long   = hybridN.get
    def availableSlots: Int = slots.availablePermits()

    private def dataCols(k: SegmentKey): Seq[String] =
      k.columns.filterNot(c => c == FileCol || c == PosCol)

    /** Build the scan on the best route the cache contents and the
      * store's admission state allow, preference-ordered exactly like the
      * reference's planner weights (`SURVEY.md §4`): cache-only beats
      * hybrid beats pushdown beats pullup-load.
      *
      * Hybrid requires an ORDINAL segment (admitted by [[mergedScan]]) —
      * a plain pullup segment has no zip key, so partial coverage from
      * one falls through to pushdown/pullup rather than re-reading the
      * cached columns from storage under a hybrid label. */
    def scan(s: SparkSession, dir: String, table: String,
        cols: Seq[String], predicate: Column): (DataFrame, Route) = {
      // every column the scan must produce BEFORE the filter runs: the
      // projection plus any predicate-only columns — coverage decisions
      // (and the pullup segment) are made on this set, so a predicate on
      // a column outside the projection still routes correctly
      val need = (cols ++ referencedCols(predicate).toSeq.sorted.filterNot(cols.contains))
      // resident = plain pullup segments (unfingerprinted) plus ordinal
      // segments built under the CURRENT file listing; an ordinal segment
      // whose layout fingerprint no longer matches is invisible here — it
      // can never mis-zip, only age out of the cache
      val fp = listingFingerprint(s, dir, table)
      val resident = cache.keys.filter(k =>
        k.table == table || k.table == s"$table@$fp")
      val full = resident.find(k => need.forall(dataCols(k).contains))
      lazy val partial = resident
        .filter(_.columns.contains(FileCol)) // zip-capable segments only
        .map(k => k -> dataCols(k).filter(need.contains))
        .filter { case (_, ov) => ov.nonEmpty && ov.size < need.size }
        .sortBy { case (_, ov) => -ov.size }
        .headOption

      full match {
        case Some(k) =>
          cacheOnlyN.incrementAndGet()
          val seg = cache.get(k) {
            // race-rebuild must reproduce the key's exact shape: ordinal
            // segments rebuild through the mergedScan builder (partition +
            // sort by the zip keys), plain ones as a bare projection
            if (k.columns.contains(FileCol))
              ordinalScan(s, dir, table, dataCols(k))
                .repartition(col(PosCol))
                .sortWithinPartitions(col(PosCol), col(FileCol))
            else
              s.read.parquet(Tables.path(dir, table)).select(dataCols(k).map(col): _*)
          }
          (seg.filter(predicate).select(cols.map(col): _*), CacheOnly)
        case None => partial match {
          case Some((k, overlap)) =>
            hybridN.incrementAndGet()
            val fetchCols = need.filterNot(overlap.contains)
            val pushable = referencedCols(predicate).subsetOf(fetchCols.toSet)
            val fetchPred = if (pushable) Some(predicate) else None
            val merged = mergedScan(s, dir, table, dataCols(k), fetchCols,
              fetchPred, cache)
            val filtered = if (pushable) merged else merged.filter(predicate)
            (filtered.select(cols.map(col): _*), Hybrid)
          case None =>
            if (slots.tryAcquire()) {
              // plan-time admission: the slot is returned immediately (the
              // DF is lazy); use [[execute]] when it must span execution
              slots.release()
              pushdownN.incrementAndGet()
              (s.read.parquet(Tables.path(dir, table))
                .filter(predicate).select(cols.map(col): _*), Pushdown)
            } else {
              pullupN.incrementAndGet()
              val seg = cache.get(SegmentKey(table, need)) {
                s.read.parquet(Tables.path(dir, table)).select(need.map(col): _*)
              }
              (seg.filter(predicate).select(cols.map(col): _*), Pullup)
            }
        }
      }
    }

    // ---- the reference's actual admission estimate
    // (`AdaptPushdownManager::receiveOne`): a saturated store does not
    // mean an unconditional fallback — it queues the request when the
    // ESTIMATED WAIT (queue depth × average pushdown service time) is
    // still cheaper than the weighted pullup alternative, and falls back
    // only past that point. Service times are measured EWMAs of this
    // router's own executions; `initial*EstNanos` seed them (specs inject
    // deterministic costs; operators can seed from history).
    private val EwmaAlpha = 0.3
    @volatile private var pushdownEstNanos: Double = initialPushdownEstNanos
    @volatile private var pullupEstNanos: Double = initialPullupEstNanos
    private val queued = new AtomicLong(0)

    private def observe(route: Route, nanos: Long): Unit = synchronized {
      route match {
        case Pushdown =>
          pushdownEstNanos =
            if (pushdownEstNanos <= 0) nanos.toDouble
            else (1 - EwmaAlpha) * pushdownEstNanos + EwmaAlpha * nanos
        case _ =>
          pullupEstNanos =
            if (pullupEstNanos <= 0) nanos.toDouble
            else (1 - EwmaAlpha) * pullupEstNanos + EwmaAlpha * nanos
      }
    }

    /** Current service-time estimates (nanos), for tests and telemetry. */
    def estimates: (Double, Double) = (pushdownEstNanos, pullupEstNanos)

    /** Run `action` with the pushdown slot held for its full duration —
      * the store-side lifetime the reference's manager tracks. When the
      * store is saturated, QUEUE if the estimated wait beats the weighted
      * pullup estimate, else fall back to pullup immediately. */
    def execute[T](s: SparkSession, dir: String, table: String,
        cols: Seq[String], predicate: Column)(action: DataFrame => T): (T, Route) = {
      def runPushdown(): (T, Route) = {
        pushdownN.incrementAndGet()
        val t0 = System.nanoTime()
        try (action(s.read.parquet(Tables.path(dir, table))
          .filter(predicate).select(cols.map(col): _*)), Pushdown)
        finally { slots.release(); observe(Pushdown, System.nanoTime() - t0) }
      }
      def runPullup(): (T, Route) = {
        pullupN.incrementAndGet()
        val need = (cols ++ referencedCols(predicate).toSeq.sorted.filterNot(cols.contains))
        val t0 = System.nanoTime()
        try {
          val seg = cache.get(SegmentKey(table, need)) {
            s.read.parquet(Tables.path(dir, table)).select(need.map(col): _*)
          }
          (action(seg.filter(predicate).select(cols.map(col): _*)), Pullup)
        } finally observe(Pullup, System.nanoTime() - t0)
      }
      if (slots.tryAcquire()) runPushdown()
      else {
        val estWait = (queued.get() + 1).toDouble * pushdownEstNanos
        val pullupCost = pullupWeight * pullupEstNanos
        // queue ONLY on measured (or seeded) estimates for BOTH routes —
        // an unmeasured pushdown would claim zero wait, and a zero-slot
        // store must never block on acquire. First contention therefore
        // prefers the fallback, which seeds the pullup estimate.
        if (pushdownSlots > 0 && pushdownEstNanos > 0 && pullupCost > 0 &&
            estWait <= pullupCost) {
          queued.incrementAndGet()
          try slots.acquire() finally queued.decrementAndGet()
          runPushdown()
        } else runPullup()
      }
    }
  }

  // --------------------------------------------------------------- entries

  /** dm02: TPC-H Q6 executed hybrid — the flagship FlexPushdownDB shape.
    * The three aggregation/filter columns are cache-resident; only
    * `l_shipdate` is fetched from storage, predicate pushed into that
    * scan, and zipped back by ordinal. Result equals plain Q6 by
    * construction (spec-pinned against the pushdown-only plan). */
  private def dm02HybridMerge(s: SparkSession, dir: String): DataFrame = {
    val merged = mergedScan(s, dir, "lineitem",
      cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
      fetchCols = Seq("l_shipdate"),
      fetchPredicate = Some(expr(
        "l_shipdate >= date '1996-01-01' and l_shipdate < date '1997-01-01'")),
      cache = segmentCache(s, dir))
    merged
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  private val dm02Sql =
    """SELECT sum(l_extendedprice * l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** dm03: the pullup fallback under a saturated store (zero pushdown
    * slots — deterministic route: the first call pullup-loads the
    * segment, every later call serves it cache-only; neither may touch
    * the pushdown path). The order-priority count runs compute-side over
    * the cache-resident segment; the oracle is route-independent. */
  private def dm03AdaptiveRoute(s: SparkSession, dir: String): DataFrame = {
    val router = new AdaptiveScanRouter(segmentCache(s, dir), pushdownSlots = 0)
    val (df, route) = router.scan(s, dir, "orders",
      Seq("o_orderpriority", "o_orderdate"),
      expr("o_orderdate >= date '1996-07-01' and o_orderdate < date '1996-10-01'"))
    require(route == Pullup || route == CacheOnly,
      s"saturated store must stay compute-side, got $route")
    df.groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val dm03Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** dm04: partition-granular hybrid over the day-partitioned events
    * copy. Days ≤ 01-15 are cache-resident; the query spans 01-08..01-22,
    * so half its days come from the cache and half from storage — where
    * partition pruning lists exactly the 7 uncached matching directories
    * (spec-pinned). The oracle aggregates the ORIGINAL events table: the
    * z03/z05 contract, layout and caching may change bytes read, never
    * results. */
  private def dm04PartitionHybrid(s: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Layout.partitionedEvents(s, dir)
    val region = col("day") <= lit("2024-01-15").cast("date")
    val pred = col("day") >= lit("2024-01-08").cast("date") &&
      col("day") <= lit("2024-01-22").cast("date")
    partitionHybridScan(s, path, Seq("event_type", "value", "day"),
      region, s"events_by_day:$dir#le-0115", pred, segmentCache(s, dir))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  private val dm04Sql =
    """SELECT event_type, count(*) AS n_events, sum(value) AS total_value
      |FROM events
      |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
      |  AND CAST(ts AS DATE) <= DATE '2024-01-22'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** dm05: the ROUTER's hybrid route end-to-end (dm02 drives mergedScan
    * directly; here the router must discover the partial segment and
    * choose Hybrid on its own). The entry idempotently admits the
    * 3-column ordinal segment — cache.get admits on first touch, so the
    * route is deterministic on every call — then asks for all four Q6
    * columns with the (fetch-side-only) date predicate: Hybrid is the
    * only admissible route, asserted, and the 1997 window keeps the
    * result distinct from dm02's. */
  private def dm05RoutedHybrid(s: SparkSession, dir: String): DataFrame = {
    val cache = segmentCache(s, dir)
    mergedScan(s, dir, "lineitem",
      cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
      fetchCols = Seq("l_shipdate"), fetchPredicate = None, cache = cache)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 8)
    val (df, route) = router.scan(s, dir, "lineitem",
      Seq("l_extendedprice", "l_discount", "l_quantity", "l_shipdate"),
      expr("l_shipdate >= date '1997-01-01' and l_shipdate < date '1998-01-01'"))
    require(route == Hybrid, s"partial segment must route hybrid, got $route")
    df.filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  private val dm05Sql =
    """SELECT sum(l_extendedprice * l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dm02_hybrid_merge"  -> dm02HybridMerge _,
    "dm03_adaptive_route" -> dm03AdaptiveRoute _,
    "dm04_partition_hybrid" -> dm04PartitionHybrid _,
    "dm05_routed_hybrid" -> dm05RoutedHybrid _,
  )

  val oracleSql: Map[String, String] = Map(
    "dm02_hybrid_merge"  -> dm02Sql,
    "dm03_adaptive_route" -> dm03Sql,
    "dm04_partition_hybrid" -> dm04Sql,
    "dm05_routed_hybrid" -> dm05Sql,
  )
}
