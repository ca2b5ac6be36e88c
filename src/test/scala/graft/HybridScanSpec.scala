package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import graft.cache.{HybridScan, LRU, SegmentCache, SegmentKey}
import graft.cache.HybridScan.{AdaptiveScanRouter, Pullup, Pushdown}
import graft.sources.Tables

/** Hybrid cache/storage execution: the MergeKernel ordinal zip and the
  * AdaptPushdownManager admission contract (reference
  * `fpdb-executor/src/physical/merge/MergeKernel.cpp`,
  * `fpdb-store-server/src/flight/AdaptPushdownManager.cpp`). */
class HybridScanSpec extends SparkSpec {

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private val q6Pred =
    "l_shipdate >= date '1996-01-01' and l_shipdate < date '1997-01-01'"

  test("ordinal zip is exact: merged rows equal the plain predicate scan") {
    val cache = new SegmentCache(1L << 30, LRU)
    val merged = HybridScan.mergedScan(spark, sfDir, "lineitem",
      cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
      fetchCols = Seq("l_shipdate"), fetchPredicate = Some(expr(q6Pred)),
      cache = cache)
    val plain = Tables.lineitem(spark, sfDir).filter(expr(q6Pred))
      .select("l_extendedprice", "l_discount", "l_quantity", "l_shipdate")
    assert(merged.count() == plain.count())
    // value-exact, not just cardinality: both sides keyed by full row
    val cols = plain.columns.map(col)
    assert(merged.select(cols: _*).exceptAll(plain).isEmpty &&
      plain.exceptAll(merged.select(cols: _*)).isEmpty,
      "merged hybrid rows must be the plain scan's rows, bag-equal")
  }

  test("dm02 hybrid Q6 equals the pushdown-only Q6") {
    val hybrid = HybridScan.queries("dm02_hybrid_merge")(spark, sfDir)
    val plain = spark.sql(
      s"""SELECT sum(l_extendedprice * l_discount) AS revenue
         |FROM parquet.`$sfDir/lineitem.parquet`
         |WHERE $q6Pred AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
         |""".stripMargin)
    val h = hybrid.collect().head.getDouble(0)
    val p = plain.collect().head.getDouble(0)
    assert(math.abs(h - p) < 1e-6, s"hybrid=$h plain=$p")
  }

  test("storage fetch is column-pruned to the missing column and predicate-pushed") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan tree
      val cache = new SegmentCache(1L << 30, LRU)
      val merged = HybridScan.mergedScan(spark, sfDir, "lineitem",
        cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
        fetchCols = Seq("l_shipdate"), fetchPredicate = Some(expr(q6Pred)),
        cache = cache)
      merged.count() // warm: admits + persists the segment
      assert(cache.keys.contains(HybridScan.ordinalKey("lineitem",
        HybridScan.listingFingerprint(spark, sfDir, "lineitem"),
        Seq("l_extendedprice", "l_discount", "l_quantity"))), "segment must be resident")
      val plan = merged.queryExecution.executedPlan
      // exactly one LIVE parquet scan: the fetch side (the cached side is
      // an InMemoryTableScan leaf — its build-time scan is not re-run)
      val scans = plan.collect { case f: FileSourceScanExec => f }
      assert(scans.length == 1,
        s"expected 1 storage scan after warm, got ${scans.length}:\n${plan.toString.take(3000)}")
      assert(plan.toString.contains("InMemoryTableScan"),
        s"cached side must serve from the segment cache:\n${plan.toString.take(3000)}")
      // the surviving scan reads ONLY l_shipdate (+ row-index metadata)
      // and pushes the date range into the reader
      val dataCols = scans.head.requiredSchema.fieldNames.filterNot(_.startsWith("_")).toSet
      assert(dataCols == Set("l_shipdate"),
        s"fetch ReadSchema must be pruned to l_shipdate, got $dataCols")
      val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("l_shipdate") &&
        (pushed.contains("GreaterThanOrEqual") || pushed.contains("GreaterThan")),
        s"date range must reach the storage scan, PushedFilters=$pushed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("selective fetch broadcasts: zero cached bytes move through an Exchange") {
    val cache = new SegmentCache(1L << 30, LRU)
    val merged = HybridScan.mergedScan(spark, sfDir, "lineitem",
      cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
      fetchCols = Seq("l_shipdate"), fetchPredicate = Some(expr(q6Pred)),
      cache = cache)
    merged.count()
    val plan = fmt(merged)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"small pushdown result should broadcast into the zip:\n${plan.take(3000)}")
  }

  test("segment is admitted once and hit on re-plan (cache accounting)") {
    val cache = new SegmentCache(1L << 30, LRU)
    def scan() = HybridScan.mergedScan(spark, sfDir, "lineitem",
      cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
      fetchCols = Seq("l_shipdate"), fetchPredicate = Some(expr(q6Pred)),
      cache = cache)
    scan().count(); scan().count()
    assert(cache.misses == 1 && cache.hits == 1,
      s"hits=${cache.hits} misses=${cache.misses}")
  }

  test("unmapped file fails loudly instead of mis-zipping") {
    // fabricate a frame whose _metadata basename can't be in the id map by
    // pointing ordinalScan at one table and validating the raise_error
    // wiring survives optimization: a valid read never raises
    val ok = HybridScan.ordinalScan(spark, sfDir, "region", Seq("r_name"))
    assert(ok.count() > 0) // raise_error branch compiled in, not taken
    val plan = fmt(ok)
    assert(plan.contains("raise_error") || ok.columns.contains(HybridScan.FileCol))
  }

  test("router admits pushdown while slots free, falls back to pullup when saturated") {
    val cache = new SegmentCache(1L << 30, LRU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 1)
    val pred = expr("o_orderdate >= date '1996-07-01' and o_orderdate < date '1996-10-01'")
    val cols = Seq("o_orderpriority", "o_orderdate")

    val (dfPush, r1) = router.scan(spark, sfDir, "orders", cols, pred)
    assert(r1 == Pushdown)

    // hold the single slot across an execute(); a concurrent request must
    // take the pullup route and still return identical rows
    val inAction = new CountDownLatch(1)
    val releaseAction = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val held = pool.submit(new java.util.concurrent.Callable[(Long, HybridScan.Route)] {
        override def call(): (Long, HybridScan.Route) =
          router.execute(spark, sfDir, "orders", cols, pred) { df =>
            inAction.countDown()
            releaseAction.await(30, TimeUnit.SECONDS)
            df.count()
          }
      })
      assert(inAction.await(30, TimeUnit.SECONDS), "execute() did not start")
      val (dfPull, r2) = router.scan(spark, sfDir, "orders", cols, pred)
      assert(r2 == Pullup, "saturated store must route to pullup")
      releaseAction.countDown()
      val (heldCount, heldRoute) = held.get(60, TimeUnit.SECONDS)
      assert(heldRoute == Pushdown)
      assert(dfPull.count() == heldCount && dfPush.count() == heldCount,
        "routes must be result-identical")
      // slot released after execute() — but the pullup fallback admitted
      // the segment, so the best route is now the cache, not the store
      val (_, r3) = router.scan(spark, sfDir, "orders", cols, pred)
      assert(r3 == HybridScan.CacheOnly,
        s"resident segment must outrank a free pushdown slot, got $r3")
      assert(router.pushdowns == 2 && router.pullups == 1 && router.cacheOnlys == 1,
        s"pushdowns=${router.pushdowns} pullups=${router.pullups} cacheOnlys=${router.cacheOnlys}")
    } finally pool.shutdownNow()
  }

  test("execute releases the slot on failure") {
    val router = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU), pushdownSlots = 1)
    val pred = expr("o_orderdate >= date '1996-07-01'")
    intercept[RuntimeException] {
      router.execute(spark, sfDir, "orders", Seq("o_orderpriority"), pred)(_ =>
        throw new RuntimeException("boom"))
    }
    assert(router.availableSlots == 1, "slot must be released on exception")
  }

  test("non-broadcast zip: only the thin fetch side exchanges, cached bytes stay put") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // no broadcast (force a distribution decision) and no AQE (static tree)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val cache = new SegmentCache(1L << 30, LRU)
      val merged = HybridScan.mergedScan(spark, sfDir, "lineitem",
        cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
        fetchCols = Seq("l_shipdate"), fetchPredicate = None, // non-selective: shuffled zip
        cache = cache)
      merged.count() // materialize the pre-partitioned segment
      val plan = merged.queryExecution.executedPlan
      // THE 100 TB claim: the segment was persisted already partitioned by
      // the ordinal join key, so EnsureRequirements re-shuffles ONLY the
      // fetched side — the wide cached columns never cross the wire again
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.length == 1,
        s"expected exactly one Exchange (fetch side), got ${exchanges.length}:\n${plan.toString.take(3000)}")
      assert(exchanges.head.collectFirst { case f: FileSourceScanExec => f }.isDefined,
        s"the sole Exchange must sit over the storage fetch:\n${plan.toString.take(3000)}")
      assert(plan.collectFirst {
        case e: ShuffleExchangeExec if e.toString.contains("InMemoryTableScan") => e
      }.isEmpty, "cached segment must not re-shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("route lattice: cache-only beats hybrid beats pushdown beats pullup") {
    val cache = new SegmentCache(1L << 30, LRU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 1)
    val pred = expr(q6Pred)
    val want = Seq("l_extendedprice", "l_discount", "l_quantity", "l_shipdate")

    // nothing resident, slot free → pushdown
    val (_, r0) = router.scan(spark, sfDir, "lineitem", want, pred)
    assert(r0 == Pushdown)

    // warm a PARTIAL ordinal segment → hybrid: resident columns from
    // cache, only l_shipdate fetched, predicate pushed (it references
    // only the fetched column)
    HybridScan.mergedScan(spark, sfDir, "lineitem",
      cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
      fetchCols = Seq("l_shipdate"), fetchPredicate = Some(pred),
      cache = cache).count()
    val (dfHybrid, r1) = router.scan(spark, sfDir, "lineitem", want, pred)
    assert(r1 == HybridScan.Hybrid, s"partial ordinal segment must route hybrid, got $r1")
    val plain = Tables.lineitem(spark, sfDir).filter(pred)
      .select(want.map(col): _*)
    assert(dfHybrid.count() == plain.count())
    assert(dfHybrid.exceptAll(plain).isEmpty && plain.exceptAll(dfHybrid).isEmpty,
      "hybrid route must return the plain scan's rows")

    // full coverage resident → cache-only even with zero slots
    val starved = new AdaptiveScanRouter(cache, pushdownSlots = 0)
    val sub = Seq("l_extendedprice", "l_quantity")
    val (dfCache, r2) = starved.scan(spark, sfDir, "lineitem", sub,
      expr("l_quantity < 24"))
    assert(r2 == HybridScan.CacheOnly, s"resident superset must serve cache-only, got $r2")
    val plainSub = Tables.lineitem(spark, sfDir)
      .filter(expr("l_quantity < 24")).select(sub.map(col): _*)
    assert(dfCache.count() == plainSub.count())

    // a predicate touching a CACHED column must not be pushed to the
    // fetch side — it filters after the zip, same rows
    val mixedPred = expr(s"$q6Pred and l_quantity < 24")
    val (dfMixed, r3) = router.scan(spark, sfDir, "lineitem", want, mixedPred)
    assert(r3 == HybridScan.Hybrid)
    assert(dfMixed.count() ==
      Tables.lineitem(spark, sfDir).filter(mixedPred).count())

    assert(router.pushdowns == 1 && router.hybrids == 2 &&
      starved.cacheOnlys == 1,
      s"pd=${router.pushdowns} hy=${router.hybrids} co=${starved.cacheOnlys}")
  }

  test("predicate on a column outside the projection still routes correctly") {
    val cache = new SegmentCache(1L << 30, LRU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 0) // saturated
    val pred = expr("l_quantity < 24") // NOT in the projection
    val cols = Seq("l_extendedprice", "l_discount")
    // pullup must load a segment wide enough to evaluate the predicate,
    // then project it away
    val (df1, r1) = router.scan(spark, sfDir, "lineitem", cols, pred)
    assert(r1 == Pullup)
    assert(df1.columns.toSeq == cols)
    val expect = Tables.lineitem(spark, sfDir).filter(pred).count()
    assert(df1.count() == expect)
    // second request: the widened segment now covers projection+predicate
    val (df2, r2) = router.scan(spark, sfDir, "lineitem", cols, pred)
    assert(r2 == HybridScan.CacheOnly, s"widened segment must serve cache-only, got $r2")
    assert(df2.count() == expect && df2.columns.toSeq == cols)
  }

  test("partition hybrid: storage side lists only the uncached matching days") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val path = graft.sources.Layout.partitionedEvents(spark, sfDir)
      val cache = new SegmentCache(1L << 30, LRU)
      val region = col("day") <= lit("2024-01-15").cast("date")
      val pred = col("day") >= lit("2024-01-08").cast("date") &&
        col("day") <= lit("2024-01-22").cast("date")
      val hybrid = HybridScan.partitionHybridScan(spark, path,
        Seq("event_type", "value", "day"), region, "spec-evday", pred, cache)
      hybrid.count() // warm the resident region
      // result parity with a plain scan of the same partitioned copy
      val plain = spark.read.parquet(path).filter(pred)
        .select("event_type", "value", "day")
      assert(hybrid.count() == plain.count())
      assert(hybrid.exceptAll(plain).isEmpty && plain.exceptAll(hybrid).isEmpty,
        "partition hybrid must be row-identical to the plain scan")
      // the storage side lists exactly the 7 uncached days in range
      // (01-16..01-22) of the 30 directories; the cached 8 come from the
      // segment (InMemoryTableScan). Metrics fill only when THIS
      // dataset's own plan executes — count()/exceptAll build new plans
      hybrid.collect()
      val plan = hybrid.queryExecution.executedPlan
      val parts = plan.collect {
        case f: FileSourceScanExec => f.metrics("numPartitions").value
      }.sum
      assert(parts == 7, s"storage side listed $parts partitions, expected 7:\n${plan.toString.take(2500)}")
      assert(plan.toString.contains("InMemoryTableScan"),
        "cached region must serve from the segment cache")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("a table layout change misses the segment instead of mis-zipping") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("hybrid-layout").toString
    try {
      // layout A: 2 part files
      val base = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      base.repartition(2).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val cache = new SegmentCache(1L << 30, LRU)
      def merged() = HybridScan.mergedScan(spark, dir, "lineitem",
        cachedCols = Seq("l_quantity"), fetchCols = Seq("l_extendedprice"),
        fetchPredicate = None, cache = cache)
      val sumA = merged().agg(sum(col("l_extendedprice") * col("l_quantity")))
        .collect().head.getDouble(0)
      assert(cache.misses == 1)
      // compaction: same rows, ONE part file — file ids all reassign
      val compacted = spark.read.parquet(s"$dir/lineitem.parquet")
        .repartition(1).localCheckpoint() // detach lineage before overwrite
      compacted.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val sumB = merged().agg(sum(col("l_extendedprice") * col("l_quantity")))
        .collect().head.getDouble(0)
      // the stale segment (old fingerprint) must NOT be reused: a second
      // miss builds against the new listing, and values agree exactly
      assert(cache.misses == 2,
        s"layout change must miss the fingerprinted key, misses=${cache.misses}")
      assert(math.abs(sumA - sumB) <= 1e-6 * math.max(1.0, math.abs(sumA)),
        s"compaction changed the zip result: $sumA vs $sumB")
      cache.invalidateAll()
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm)); p.delete()
      }
      rm(Paths.get(dir).toFile)
    }
  }

  test("saturated execute queues when the estimated wait beats pullup, else falls back") {
    val pred = expr("o_orderdate >= date '1996-07-01'")
    val cols = Seq("o_orderpriority")
    def holdSlotAnd(router: AdaptiveScanRouter)(body: => Unit): Unit = {
      val inAction = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      try {
        val held = pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            router.execute(spark, sfDir, "orders", cols, pred) { df =>
              inAction.countDown(); release.await(30, TimeUnit.SECONDS); df.count()
            }; ()
          }
        })
        assert(inAction.await(30, TimeUnit.SECONDS))
        try body finally release.countDown()
        held.get(60, TimeUnit.SECONDS)
      } finally pool.shutdownNow()
    }

    // pushdown cheap (1ms est) vs pullup dear (10s est): the contended
    // request QUEUES and still executes as pushdown once the slot frees
    val patient = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 1e6, initialPullupEstNanos = 1e10)
    val pool2 = Executors.newFixedThreadPool(2)
    try {
      val inAction = new CountDownLatch(1)
      val release = new CountDownLatch(1)
      val held = pool2.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          patient.execute(spark, sfDir, "orders", cols, pred) { df =>
            inAction.countDown(); release.await(30, TimeUnit.SECONDS); df.count()
          }; ()
        }
      })
      assert(inAction.await(30, TimeUnit.SECONDS))
      val queuedReq = pool2.submit(new java.util.concurrent.Callable[HybridScan.Route] {
        override def call(): HybridScan.Route =
          patient.execute(spark, sfDir, "orders", cols, pred)(_.count())._2
      })
      Thread.sleep(200) // the queued request must be WAITING, not fallen back
      assert(!queuedReq.isDone, "cheap-pushdown request should queue, not fall back")
      release.countDown()
      held.get(60, TimeUnit.SECONDS)
      assert(queuedReq.get(60, TimeUnit.SECONDS) == Pushdown)
      assert(patient.pullups == 0 && patient.pushdowns == 2)
    } finally pool2.shutdownNow()

    // pushdown dear (10s est) vs pullup cheap (1ms est): the contended
    // request falls back immediately
    val impatient = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 1e10, initialPullupEstNanos = 1e6)
    holdSlotAnd(impatient) {
      val (_, r) = impatient.execute(spark, sfDir, "orders", cols, pred)(_.count())
      assert(r == Pullup, s"dear-pushdown contention must fall back, got $r")
    }
    assert(impatient.pullups == 1)

    // estimates are measured: after real executions both EWMAs are seeded
    val (pd, pu) = impatient.estimates
    assert(pd > 0 && pu > 0, s"estimates must update from observations: $pd, $pu")
  }

  test("dm05 routes hybrid deterministically and matches the plain Q6-1997") {
    val out = HybridScan.queries("dm05_routed_hybrid")(spark, sfDir)
      .collect().head.getDouble(0)
    val want = spark.sql(
      s"""SELECT sum(l_extendedprice * l_discount) AS revenue
         |FROM parquet.`$sfDir/lineitem.parquet`
         |WHERE l_shipdate >= date '1997-01-01' AND l_shipdate < date '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
         |""".stripMargin).collect().head.getDouble(0)
    assert(math.abs(out - want) < 1e-6, s"dm05 $out vs plain $want")
    // second call: still Hybrid (the require inside the entry would throw)
    assert(HybridScan.queries("dm05_routed_hybrid")(spark, sfDir)
      .collect().head.getDouble(0) == out)
  }

  test("dm03 runs the deterministic pullup fallback and orders by priority") {
    val out = HybridScan.queries("dm03_adaptive_route")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val prios = out.map(_.getString(0)).toSeq
    assert(prios == prios.sorted)
  }
}
