package graft

import org.apache.spark.sql.functions._
import graft.cache.{LFU, LRU, SegmentCache, SegmentKey}
import graft.sources.Tables

/** Segment cache: hit/miss accounting, capacity admission, policy-ordered
  * eviction over persisted column projections. */
class CacheSpec extends SparkSpec {

  private def seg(table: String, cols: String*) = SegmentKey(table, cols)
  private def proj(table: String, cols: Seq[String]) =
    Tables.load(spark, sfDir, table).select(cols.map(col): _*)

  test("second access is a hit and reuses the same plan") {
    val cache = new SegmentCache(capacityBytes = 1L << 30, policy = LRU)
    val k = seg("lineitem", "l_orderkey", "l_quantity")
    val a = cache.get(k)(proj("lineitem", k.columns))
    val b = cache.get(k)(proj("lineitem", k.columns))
    assert(cache.hits == 1 && cache.misses == 1)
    assert(a eq b, "hit must return the cached DataFrame (persisted plan)")
    assert(a.count() > 0)
  }

  // equal-size segments: single numeric columns of the same table
  private val k1 = seg("orders", "o_orderkey")
  private val k2 = seg("orders", "o_custkey")
  private val k3 = seg("orders", "o_totalprice")

  private def twoSegmentCache(policy: graft.cache.CachePolicy) = {
    val bytes = proj("orders", k1.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    new SegmentCache(capacityBytes = bytes * 2 + bytes / 2, policy = policy)
  }

  test("LRU evicts the least recently used segment under pressure") {
    val cache = twoSegmentCache(LRU)
    assert(cache.evictions == 0)
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k2)(proj("orders", k2.columns))
    cache.get(k1)(proj("orders", k1.columns))      // touch k1 (k2 becomes LRU)
    cache.get(k3)(proj("orders", k3.columns))      // must evict k2
    assert(cache.keys.contains(k1) && !cache.keys.contains(k2))
    // the counter the bench's modes block reports (round-6 verdict item
    // 6): one capacity eviction happened and invalidateAll (teardown)
    // must not inflate it
    assert(cache.evictions == 1, s"eviction counter: ${cache.evictions}")
    assert(cache.hits == 1 && cache.misses == 3)
    cache.invalidateAll()
    assert(cache.evictions == 1)
  }

  test("LFU keeps the hot segment") {
    val cache = twoSegmentCache(LFU)
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))      // k1 hot
    cache.get(k2)(proj("orders", k2.columns))      // k2 cold
    cache.get(k3)(proj("orders", k3.columns))      // evicts k2, not k1
    assert(cache.keys.contains(k1) && !cache.keys.contains(k2))
    cache.invalidateAll()
  }

  test("W-LFU weights eviction by benefit, not just frequency") {
    import graft.cache.WLFU
    // k2 is accessed more, but weight (recompute benefit) dominates both
    // eviction order (k2 outlives k1? no — k1's 100 beats k2's 3) and
    // admission (k3's would-be priority 1x5 beats the coldest resident k2)
    val weights = Map(k1 -> 100.0, k2 -> 1.0, k3 -> 5.0).withDefaultValue(1.0)
    val bytes = proj("orders", k1.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val cache = new SegmentCache(bytes * 2 + bytes / 2, WLFU(weights))
    cache.get(k1)(proj("orders", k1.columns))      // k1: 1 hit x 100
    cache.get(k2)(proj("orders", k2.columns))
    cache.get(k2)(proj("orders", k2.columns))
    cache.get(k2)(proj("orders", k2.columns))      // k2: 3 hits x 1
    cache.get(k3)(proj("orders", k3.columns))      // k3 (5) evicts k2 (3), not k1 (100)
    assert(cache.keys.contains(k1) && !cache.keys.contains(k2))
    assert(cache.keys.contains(k3))
    cache.invalidateAll()
  }

  test("LFU-S prefers evicting the big cold segment (hits per byte)") {
    import graft.cache.LFUS
    val kBig = seg("orders", "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val small = proj("orders", k2.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val big = proj("orders", kBig.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    assert(big > small)
    val cache = new SegmentCache(big + small + small / 2, LFUS)
    cache.get(kBig)(proj("orders", kBig.columns))  // 1 hit / big bytes = coldest
    cache.get(k2)(proj("orders", k2.columns))
    cache.get(k3)(proj("orders", k3.columns))      // evicts kBig, not k2
    assert(cache.keys.contains(k2) && cache.keys.contains(k3) && !cache.keys.contains(kBig))
    cache.invalidateAll()
  }

  test("admission rejects a cold insert rather than evicting a hotter resident") {
    val cache = twoSegmentCache(LFU)
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))      // k1: 2 hits
    cache.get(k2)(proj("orders", k2.columns))
    cache.get(k2)(proj("orders", k2.columns))      // k2: 2 hits
    val df = cache.get(k3)(proj("orders", k3.columns)) // k3 would-be: 1 hit
    assert(df.count() > 0, "rejected segment still computes")
    assert(cache.keys.contains(k1) && cache.keys.contains(k2) && !cache.keys.contains(k3),
      "a cold insert must not displace hotter residents")
    cache.invalidateAll()
  }

  test("measured W-LFU: a slow-to-recompute segment outlives a frequently-hit cheap one") {
    import graft.cache.MeasuredWLFU
    import org.apache.spark.sql.DataFrame
    // deterministic "measured" load times injected via the spec hook:
    // k1 is expensive to recompute (10 s), k2 cheap (1 ms), k3 medium (1 s)
    val costs = Map(k1 -> 10.0, k2 -> 0.001, k3 -> 1.0)
    val bytes = proj("orders", k1.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    var pending: Double = 0.0
    // capacity is calibrated in STATS bytes, so pin sizing to stats too:
    // this test is about the measured-COST weighting; measured-SIZE
    // admission has its own tests below
    val cache = new SegmentCache(bytes * 2 + bytes / 2, MeasuredWLFU) {
      override protected def measureLoad(df: DataFrame): Double = { df.count(); pending }
      override protected def measuredBytes(df: DataFrame): Option[Long] = None
    }
    def get(k: SegmentKey): Unit = { pending = costs(k); cache.get(k)(proj("orders", k.columns)) }
    get(k1)                                        // k1: 1 hit x 10 s    = 10
    get(k2); get(k2); get(k2); get(k2); get(k2)    // k2: 5 hits x 1 ms   = 0.005
    get(k3)                                        // k3 would-be: 1 x 1 s = 1 -> evicts k2, not k1
    assert(cache.keys.contains(k1) && !cache.keys.contains(k2),
      "measured recompute benefit must outrank raw hit frequency")
    assert(cache.keys.contains(k3))
    cache.invalidateAll()
  }

  test("a slow MeasuredWLFU load does not block concurrent hits on other keys") {
    import graft.cache.MeasuredWLFU
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val cache = new SegmentCache(Long.MaxValue, MeasuredWLFU) {
      override protected def measureLoad(df: org.apache.spark.sql.DataFrame): Double = {
        entered.countDown()
        release.await(60, TimeUnit.SECONDS)
        df.count(); 1.0
      }
    }
    cache.get(k2)(proj("orders", k2.columns))      // k2 resident
    val loader = new Thread(() => { cache.get(k1)(proj("orders", k1.columns)); () })
    loader.start()
    assert(entered.await(30, TimeUnit.SECONDS), "loader never reached measureLoad")
    // k1's load is now parked mid-measure; a hit on k2 must not queue behind it
    val t0 = System.nanoTime()
    cache.get(k2)(proj("orders", k2.columns))
    val hitSecs = (System.nanoTime() - t0) / 1e9
    release.countDown()
    loader.join(60000)
    assert(hitSecs < 5.0, s"hit on another key blocked behind a concurrent load ($hitSecs s)")
    assert(cache.keys.contains(k1), "parked load still admits after release")
    cache.invalidateAll()
  }

  test("two racing misses on one key converge to a single resident entry") {
    import graft.cache.MeasuredWLFU
    val cache = new SegmentCache(Long.MaxValue, MeasuredWLFU)
    val dfs = (1 to 2).map { _ =>
      new java.util.concurrent.FutureTask(() => cache.get(k1)(proj("orders", k1.columns)))
    }
    val threads = dfs.map(new Thread(_))
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    val results = dfs.map(_.get())
    assert(cache.keys.contains(k1), "the raced key must be resident")
    // the central claim: the loser's cleanup must NOT have uncached the
    // winner's data (Spark's CacheManager keys by canonicalized plan, so
    // a naive loser-unpersist drops the shared entry while the map still
    // shows the key as resident)
    assert(results.forall(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE),
      "raced segment must remain actually persisted after the race")
    assert(results.forall(_.count() > 0), "both racers get a usable result")
    cache.invalidateAll()
  }

  test("concurrent churn keeps residents persisted and accounting exact") {
    // 8 threads hammer 6 keys through a cache small enough to force the
    // full lifecycle concurrently: eager measured loads, admissions,
    // evictions, refusals parked on the condemned list, drains, and
    // per-miss size true-ups. Invariants, not routes: (1) hit+miss
    // accounting stays exact under the monitor discipline; (2) after the
    // dust settles every RESIDENT frame is still actually persisted —
    // the drain decides keep-or-release against current residents under
    // the monitor, so no drain may drop a just-admitted plan-equal
    // resident's blocks (the storageLevel==NONE ghost this spec exists
    // to catch); (3) every get returned a usable frame.
    import graft.cache.MeasuredWLFU
    val ks = Seq(
      seg("orders", "o_orderkey"), seg("orders", "o_custkey"),
      seg("orders", "o_totalprice"), seg("orders", "o_orderdate"),
      seg("lineitem", "l_orderkey"), seg("lineitem", "l_quantity"))
    val oneSeg = proj("orders", ks.head.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val cache = new SegmentCache(oneSeg * 5 / 2, MeasuredWLFU)
    val iters = 20
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try {
          var i = 0
          while (i < iters) {
            val k = ks((t * 7 + i * 13) % ks.size)
            val df = cache.get(k)(proj(k.table, k.columns))
            // every returned frame — resident, refused, or racer copy —
            // must execute correctly even if a drain runs concurrently
            if (i % 5 == 0) assert(df.count() > 0)
            i += 1
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(failures.isEmpty, s"worker failed: ${failures.peek()}")
    assert(cache.hits + cache.misses == 8L * iters,
      s"accounting drift: ${cache.hits}+${cache.misses} != ${8 * iters}")
    cache.keys.foreach { k =>
      val df = cache.get(k)(sys.error(s"$k must be resident"))
      assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        s"resident $k lost its persisted blocks (ghost entry)")
      assert(df.count() > 0)
    }
    cache.invalidateAll()
  }

  test("Belady evicts the segment used farthest in the future") {
    import graft.cache.Belady
    // trace: k1, k2, k3, k1 — at admission of k3 (clock 3), k1 recurs at
    // index 3, k2 never recurs -> evict k2
    val trace = Seq(k1, k2, k3, k1)
    val bytes = proj("orders", k1.columns)
      .queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val cache = new SegmentCache(bytes * 2 + bytes / 2, Belady(trace))
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k2)(proj("orders", k2.columns))
    cache.get(k3)(proj("orders", k3.columns))
    assert(cache.keys.contains(k1) && !cache.keys.contains(k2))
    val df = cache.get(k1)(proj("orders", k1.columns))
    assert(cache.hits == 1 && df.count() > 0)
    cache.invalidateAll()
  }

  test("warmed whole-table segment substitutes into plan-equal scans (mode bench path)") {
    import graft.cache.MeasuredWLFU
    // the Bench mode-comparison mechanism: persist() registers the segment
    // with Spark's CacheManager, which swaps the in-memory columnar
    // relation into ANY later plan-equal scan — entries re-run unchanged
    val cache = new SegmentCache(1L << 30, MeasuredWLFU)
    val df = Tables.load(spark, sfDir, "lineitem")
    val key = SegmentKey("lineitem", df.columns.toSeq)
    cache.get(key)(df)
    val unrelated = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    assert(unrelated.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "a warmed segment must serve unrelated plan-equal scans")
    cache.get(key)(Tables.load(spark, sfDir, "lineitem"))
    assert(cache.hits == 1 && cache.misses == 1, "hit accounting over the warm run")
    cache.invalidateAll()
    val after = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    assert(!after.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "invalidateAll must return scans to storage")
  }

  test("warmed DERIVED projection serves plan-equal recomputes (dm01 bench path)") {
    import graft.cache.MeasuredWLFU
    // the Bench dm01 demo mechanism: an expensive derived artifact (the
    // TF-IDF top-terms table) persisted through SegmentCache must serve a
    // REBUILT plan-equal frame from the in-memory relation — the warm run
    // skips the recompute entirely, which is the reference's VLDB'21
    // caching claim (a hit saves scan+compute, not just the fetch)
    val cache = new SegmentCache(1L << 30, MeasuredWLFU)
    def derived() = SparkEntry.queries("t07_tfidf")(spark, sfDir)
    val key = SegmentKey("dm01_tfidf_segment", derived().columns.toSeq)
    cache.get(key)(derived())
    val rebuilt = derived() // a fresh plan, not the cached object
    assert(rebuilt.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "warm rerun of the derived projection must take the in-memory path")
    cache.get(key)(derived())
    assert(cache.hits == 1 && cache.misses == 1)
    cache.invalidateAll()
    assert(!derived().queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "invalidateAll must return the derived plan to recompute")
  }

  test("segments larger than capacity are never admitted but still compute") {
    val cache = new SegmentCache(capacityBytes = 1, policy = LRU)
    val k = seg("orders", "o_orderkey")
    val df = cache.get(k)(proj("orders", k.columns))
    assert(df.count() > 0)
    assert(cache.keys.isEmpty)
  }

  test("resident sizes true up to block-manager truth once materialized") {
    val cache = new SegmentCache(1L << 30, LRU)
    val k = seg("orders", "o_orderkey", "o_totalprice")
    val df = cache.get(k)(proj("orders", k.columns))
    val statsUsed = cache.usedBytes
    assert(statsUsed > 0, "unmaterialized residents are priced by stats")
    df.count() // materialize the persisted columnar buffers
    cache.trueUpSizes()
    // independent read of the same block-manager truth
    val expected = org.apache.spark.sql.GraftBridge.cachedBufferRddId(df)
      .flatMap(id => spark.sparkContext.getRDDStorageInfo.find(_.id == id))
      .map(i => i.memSize + i.diskSize)
    assert(expected.exists(_ > 0), "spec must see the loaded buffers")
    assert(cache.usedBytes == expected.get,
      s"usedBytes ${cache.usedBytes} must equal block-manager bytes ${expected.get} " +
      s"(stats priced it at $statsUsed)")
    cache.invalidateAll()
  }

  test("a stats-overpriced segment admits at its measured bytes under MeasuredWLFU") {
    import graft.cache.MeasuredWLFU
    // a self-join's basic (non-CBO) stats MULTIPLY the children — the
    // exact overpricing that refused zip-capable ordinal segments at
    // capacities their real bytes fit (r10 capacity sweep finding)
    def joined() = {
      val a = proj("orders", Seq("o_orderkey", "o_totalprice"))
      val b = proj("orders", Seq("o_orderkey", "o_orderdate"))
      a.join(b, "o_orderkey")
    }
    val statsSize = joined().queryExecution.optimizedPlan.stats.sizeInBytes
    val capacity = 64L << 20
    assert(statsSize > BigInt(capacity),
      s"precondition: stats $statsSize must overprice the $capacity capacity")
    val k = seg("orders", "joined")
    // stats-priced admission refuses it outright...
    val lru = new SegmentCache(capacity, LRU)
    lru.get(k)(joined())
    assert(lru.keys.isEmpty, "stats-priced admission must refuse")
    // ...measured-size admission (the load just ran, real bytes known)
    // admits the same frame comfortably
    val measured = new SegmentCache(capacity, MeasuredWLFU)
    measured.get(k)(joined())
    assert(measured.keys.contains(k),
      s"measured admission must admit (used ${measured.usedBytes} of $capacity)")
    assert(measured.usedBytes > 0 && measured.usedBytes < capacity)
    measured.invalidateAll(); lru.invalidateAll()
  }

  // deterministic eager cache for the condemned-frame contract tests:
  // fixed measured size (60 of 100 — one resident fits, two never do) and
  // fixed load cost (priority = hits × cost, so a 3-hit resident always
  // outranks a 1-hit candidate)
  import org.apache.spark.sql.DataFrame
  private def eagerCache() =
    new SegmentCache(100L, graft.cache.MeasuredWLFU) {
      override protected def measuredBytes(df: DataFrame) = Some(60L)
      override protected def measureLoad(df: DataFrame) = { df.count(); 1.0 }
    }
  private def materialized(df: DataFrame): Boolean =
    org.apache.spark.sql.GraftBridge.cachedBufferRddId(df).isDefined

  test("a refused measured load stays materialized for its caller, freed once aged — on hits too") {
    // resident A (hot, 3 accesses) blocks candidate B's admission: B is
    // refused AFTER its eager load and parked condemned. The frame must
    // SURVIVE the next interaction (a concurrent miss draining it
    // immediately would re-read storage under B's caller — the measured
    // 2×-bytes regression), then drain once aged — on a pure HIT
    // workload too: a warm steady state must not pin the blocks forever.
    val cache = eagerCache()
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))
    val b = cache.get(k2)(proj("orders", k2.columns))
    assert(cache.keys == Seq(k1), "the hot resident must refuse the candidate")
    assert(materialized(b),
      "the refused frame must keep its materialized blocks for the caller")
    cache.get(k1)(proj("orders", k1.columns)) // age 1: must still be held
    assert(materialized(b),
      "one interaction later the frame must still be materialized")
    cache.get(k1)(proj("orders", k1.columns)) // age 2, a HIT: drains
    assert(!materialized(b),
      "the aged refused frame must be released by the hit-path drain")
    cache.invalidateAll()
  }

  test("a leased refused frame survives any number of interactions until released") {
    val cache = eagerCache()
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))
    cache.get(k1)(proj("orders", k1.columns))
    val a = cache.get(k1)(proj("orders", k1.columns))
    // a resident frame is not condemned: no lease to take
    assert(cache.leaseRefused(a).isEmpty)
    val b = cache.get(k2)(proj("orders", k2.columns))
    val lease = cache.leaseRefused(b)
    assert(lease.isDefined, "a refused eager load must be leasable")
    // a second lease on the same frame must not double-pin
    assert(cache.leaseRefused(b).isEmpty)
    (1 to 4).foreach(_ => cache.get(k1)(proj("orders", k1.columns)))
    assert(materialized(b),
      "a leased frame must never age out while its caller holds the lease")
    lease.get.apply()
    assert(!materialized(b), "release must drain the frame immediately")
    cache.invalidateAll()
  }
}
