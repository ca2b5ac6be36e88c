package graft

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.cache.{HybridScan, LRU, SegmentCache}
import graft.cache.HybridScan.{AdaptiveScanRouter, Pushdown}

/** Store-scoped pushdown-slot budgets (r13 verdict item 3) and the
  * queue-then-admit discipline for forced pushdown (item 4).
  *
  * The reference's AdaptPushdownManager lives in the STORE server and
  * arbitrates one budget across every client
  * (`fpdb-store-server/src/flight/AdaptPushdownManager.cpp:24-60`):
  * requests queue when the store is saturated, they never bypass, and no
  * client ever sees a private full budget. graft's session routers share
  * a JVM-global [[HybridScan.storeSlotPool]] keyed by store dir. */
class StoreSlotSpec extends SparkSpec {

  /** A distinct store KEY over the same physical test data: a symlink to
    * sfDir — isolates this spec's pool from the suites sharing sfDir's. */
  private def linkedDir(tag: String): String = {
    val link = java.nio.file.Files.createTempDirectory(s"graft-store-$tag")
      .resolve("sf")
    java.nio.file.Files.createSymbolicLink(link,
      java.nio.file.Paths.get(sfDir))
    link.toString
  }

  test("two sessions contend for ONE store budget; in-flight never exceeds it") {
    val dir = linkedDir("shared")
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    s1.conf.set("spark.graft.pushdownSlots", "1")
    s2.conf.set("spark.graft.pushdownSlots", "1")
    val r1 = HybridScan.sessionRouter(s1, dir)
    val r2 = HybridScan.sessionRouter(s2, dir)
    try {
      assert(r1.availableSlots == 1 && r2.availableSlots == 1,
        "both routers must read the SAME store pool")
      // r1 takes the store's only slot (cold miss on the full lattice
      // routes pushdown, slot held by the lease)
      val l1 = r1.scanMode(s1, dir, "orders", Seq("o_orderkey"),
        expr("o_orderkey > 0"), HybridScan.ModeHybrid)
      try {
        assert(l1.route == Pushdown, s"fixture: expected pushdown, got ${l1.route}")
        assert(r1.availableSlots == 0 && r2.availableSlots == 0,
          "the held slot must be visible through BOTH sessions' routers")
        // r2's cold miss now finds the STORE saturated: the full lattice
        // must fall back, never admit a second in-flight pushdown
        val l2 = r2.scanMode(s2, dir, "orders", Seq("o_custkey"),
          expr("o_custkey > 0"), HybridScan.ModeHybrid)
        try assert(l2.route != Pushdown,
          s"a second session must not exceed the store budget: ${l2.route}")
        finally l2.close()
      } finally l1.close()
      assert(r1.availableSlots == 1 && r2.availableSlots == 1)
      // with the slot free again, the other session pushes down fine
      val l3 = r2.scanMode(s2, dir, "orders", Seq("o_orderstatus"),
        expr("o_orderstatus = 'F'"), HybridScan.ModeHybrid)
      try assert(l3.route == Pushdown) finally l3.close()
    } finally {
      HybridScan.segmentCache(s1, dir).invalidateAll()
      HybridScan.segmentCache(s2, dir).invalidateAll()
    }
  }

  test("a re-declared budget resizes the store pool in place (last wins, logged)") {
    val dir = linkedDir("resize")
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.pushdownSlots", "2")
    val r1 = HybridScan.sessionRouter(s1, dir)
    assert(r1.availableSlots == 2)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.pushdownSlots", "5")
    val r2 = HybridScan.sessionRouter(s2, dir)
    // the budget is the STORE's: one pool, re-sized by the later declaration
    assert(r2.availableSlots == 5 && r1.availableSlots == 5,
      "the resize must be visible through every router over the store")
  }

  test("forced pushdown QUEUES for a slot and acquires it when freed (no over-budget)") {
    val cache = new SegmentCache(1L << 30, LRU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 1,
      forcedWaitMs = 10000)
    def ask() = router.scanMode(spark, sfDir, "orders", Seq("o_orderkey"),
      expr("o_orderkey > 0"), HybridScan.ModePushdownOnly)
    val l1 = ask()
    assert(l1.route == Pushdown && router.overBudget == 0)
    val pool = Executors.newSingleThreadExecutor()
    try {
      val f = pool.submit(new java.util.concurrent.Callable[
          (HybridScan.ScanLease, Long)] {
        override def call(): (HybridScan.ScanLease, Long) = {
          val t0 = System.nanoTime()
          val l = ask()
          (l, System.nanoTime() - t0)
        }
      })
      Thread.sleep(300) // the waiter must still be queued, not admitted
      assert(!f.isDone, "a saturated forced pushdown must QUEUE, not bypass")
      l1.close()
      val (l2, waitedNanos) = f.get(30, TimeUnit.SECONDS)
      try {
        assert(l2.route == Pushdown)
        assert(waitedNanos >= 250L * 1000 * 1000,
          s"the waiter must have blocked on the held slot: ${waitedNanos / 1e6} ms")
        assert(router.overBudget == 0,
          "a queued-then-acquired forced pushdown is WITHIN budget")
        assert(router.decisions.last._4.contains("queued"),
          router.decisions.last._4)
      } finally l2.close()
      assert(router.availableSlots == 1)
    } finally {
      pool.shutdownNow()
      cache.invalidateAll()
    }
  }

  test("forced pushdown past the queue timeout is admitted over budget, recorded") {
    val cache = new SegmentCache(1L << 30, LRU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 1,
      forcedWaitMs = 150)
    def ask() = router.scanMode(spark, sfDir, "orders", Seq("o_orderkey"),
      expr("o_orderkey > 0"), HybridScan.ModePushdownOnly)
    val l1 = ask()
    assert(l1.route == Pushdown && router.overBudget == 0)
    val t0 = System.nanoTime()
    val l2 = ask() // slot held: waits forcedWaitMs, then honest over-admit
    val waitedMs = (System.nanoTime() - t0) / 1e6
    try {
      assert(l2.route == Pushdown, "pushdown-only cannot fall back")
      assert(waitedMs >= 120,
        s"the over-admit must come only PAST the queue wait: $waitedMs ms")
      assert(router.overBudget == 1, "the over-budget admission must be counted")
      assert(router.decisions.last._4.contains("over-budget"),
        router.decisions.last._4)
    } finally { l2.close(); l1.close() }
    assert(router.availableSlots == 1,
      "an over-budget lease must not release a slot it never held")
    cache.invalidateAll()
  }

  test("a zero-budget store never waits in forced pushdown") {
    val cache = new SegmentCache(1L << 30, LRU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 0,
      forcedWaitMs = 60000)
    val t0 = System.nanoTime()
    val l = router.scanMode(spark, sfDir, "orders", Seq("o_orderkey"),
      expr("o_orderkey > 0"), HybridScan.ModePushdownOnly)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    try {
      assert(l.route == Pushdown)
      assert(elapsedMs < 5000,
        s"zero-slot pushdown-only must not block on the queue: $elapsedMs ms")
      assert(router.overBudget == 1)
    } finally l.close()
    cache.invalidateAll()
  }
}
