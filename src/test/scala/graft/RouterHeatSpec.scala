package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.cache.{HybridScan, LRU, SegmentCache}
import graft.cache.HybridScan.{AdaptiveScanRouter, Pullup, Pushdown}

/** Router heat persistence (r12) — the reference's AdaptPushdownManager
  * state (service-time averages, request history) lives for the STORE
  * SERVER's lifetime, so every new client session routes on measured
  * history. Graft's session-scoped router gets the same property via a
  * heat snapshot: `spark.graft.heatPath` saves after each conf-routed
  * query and seeds the next session's router at build. */
class RouterHeatSpec extends SparkSpec {

  private val cols = Seq("o_orderkey", "o_totalprice")
  private val pred = col("o_totalprice") > lit(0.0)

  test("heat snapshot round-trips estimates, table costs, and survives junk") {
    val a = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 2e6,
      initialPullupEstNanos = 3e9)
    a.seedTableCost("lineitem", 7.5)
    val b = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1)
    b.seedHeat(a.heatSnapshot)
    assert(b.estimates == a.estimates,
      s"EWMAs must round-trip: ${b.estimates} vs ${a.estimates}")
    assert(b.measuredWeight(graft.cache.SegmentKey("lineitem", Seq("x"))) == 7.5,
      "per-table pullup cost must round-trip into the W-LFU weight")
    // explicit constructor seeds WIN over a snapshot (specs inject costs)
    val c = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 9e9)
    c.seedHeat(a.heatSnapshot)
    assert(c.estimates._1 == 9e9, "a measured estimate must not be overwritten")
    assert(c.estimates._2 == 3e9, "unmeasured slots fill from the snapshot")
    // a corrupt snapshot cold-starts the remainder, never throws
    val d = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1)
    d.seedHeat("v=1\npushdown_est_nanos=not-a-number\ngarbage\n=\ncost.t=1.5")
    assert(d.estimates._1 == 0.0)
    assert(d.measuredWeight(graft.cache.SegmentKey("t", Seq("x"))) == 1.5)
  }

  test("a restarted router's FIRST contended request queues on seeded history") {
    // session 1 measured: pushdown cheap, pullup dear
    val prior = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 1e6,
      initialPullupEstNanos = 1e10)
    val snapshot = prior.heatSnapshot

    def contendedRoute(r: AdaptiveScanRouter): (Boolean, HybridScan.Route) = {
      val pool = Executors.newFixedThreadPool(2)
      try {
        val inAction = new CountDownLatch(1)
        val release = new CountDownLatch(1)
        val held = pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            r.execute(spark, sfDir, "orders", cols, pred) { df =>
              inAction.countDown(); release.await(30, TimeUnit.SECONDS)
              df.count()
            }; ()
          }
        })
        assert(inAction.await(30, TimeUnit.SECONDS))
        val contended = pool.submit(
          new java.util.concurrent.Callable[HybridScan.Route] {
            override def call(): HybridScan.Route =
              r.execute(spark, sfDir, "orders", cols, pred)(_.count())._2
          })
        Thread.sleep(200)
        val waited = !contended.isDone
        release.countDown()
        held.get(60, TimeUnit.SECONDS)
        (waited, contended.get(60, TimeUnit.SECONDS))
      } finally pool.shutdownNow()
    }

    // cold restart (no snapshot): an unmeasured pushdown estimate claims
    // nothing, so the first contended request FALLS BACK — the exact
    // cold-start cost the snapshot exists to remove
    val cold = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1)
    // (route is the decisive signal — a fallback executes Pullup without
    // ever waiting on the held slot; wall-clock is not asserted here
    // because a cold pullup's own execution can outlast any fixed sleep)
    val (_, coldRoute) = contendedRoute(cold)
    assert(coldRoute == Pullup,
      s"a cold router's first contention must fall back: $coldRoute")
    assert(cold.pullups == 1 && cold.pushdowns == 1)

    // seeded restart: the same first contended request QUEUES for the
    // slot (seeded 1ms pushdown vs 10s pullup) and executes as pushdown
    val seeded = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1)
    seeded.seedHeat(snapshot)
    val (waited, route) = contendedRoute(seeded)
    assert(waited, "the seeded router must queue, not fall back")
    assert(route == Pushdown, s"queued request must execute pushdown: $route")
    assert(seeded.pullups == 0 && seeded.pushdowns == 2)
  }

  test("conf-mode sessions save heat; a restarted session admits on first touch") {
    val tmp = java.nio.file.Files.createTempFile("graft-heat", ".snapshot")
    java.nio.file.Files.delete(tmp) // saveHeat creates it
    val sql = "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1"
    def session() = {
      val s = spark.newSession()
      s.conf.set("spark.graft.heatPath", tmp.toString)
      s.conf.set("spark.graft.scanMode", "hybrid")
      s
    }
    val s1 = session()
    try {
      // two queries: miss (pushdown) then hot admission — and a snapshot
      // after each, carrying the access counters forward
      (1 to 2).foreach(_ => Engine.executeQuery(s1, sfDir, sql).collect())
      assert(java.nio.file.Files.isRegularFile(tmp), "saveHeat must write")
      val text = new String(java.nio.file.Files.readAllBytes(tmp))
      assert(text.contains("seen.miss|orders|"),
        s"snapshot must carry the access heat:\n$text")
      assert(HybridScan.segmentCache(s1, sfDir).keys.nonEmpty,
        "the second access earns admission (hotAdmitAfter=2)")
    } finally HybridScan.segmentCache(s1, sfDir).invalidateAll()
    // a RESTARTED session: its own empty cache, but seeded heat — the
    // FIRST access continues the counter past the threshold and admits
    // immediately, where a cold session would pay two pushdown passes
    val s2 = session()
    try {
      assert(HybridScan.segmentCache(s2, sfDir).keys.isEmpty)
      Engine.executeQuery(s2, sfDir, sql).collect()
      assert(HybridScan.segmentCache(s2, sfDir).keys.nonEmpty,
        "a seeded session must admit the known-hot set on FIRST access")
    } finally {
      HybridScan.segmentCache(s2, sfDir).invalidateAll()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  test("an aged snapshot is discarded; a fresh one still pre-routes") {
    // r12 verdict item 5: the dir header guards the wrong-dataset case,
    // not the stale-same-dataset case — a week-old snapshot would seed
    // service EWMAs and pullup costs as if fresh, and seeds ANCHOR
    // (seedHeat fills unmeasured slots only). Past
    // spark.graft.heatMaxAgeMs the loader must discard, not discount:
    // a cold start converges on live measurements.
    val donor = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 2e6,
      initialPullupEstNanos = 3e9)
    def snapshotAt(writtenAtMs: Long): java.nio.file.Path = {
      val tmp = java.nio.file.Files.createTempFile("graft-heat-age", ".snap")
      java.nio.file.Files.write(tmp,
        (s"dir=$sfDir\nwritten_at_ms=$writtenAtMs\n" + donor.heatSnapshot)
          .getBytes("UTF-8"))
      tmp
    }
    def routerSeededFrom(p: java.nio.file.Path,
        maxAgeMs: Option[Long] = None): AdaptiveScanRouter = {
      val s = spark.newSession()
      s.conf.set("spark.graft.heatPath", p.toString)
      maxAgeMs.foreach(v => s.conf.set("spark.graft.heatMaxAgeMs", v.toString))
      try HybridScan.sessionRouter(s, sfDir)
      finally HybridScan.segmentCache(s, sfDir).invalidateAll()
    }
    val fresh = snapshotAt(System.currentTimeMillis())
    val aged = snapshotAt(System.currentTimeMillis() - 8L * 24 * 3600 * 1000)
    try {
      assert(routerSeededFrom(fresh).estimates == (2e6, 3e9),
        "a fresh snapshot must seed the EWMAs")
      assert(routerSeededFrom(aged).estimates == (0.0, 0.0),
        "a snapshot older than the (default 7d) max age must be discarded")
      // the age bound is configurable: the same aged snapshot seeds when
      // the session allows a longer horizon
      assert(routerSeededFrom(aged,
        maxAgeMs = Some(30L * 24 * 3600 * 1000)).estimates == (2e6, 3e9),
        "spark.graft.heatMaxAgeMs must govern the age gate")
      // saveHeat itself stamps the header, so round-tripped snapshots
      // age correctly without any caller cooperation
      val s = spark.newSession()
      val out = java.nio.file.Files.createTempFile("graft-heat-stamp", ".snap")
      java.nio.file.Files.delete(out)
      try {
        s.conf.set("spark.graft.heatPath", out.toString)
        HybridScan.saveHeat(s, sfDir, force = true)
        val text = new String(java.nio.file.Files.readAllBytes(out))
        assert(text.linesIterator.exists(_.startsWith("written_at_ms=")),
          s"saveHeat must stamp the written-at header:\n$text")
      } finally {
        java.nio.file.Files.deleteIfExists(out)
        HybridScan.segmentCache(s, sfDir).invalidateAll()
      }
      // an IDLE session must not launder age: seed from a mid-life
      // snapshot, measure NOTHING, force-save (the shell-exit path) —
      // the re-written snapshot must carry the SEED's timestamp, not
      // now, or daily idle sessions would re-stamp a dead snapshot
      // fresh forever (r13 review)
      val midAge = System.currentTimeMillis() - 3L * 24 * 3600 * 1000
      val midSnap = snapshotAt(midAge)
      val s2 = spark.newSession()
      try {
        s2.conf.set("spark.graft.heatPath", midSnap.toString)
        HybridScan.sessionRouter(s2, sfDir) // seeds (3d < 7d default)
        HybridScan.saveHeat(s2, sfDir, force = true)
        val text = new String(java.nio.file.Files.readAllBytes(midSnap))
        val stamp = text.linesIterator
          .find(_.startsWith("written_at_ms=")).get
          .stripPrefix("written_at_ms=").toLong
        assert(stamp == midAge,
          s"an idle round-trip must preserve the seed stamp: $stamp vs $midAge")
      } finally {
        java.nio.file.Files.deleteIfExists(midSnap)
        HybridScan.segmentCache(s2, sfDir).invalidateAll()
      }
    } finally {
      java.nio.file.Files.deleteIfExists(fresh)
      java.nio.file.Files.deleteIfExists(aged)
    }
  }

  test("a header-less (pre-r13) snapshot stamps the file's mtime, not 0") {
    // r13 ADVICE: an idle session seeding from a legacy header-less
    // snapshot and force-saving at shell exit rewrote written_at_ms=0 —
    // merely opening and closing the shell once discarded history that
    // may in fact be fresh. The file's mtime (captured at load) is the
    // honest fallback: a FRESH legacy snapshot round-trips as fresh; an
    // ANCIENT one still ages out via the same mtime.
    val donor = new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU),
      pushdownSlots = 1, initialPushdownEstNanos = 2e6,
      initialPullupEstNanos = 3e9)
    val legacy = java.nio.file.Files.createTempFile("graft-heat-legacy", ".snap")
    java.nio.file.Files.write(legacy, donor.heatSnapshot.getBytes("UTF-8"))
    val mtime = java.nio.file.Files.getLastModifiedTime(legacy).toMillis
    val s = spark.newSession()
    try {
      s.conf.set("spark.graft.heatPath", legacy.toString)
      val r = HybridScan.sessionRouter(s, sfDir)
      assert(r.estimates == (2e6, 3e9),
        "a fresh header-less snapshot must still seed")
      assert(r.seedStampMs.contains(mtime),
        s"the seed stamp must be the file's mtime: ${r.seedStampMs} vs $mtime")
      // the idle force-save (shell-exit path) must preserve that stamp
      HybridScan.saveHeat(s, sfDir, force = true)
      val text = new String(java.nio.file.Files.readAllBytes(legacy))
      val stamp = text.linesIterator
        .find(_.startsWith("written_at_ms=")).get
        .stripPrefix("written_at_ms=").toLong
      assert(stamp == mtime,
        s"an idle round-trip of a legacy snapshot must stamp its mtime, " +
        s"not 0 and not now: $stamp vs $mtime")
      // and a RELOAD of the re-written snapshot still seeds (fresh mtime)
      val s2 = spark.newSession()
      try {
        s2.conf.set("spark.graft.heatPath", legacy.toString)
        assert(HybridScan.sessionRouter(s2, sfDir).estimates == (2e6, 3e9),
          "the round-tripped legacy snapshot must remain loadable")
      } finally HybridScan.segmentCache(s2, sfDir).invalidateAll()
      // an ANCIENT header-less snapshot ages out on its mtime
      val old = java.nio.file.Files.createTempFile("graft-heat-old", ".snap")
      java.nio.file.Files.write(old, donor.heatSnapshot.getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(old,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
      val s3 = spark.newSession()
      try {
        s3.conf.set("spark.graft.heatPath", old.toString)
        assert(HybridScan.sessionRouter(s3, sfDir).estimates == (0.0, 0.0),
          "an 8-day-old header-less snapshot must be discarded via mtime")
      } finally {
        java.nio.file.Files.deleteIfExists(old)
        HybridScan.segmentCache(s3, sfDir).invalidateAll()
      }
    } finally {
      java.nio.file.Files.deleteIfExists(legacy)
      HybridScan.segmentCache(s, sfDir).invalidateAll()
    }
  }

  test("shell \\heat prints router state and saves the snapshot") {
    val tmp = java.nio.file.Files.createTempFile("graft-heat-shell", ".snap")
    java.nio.file.Files.delete(tmp)
    val s = spark.newSession()
    val out = new java.io.ByteArrayOutputStream
    def run(cmd: String): String = {
      out.reset()
      assert(Console.withOut(new java.io.PrintStream(out))(
        Shell.runStatement(s, sfDir, cmd)), s"$cmd failed: $out")
      out.toString
    }
    try {
      val bare = run("\\heat")
      assert(bare.contains("service estimates") &&
        bare.contains("unset (heat dies with the session)"), bare)
      // save without a path errors loudly, never writes
      assert(run("\\heat save").contains("error"), "pathless save must refuse")
      s.conf.set("spark.graft.heatPath", tmp.toString)
      assert(run("\\heat save").contains("saved"))
      assert(java.nio.file.Files.isRegularFile(tmp), "\\heat save must write")
      assert(run("\\heat").contains(tmp.toString), "state must show the path")
    } finally {
      try s.conf.unset("spark.graft.heatPath") catch { case _: Throwable => () }
      java.nio.file.Files.deleteIfExists(tmp)
      HybridScan.segmentCache(s, sfDir).invalidateAll()
    }
  }
}
