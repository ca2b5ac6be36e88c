package graft.tools

import graft.GraftSession
import graft.cache.{HybridScan, LRU, SegmentCache}
import graft.cache.HybridScan.{AdaptiveScanRouter, ModeCachingOnly, ModeHybrid, ScanMode}
import graft.operators.SsbCorpus
import graft.plans.ModeExec
import graft.sources.MockObjectFs

/** Dev probe: CACHE-CAPACITY sweep on the simulated store — the
  * reference's other headline figure. "Caching wins" (ProfileStoreModes)
  * is true only while the working set fits; the reference's argument for
  * HYBRID is the middle of the curve, where capacity covers SOME columns
  * of SOME tables and per-column assembly lets a partial fit still pay.
  *
  * For each capacity, the SSB family runs twice (cold then warm — the
  * warm pass is the measured row, cold is admission work) under
  * CACHING_ONLY and HYBRID, on throttled mockfs
  * (`SPARK_GRAFT_STORE_MBPS`, default 8 MB/s; 5 ms/GET). Routers are
  * fresh per pass but the mode's cache persists across its two passes,
  * so hybrid's miss-admission/zip-promotion loop and caching's
  * load-on-miss both get exactly one warming opportunity. Expected
  * shape: at large capacity both converge to ~zero warm bytes; as
  * capacity shrinks, caching falls off a cliff (full segments refused or
  * thrashed → every query re-pulls), while hybrid degrades toward
  * pushdown gradually (whatever still fits keeps serving, the rest
  * pushes down with predicate + projection at storage).
  */
object ProfileCacheSweep {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mbps = sys.env.getOrElse("SPARK_GRAFT_STORE_MBPS", "8").toLong
    val caps = sys.env.getOrElse("SPARK_GRAFT_SWEEP_CAPS_MB", "1,4,16,1024")
      .split(",").map(_.trim.toLong).toSeq
    // lru = lazy loads, stats-priced candidates (r10's sweep); mwlfu =
    // eager loads with MEASURED-byte admission — the lever the r10 sweep
    // identified (zip-capable segments were refused at capacities their
    // real bytes fit because non-CBO stats multiply join children)
    val policyName = sys.env.getOrElse("SPARK_GRAFT_SWEEP_POLICY", "lru")
    // `SPARK_GRAFT_CORPUS`: ssb (default) or tpch — the capacity
    // crossover is workload-shaped (repetition earns residency), so the
    // sweep must be runnable on the reference's other family too
    val corpus: Seq[String] =
      sys.env.getOrElse("SPARK_GRAFT_CORPUS", "ssb") match {
        case "ssb"  => SsbCorpus.names.map(SsbCorpus.sql)
        case "tpch" => graft.operators.TpchCorpus.ids
          .map(graft.operators.TpchCorpus.sql)
        case other  => sys.error(s"unknown SPARK_GRAFT_CORPUS '$other'")
      }
    // parsePolicy fails loudly on a bad value — the session confs' rule;
    // a typo must not run the whole sweep under LRU while the report
    // header prints the requested name
    def newPolicy(): graft.cache.CachePolicy = HybridScan.parsePolicy(policyName)
    val spark = GraftSession.get("graft-profile-cache-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockObjectFs].getName)
    val dir = s"mockfs:$srcDir"

    // JIT warmup, unthrottled (same discipline as ProfileStoreModes)
    locally {
      val c = new SegmentCache(1L << 30, LRU)
      corpus.foreach { sql =>
        ModeExec.runQueryMode(spark, dir, sql,
          HybridScan.ModePushdownOnly,
          new AdaptiveScanRouter(c, pushdownSlots = 64))(
          _.write.format("noop").mode("overwrite").save())
      }
      c.invalidateAll()
    }

    def pass(mode: ScanMode, cache: SegmentCache): (Double, Double, AdaptiveScanRouter) = {
      val router = new AdaptiveScanRouter(cache, pushdownSlots = 64)
      MockObjectFs.reset()
      MockObjectFs.bytesPerSec = mbps << 20
      MockObjectFs.openLatencyMs = 5
      val t0 = System.nanoTime()
      try corpus.foreach { sql =>
        ModeExec.runQueryMode(spark, dir, sql, mode, router)(
          _.write.format("noop").mode("overwrite").save())
      } finally {
        MockObjectFs.bytesPerSec = 0L
        MockObjectFs.openLatencyMs = 0L
      }
      ((System.nanoTime() - t0) / 1e9, MockObjectFs.bytesRead.get / 1e6, router)
    }

    println(s"cache-capacity sweep on $dir (per-stream $mbps MB/s, 5 ms/GET, " +
      s"policy=$policyName; warm-pass seconds / store MB)")
    for (capMb <- caps) {
      val row = Seq(ModeCachingOnly, ModeHybrid).map { mode =>
        val cache = new SegmentCache(capMb << 20, newPolicy())
        try {
          pass(mode, cache) // cold: admissions happen here
          val (secs, mb, r) = pass(mode, cache)
          f"${mode.name}: $secs%6.2f s /${mb}%7.1f MB " +
            f"(pd=${r.pushdowns} pu=${r.pullups} co=${r.cacheOnlys} hy=${r.hybrids}, " +
            f"evictions=${cache.evictions})"
        } finally cache.invalidateAll()
      }
      println(f"cap=$capMb%5d MB  ${row.mkString("  |  ")}")
    }
    spark.stop()
  }
}
