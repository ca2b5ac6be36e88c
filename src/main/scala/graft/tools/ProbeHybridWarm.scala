package graft.tools

import graft.GraftSession
import graft.cache.{HybridScan, LRU, SegmentCache}
import graft.cache.HybridScan.{AdaptiveScanRouter, ModeHybrid}
import graft.plans.ModeExec
import graft.sources.MockObjectFs

/** Dev probe for the r12 verdict's hybrid-warm finding: on the TPC-H
  * full-capacity throttled sweep, one recorded run showed hybrid WARM
  * wall-slower than its own cold pass (80.6 vs 58.5 s) while the
  * closing bench record showed the opposite (45.0 vs 61.8 s). This
  * isolates the two passes with PER-QUERY seconds, store bytes, and GET
  * counts, repeated N times back to back, so the structural cost (zip
  * exchanges, segment materialization) separates from host swing.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_STORE_MBPS (default 2),
  * SPARK_GRAFT_PROBE_RUNS (default 2).
  */
object ProbeHybridWarm {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mbps = sys.env.getOrElse("SPARK_GRAFT_STORE_MBPS", "2").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val spark = GraftSession.get("graft-probe-hybrid-warm")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockObjectFs].getName)
    val dir = s"mockfs:$srcDir"
    val corpus = graft.operators.TpchCorpus.ids
      .map(i => s"h$i" -> graft.operators.TpchCorpus.sql(i))

    // JIT/codegen warmup, unthrottled
    locally {
      val c = new SegmentCache(1L << 30, LRU)
      corpus.foreach { case (_, sql) =>
        ModeExec.runQueryMode(spark, dir, sql, HybridScan.ModePushdownOnly,
          new AdaptiveScanRouter(c, pushdownSlots = 64))(
          _.write.format("noop").mode("overwrite").save())
      }
      c.invalidateAll()
    }

    def pass(label: String, router: AdaptiveScanRouter): Double = {
      var total = 0.0
      corpus.foreach { case (n, sql) =>
        MockObjectFs.reset()
        MockObjectFs.bytesPerSec = mbps << 20
        MockObjectFs.openLatencyMs = 5
        val t0 = System.nanoTime()
        try ModeExec.runQueryMode(spark, dir, sql, ModeHybrid, router)(
          _.write.format("noop").mode("overwrite").save())
        finally {
          MockObjectFs.bytesPerSec = 0L; MockObjectFs.openLatencyMs = 0L
        }
        val secs = (System.nanoTime() - t0) / 1e9
        total += secs
        val (opens, bytes, _, _) = MockObjectFs.snapshot()
        println(f"$label $n%-4s ${secs}%6.2f s  ${bytes / 1e6}%7.2f MB  $opens%4d GETs" +
          f"  routes pd=${router.pushdowns} pu=${router.pullups}" +
          f" co=${router.cacheOnlys} hy=${router.hybrids}")
      }
      println(f"$label TOTAL ${total}%7.2f s")
      total
    }

    for (r <- 1 to runs) {
      val cache = new SegmentCache(1L << 30, LRU)
      HybridScan.mergedScan(spark, dir, "lineitem",
        cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
        fetchCols = Seq("l_shipdate"), fetchPredicate = None,
        cache = cache).count()
      val cold = pass(s"run$r cold", new AdaptiveScanRouter(cache, pushdownSlots = 64))
      val warm = pass(s"run$r warm", new AdaptiveScanRouter(cache, pushdownSlots = 64))
      println(f"run$r SUMMARY cold=$cold%.2f s warm=$warm%.2f s")
      cache.invalidateAll()
    }
    spark.stop()
  }
}
