package graft.tools

import org.apache.spark.sql.functions.{col, count => fCount, lit}

import graft.GraftSession
import graft.cache.{HybridScan, LRU, MeasuredWLFU, SegmentCache}
import graft.cache.HybridScan.{AdaptiveScanRouter, ModeHybrid, ModePushdownOnly}
import graft.sources.MockObjectFs

/** Dev probe for the r13 partition_router bench fixture rescale (r12
  * verdict item 6): drives the bench block's pass sequence — hot 5-day
  * cold/admit/warm, then the 15-day wide span hybrid vs cache-less
  * pushdown — over the scaled partitioned copy, THROUGH THE BENCH'S OWN
  * throttle bracket ([[graft.Bench.throttledPass]]: per-stream MBPS env,
  * 5 ms GET, aggregate cap) so the probe can never drift onto different
  * store physics than the numbers it stands in for (r13 review). Prints
  * secs + MB per pass so the "byte win shows in wall time" criterion is
  * checkable without a full bench run. */
object ProbePartitionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-probe-partition-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockObjectFs].getName)
    val t0 = System.nanoTime()
    val local = graft.sources.Layout.partitionedEventsScaled(spark, sfDir)
    println(f"fixture at $local (built/reused in ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    def du(f: java.io.File): Long = Option(f.listFiles())
      .map(_.map(x => if (x.isDirectory) du(x) else x.length()).sum)
      .getOrElse(0L)
    val tableBytes = du(new java.io.File(local))
    println(f"table bytes: ${tableBytes / 1e6}%.1f MB")
    val mpath = s"mockfs:$local"
    // same capacity rule and knobs as the bench block
    val cache = new SegmentCache(math.max(1L << 20, tableBytes), MeasuredWLFU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 64, hotAdmitAfter = 2)
    val totalMbps =
      sys.env.getOrElse("SPARK_GRAFT_STORE_TOTAL_MBPS", "4").toLong
    val cols = Seq("event_type", "value", "day")
    def window(lo: String, hi: String) =
      col("day") >= lit(lo).cast("date") && col("day") <= lit(hi).cast("date")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def pass(label: String, lo: String, hi: String, r: AdaptiveScanRouter,
        mode: HybridScan.ScanMode = ModeHybrid): Unit = {
      graft.Bench.throttledPass(out, "probe-partition", label, totalMbps) {
        val lease = r.scanPartitionedMode(spark, mpath, "events_by_day",
          cols, window(lo, hi), "day", mode)
        try lease.df.groupBy(col("event_type"))
          .agg(fCount(lit(1)), org.apache.spark.sql.functions.sum(col("value")))
          .write.format("noop").mode("overwrite").save()
        finally lease.close()
      }
      val secs = out.find(_._1 == label).map(_._2).getOrElse(-1.0)
      val mb = out.find(_._1 == s"${label}_mb").map(_._2).getOrElse(-1.0)
      println(f"$label%-14s $secs%7.2f s  $mb%8.2f MB")
    }
    pass("hot_cold", "2024-01-05", "2024-01-09", router)
    pass("hot_admit", "2024-01-05", "2024-01-09", router)
    pass("hot_warm", "2024-01-05", "2024-01-09", router)
    println(s"days_resident=${cache.keys.count(_.region.nonEmpty)} " +
      s"table_segments=${cache.keys.count(_.region.isEmpty)}")
    pass("wide_hybrid", "2024-01-05", "2024-01-19", router)
    pass("wide_pushdown", "2024-01-05", "2024-01-19",
      new AdaptiveScanRouter(new SegmentCache(1L << 30, LRU), pushdownSlots = 64),
      ModePushdownOnly)
    cache.invalidateAll()
    spark.stop()
  }
}
