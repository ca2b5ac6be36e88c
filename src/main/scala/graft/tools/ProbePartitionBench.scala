package graft.tools

import org.apache.spark.sql.functions.{col, count => fCount, lit}

import graft.GraftSession
import graft.cache.{HybridScan, LRU, MeasuredWLFU, SegmentCache}
import graft.cache.HybridScan.{AdaptiveScanRouter, ModeHybrid, ModePushdownOnly}
import graft.sources.MockObjectFs

/** Dev probe for the r13 partition_router bench fixture rescale (r12
  * verdict item 6): drives the exact pass sequence the bench block runs
  * — hot 5-day cold/admit/warm, then the 15-day wide span hybrid vs
  * cache-less pushdown — over the ×64 scaled partitioned copy, with the
  * per-stream throttle AND the aggregate cap, printing secs + MB per
  * pass so the "byte win shows in wall time" criterion is checkable
  * without a full bench run. */
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
    println(f"table bytes: ${tableBytes / 1e6}%.1f MB; files: ${
      new java.io.File(local).listFiles().map(d =>
        Option(d.listFiles()).map(_.length).getOrElse(0)).sum}")
    val mpath = s"mockfs:$local"
    val cache = new SegmentCache(math.max(1L << 20, tableBytes), MeasuredWLFU)
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 64, hotAdmitAfter = 2)
    val cols = Seq("event_type", "value", "day")
    def window(lo: String, hi: String) =
      col("day") >= lit(lo).cast("date") && col("day") <= lit(hi).cast("date")
    def pass(label: String, lo: String, hi: String, r: AdaptiveScanRouter,
        mode: HybridScan.ScanMode = ModeHybrid): Unit = {
      MockObjectFs.reset()
      MockObjectFs.bytesPerSec = 2L << 20
      MockObjectFs.openLatencyMs = 5
      MockObjectFs.totalBytesPerSec =
        sys.env.getOrElse("SPARK_GRAFT_STORE_TOTAL_MBPS", "4").toLong << 20
      val t = System.nanoTime()
      try {
        val lease = r.scanPartitionedMode(spark, mpath, "events_by_day_bench",
          cols, window(lo, hi), "day", mode)
        try lease.df.groupBy(col("event_type"))
          .agg(fCount(lit(1)), org.apache.spark.sql.functions.sum(col("value")))
          .write.format("noop").mode("overwrite").save()
        finally lease.close()
      } finally {
        MockObjectFs.bytesPerSec = 0L
        MockObjectFs.openLatencyMs = 0L
        MockObjectFs.totalBytesPerSec = 0L
      }
      println(f"$label%-14s ${(System.nanoTime() - t) / 1e9}%7.2f s  ${
        MockObjectFs.bytesRead.get / 1e6}%8.2f MB  ${MockObjectFs.opens.get}%4d GETs")
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
