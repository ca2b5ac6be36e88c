package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.cache.{HybridScan, LRU, SegmentCache}
import graft.sources.Tables

/** Dev probe: the reference's headline comparison (hybrid caching +
  * pushdown vs either alone — FlexPushdownDB's fig-1 claim), re-measured
  * on the Spark build at sf0.1.
  *
  * Three executions of TPC-H Q6:
  *  - PUSHDOWN: plain parquet scan, predicate pushed, all 4 columns read
  *    from storage every run;
  *  - PULLUP (warm): all 4 columns cache-resident, filter compute-side,
  *    zero storage reads;
  *  - HYBRID (warm): 3 columns cache-resident, ONLY `l_shipdate` read
  *    from storage (predicate pushed there), ordinal zip.
  *
  * Reported per mode: min seconds over `runs`, plus the final run's scan
  * row count (rows decoded from storage — the pruning/IO story; at 100 TB
  * bytes-from-storage is the cost model, and hybrid's point is that the
  * fetch column's bytes are the ONLY storage bytes).
  */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    // replication factor (the d20/rolling-hash discipline): the stock SF
    // is decode-trivial on local NVMe, so replicate until storage decode
    // is a measurable cost and report the regime honestly
    val repl = sys.env.getOrElse("SPARK_GRAFT_HYBRID_REPL", "1").toInt
    // part-file count of the replicated copy: the zip key is the metadata
    // file path, so the file-count axis (not just bytes) is the scale
    // variable the r10 rework is graded on — probe at 64+
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_HYBRID_FILES", "8").toInt
    val spark = GraftSession.get("graft-profile-hybrid")
    spark.sparkContext.setLogLevel("ERROR")
    val planTap = graft.util.ScanStats.attachPlans(spark)

    val sfDir =
      if (repl <= 1) srcDir
      else {
        val out = graft.sources.Fixtures.path(srcDir, s"hybrid_repl_x${repl}_f$nFiles")
        graft.sources.Fixtures.ensure(spark, s"$out/lineitem.parquet") {
          val base = Tables.lineitem(spark, srcDir)
          (1 to repl).map(_ => base).reduce(_ unionByName _)
            .repartition(nFiles).write.mode("overwrite")
            .parquet(s"$out/lineitem.parquet")
        }
        println(s"replicated lineitem x$repl ($nFiles files) at $out")
        out
      }

    val pred = expr(
      "l_shipdate >= date '1996-01-01' and l_shipdate < date '1997-01-01'")
    val post = col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24
    def agg(df: DataFrame): DataFrame =
      df.agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))

    def pushdown(): DataFrame =
      agg(Tables.lineitem(spark, sfDir).filter(pred).filter(post))

    val pullupCache = new SegmentCache(4L << 30, LRU)
    def pullup(): DataFrame = {
      val seg = pullupCache.get(
        graft.cache.SegmentKey("lineitem",
          Seq("l_extendedprice", "l_discount", "l_quantity", "l_shipdate"))) {
        Tables.lineitem(spark, sfDir)
          .select("l_extendedprice", "l_discount", "l_quantity", "l_shipdate")
      }
      agg(seg.filter(pred).filter(post))
    }

    val hybridCache = new SegmentCache(4L << 30, LRU)
    def hybrid(): DataFrame =
      agg(HybridScan.mergedScan(spark, sfDir, "lineitem",
        cachedCols = Seq("l_extendedprice", "l_discount", "l_quantity"),
        fetchCols = Seq("l_shipdate"), fetchPredicate = Some(pred),
        cache = hybridCache).filter(post))

    // warm each mode once, then time; pushdown has no warm state beyond
    // the OS page cache, which all three share equally
    var times = Map.empty[String, Double]
    def run(label: String, mk: () => DataFrame): Unit = {
      mk().write.format("noop").mode("overwrite").save()
      val rs = (1 to runs).map { i =>
        if (i == runs) planTap.reset()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val (files, bytes, rows) = planTap.snapshot()
      times += label -> rs.min
      println(f"$label%-9s min=${rs.min}%6.3f s  runs=${rs.map(r => f"$r%.3f").mkString("[", ", ", "]")}  " +
        s"storage(final run): files=$files bytes=$bytes rows_decoded=$rows")
    }

    run("pushdown", pushdown _)
    run("pullup", pullup _)
    run("hybrid", hybrid _)
    println(f"hybrid vs pushdown: ${times("pushdown") / times("hybrid")}%.2fx; " +
      f"pullup vs pushdown: ${times("pushdown") / times("pullup")}%.2fx")

    pullupCache.invalidateAll(); hybridCache.invalidateAll()
    spark.stop()
  }
}
