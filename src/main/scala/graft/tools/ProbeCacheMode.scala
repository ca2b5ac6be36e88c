package graft.tools

import graft._
import graft.cache.{MeasuredWLFU, SegmentCache, SegmentKey}
import graft.sources.Tables

/** One-off dev probe: does a SegmentCache-persisted table substitute into
  * an unrelated plan-equal scan, and which entries actually speed up? */
object ProbeCacheMode {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-probe")
    def t(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val entries = Seq("q01_group_agg", "q03_filter_project", "q14_topk", "q20_cond_agg",
      "q35_percentiles", "t01_token_count", "t02_quality", "t03_langid", "t05_boilerplate")
    entries.foreach(t) // warm JVM + OS cache
    val cold = entries.map(n => n -> Seq(t(n), t(n)).min)
    val cache = new SegmentCache(8L << 30, MeasuredWLFU)
    Seq("lineitem", "documents").foreach { tb =>
      val df = Tables.load(spark, sfDir, tb)
      cache.get(SegmentKey(tb, df.columns.toSeq))(df)
    }
    val plan = SparkEntry.queries("q01_group_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    println("SUBSTITUTED=" + plan.contains("InMemoryTableScan"))
    val warm = entries.map(n => n -> Seq(t(n), t(n)).min)
    cold.zip(warm).foreach { case ((n, c), (_, w)) =>
      println(f"$n%-22s cold=$c%6.3f warm=$w%6.3f ${if (w < c) "WIN" else "lose"}")
    }
    cache.invalidateAll()
    spark.stop()
  }
}
