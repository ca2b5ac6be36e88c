package graft

import graft.cache.{MeasuredWLFU, SegmentCache, SegmentKey}
import graft.sources.Tables

/** Driver-run benchmark: every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, one JSON line on stdout.
  *
  * Methodology:
  *  - the tuned engine session (AQE, runtime bloom filters, shuffle
  *    partitions = cores) — the config a cluster deployment would run;
  *  - results sink to the `noop` datasource: every output column is fully
  *    materialized (a bare `count()` would let Catalyst prune the very
  *    work being measured) without collect() driver pressure;
  *  - one untimed warmup query first, so JVM/codegen/scan initialization
  *    isn't billed to whichever query happens to run first;
  *  - a mode-comparison pass (the reference benches PULLUP vs
  *    CACHING_ONLY, `fpdb-plan/include/fpdb/plan/Mode.h:13-18`; promised
  *    in BASELINE.md): the scan-heavy base tables are warmed through
  *    [[SegmentCache]] (persist() registers the segment with Spark's
  *    CacheManager, which substitutes the in-memory columnar relation
  *    into ANY plan-equal scan), then the single-table entries re-run
  *    unchanged — cold vs warmed wall-times both reported.
  *
  * Output size contract: the driver keeps only the LAST ~2000 chars of
  * the run's output, so the JSON line must stay under that with room for
  * the sbt epilogue (round-2 bench lost its per-query record to exactly
  * this truncation). The line therefore uses the entry-name prefix before
  * the first underscore as the query key ("q04" for "q04_join_topk" —
  * unique across the suite by construction) and 3-decimal seconds; the
  * full-name, full-precision record is written to `BENCH_DETAIL.json`.
  */
object Bench {

  private def shortKey(n: String): String = n.takeWhile(_ != '_')

  /** Locale-independent numeric format: JSON needs '.'-decimals, but
    * `"%.3f".format(v)` follows the default locale (comma-decimal on e.g.
    * de_DE → unparseable output), so every number goes through ROOT. */
  private def fmt(dp: Int, v: Double): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

  private def jmap(kvs: Seq[(String, Double)], dp: Int): String =
    kvs.map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) }
      .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench") // cpus from SPARK_GRAFT_CPUS
    // keep the driver-captured tail clean: INFO/WARN chatter (and
    // shutdown-hook logging) otherwise competes with the JSON line for
    // the ~2000-char capture window
    spark.sparkContext.setLogLevel("ERROR")

    def runToNoop(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup: small scan + join + agg touches codegen, parquet
    // reader, shuffle, and broadcast machinery once
    try SparkEntry.queries("q05_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // optional args: run only the named queries (dev loop for targeted
    // timings; skips the mode-comparison pass)
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
                 else args.toSeq.filter(SparkEntry.queries.contains)
    val results = wanted.map(n => n -> runToNoop(n))

    // ---- mode comparison: cold (storage scan) vs warmed (SegmentCache) --
    // The local analog of the reference's PULLUP vs CACHING_ONLY: cold
    // drops the OS page cache before each entry so the scan is a real
    // storage read (standing in for the reference's S3 fetch); warm runs
    // the SAME entries against SegmentCache-resident segments (JVM
    // memory, immune to the page-cache drop). Whole-table segments:
    // column pruning still applies at the InMemoryRelation scan, so one
    // segment serves every projection of the table. MeasuredWLFU loads
    // eagerly and records the load wall-time as the eviction weight.
    // Dropping /proc/sys/vm/drop_caches evicts EVERY process's page cache —
    // a host-wide side effect — so it is opt-in (SPARK_GRAFT_DROP_CACHES=1);
    // the default path only warns that "cold" times are page-cached.
    val dropEnabled = sys.env.get("SPARK_GRAFT_DROP_CACHES").contains("1")
    def dropPageCache(): Unit =
      if (!dropEnabled)
        System.err.println("[bench] page-cache drop disabled (set SPARK_GRAFT_DROP_CACHES=1); cold times are page-cached")
      else try java.nio.file.Files.write(
        java.nio.file.Paths.get("/proc/sys/vm/drop_caches"), "3\n".getBytes)
      catch { case e: Throwable =>
        System.err.println(s"[bench] page-cache drop unavailable ($e); cold times are page-cached") }
    // single-table scan-bound entries over the two largest tables — the
    // shapes where segment residency is the dominant term. Single timed
    // run per mode: a cold state cannot be re-entered reliably (a host
    // layer below the guest page cache serves re-reads), so the first
    // access after the drop IS the cold measurement.
    val modeEntries = Seq("q01_group_agg", "q03_filter_project", "q14_topk",
      "q16_date_ops", "t02_quality")
      .filter(SparkEntry.queries.contains)
    val (cold, warm, loads) = if (args.nonEmpty) (Nil, Nil, Nil) else {
      val cold = modeEntries.map { n => dropPageCache(); n -> runToNoop(n) }
      val cache = new SegmentCache(4L << 30, MeasuredWLFU)
      dropPageCache() // the warm-up load pays the storage read, once
      val loads = Seq("lineitem", "documents").map { t =>
        val t0 = System.nanoTime()
        val df = Tables.load(spark, sfDir, t)
        cache.get(SegmentKey(t, df.columns.toSeq))(df)
        t -> (System.nanoTime() - t0) / 1e9
      }
      dropPageCache() // prove warm runs never touch storage
      val warm = modeEntries.map(n => n -> runToNoop(n))
      cache.invalidateAll()
      (cold, warm, loads)
    }

    val total = results.map(_._2).filter(_ >= 0).sum
    val sfName = new java.io.File(sfDir).getName

    // full-precision, full-name record for humans and round-over-round diffs
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",
         |"queries":${results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")},
         |"modes":{"cold":${cold.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")},
         |"warm":${warm.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")},
         |"warm_load":${loads.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")}}}""".stripMargin
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }

    // the driver-captured line: short keys, reduced precision, one line
    def line(dp: Int): String = {
      val qs = jmap(results.map { case (k, v) => shortKey(k) -> v }, dp)
      val modes = if (warm.isEmpty) "" else
        s""","modes":{"cold":${jmap(cold.map { case (k, v) => shortKey(k) -> v }, dp)},"warm":${jmap(warm.map { case (k, v) => shortKey(k) -> v }, dp)}}"""
      s"""{"metric":"total","value":${fmt(dp, total)},"unit":"sec","queries":$qs$modes,"sf":"$sfName","keys":"prefix; full map in BENCH_DETAIL.json"}"""
    }
    val out = Seq(3, 2, 1).map(line).find(_.length <= 1800).getOrElse(line(1))
    // stop Spark BEFORE printing: the driver keeps the tail of the output
    // and recognizes the result by "line starts with '{'", so shutdown
    // log lines must not trail (or displace) the JSON line. A failing
    // stop() must not cost the record — the measurements exist either way.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] stop failed: $e") }
    println(out)
    System.out.flush()
  }
}
