package graft

import org.apache.spark.sql.DataFrame
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
  *  - each entry runs SPARK_GRAFT_BENCH_RUNS times (default 3) and
  *    reports the per-entry MEDIAN — single-shot numbers swung 118–157 s
  *    whole-suite on this host, making regressions unjudgeable. All runs
  *    are recorded in BENCH_DETAIL.json (an entry whose run 1 builds a
  *    shared family artifact is visibly slower there than its median);
  *  - session artifacts (dup groups, IVF/PQ indexes, semantic-dup sets)
  *    are RELEASED at every family boundary (d* → ev* → h* …, and before
  *    the mode pass) via [[graft.util.SessionCache.releaseAll]]:
  *    artifacts pinned for the whole suite were measured evicting
  *    working memory out from under unrelated late-suite entries
  *    (q03 0.34→1.7 s round-over-round with an identical plan). On a
  *    cluster the same release keeps finished pipelines from squatting
  *    on executor storage;
  *  - a mode-comparison pass (the reference benches PULLUP vs
  *    CACHING_ONLY, `fpdb-plan/include/fpdb/plan/Mode.h:13-18`; promised
  *    in BASELINE.md): scan-heavy base tables are warmed through
  *    [[SegmentCache]] (persist() registers the segment with Spark's
  *    CacheManager, which substitutes the in-memory columnar relation
  *    into ANY plan-equal scan), then the same entries re-run unchanged —
  *    cold vs warmed wall-times both reported. The pass also includes a
  *    DERIVED-projection segment (16-way minhash signatures over
  *    documents): its recompute is CPU-bound, so the cache win is visible
  *    even when the OS page cache hides the storage read — the VLDB'21
  *    claim that a hit saves the whole scan+compute path, not just the
  *    fetch, demonstrated in numbers (warm ≥ 2× cold).
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

  /** Family = the alphabetic entry-name prefix ("d" for d08, "ev" for
    * ev03): entries of one family share session artifacts; a family
    * boundary is where those artifacts die. */
  private def family(n: String): String = n.takeWhile(!_.isDigit)

  /** Locale-independent numeric format: JSON needs '.'-decimals, but
    * `"%.3f".format(v)` follows the default locale (comma-decimal on e.g.
    * de_DE → unparseable output), so every number goes through ROOT. */
  private def fmt(dp: Int, v: Double): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

  private def jmap(kvs: Seq[(String, Double)], dp: Int): String =
    kvs.map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) }
      .mkString("{", ",", "}")

  /** Lower median of the successful runs; -1 if none succeeded. */
  private def median(xs: Seq[Double]): Double = {
    val ok = xs.filter(_ >= 0).sorted
    if (ok.isEmpty) -1.0 else ok((ok.size - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = GraftSession.get("graft-bench") // cpus from SPARK_GRAFT_CPUS
    // keep the driver-captured tail clean: INFO/WARN chatter (and
    // shutdown-hook logging) otherwise competes with the JSON line for
    // the ~2000-char capture window
    spark.sparkContext.setLogLevel("ERROR")

    def timeNoop(df: => DataFrame, label: String): Double = {
      val t0 = System.nanoTime()
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $label failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    def runToNoop(name: String): Double =
      timeNoop(SparkEntry.queries(name)(spark, sfDir), name)

    // untimed warmup: small scan + join + agg touches codegen, parquet
    // reader, shuffle, and broadcast machinery once
    try SparkEntry.queries("q05_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // optional args: run only the named queries (dev loop for targeted
    // timings; skips the mode-comparison pass)
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
                 else args.toSeq.filter(SparkEntry.queries.contains)

    var lastFamily = ""
    val allRuns: Seq[(String, Seq[Double])] = wanted.map { n =>
      if (family(n) != lastFamily) {
        graft.util.SessionCache.releaseAll(spark)
        lastFamily = family(n)
      }
      n -> (1 to benchRuns).map(_ => runToNoop(n))
    }
    graft.util.SessionCache.releaseAll(spark)
    val results = allRuns.map { case (n, rs) => n -> median(rs) }

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

    // The derived-projection segment: the TF-IDF top-terms table — an
    // expensive derived artifact (two corpus aggregations + join + window)
    // that several text-pipeline consumers share, the segment shape whose
    // cache win does NOT depend on dropping the page cache: cold pays the
    // whole recompute, warm reads the in-memory columnar relation. This is
    // where MeasuredWLFU's measured load weight means something — the
    // segment's benefit-per-hit is its ~10× recompute cost.
    val DerivedEntry = "dm01_tfidf_segment"
    def derivedFrame(): DataFrame =
      SparkEntry.queries("t07_tfidf")(spark, sfDir)

    // single-table scan-bound entries over the largest tables — the
    // shapes where segment residency is the dominant term — plus the
    // derived-projection entry. Single timed run per mode: a cold state
    // cannot be re-entered reliably (a host layer below the guest page
    // cache serves re-reads), so the first access after the drop IS the
    // cold measurement.
    val modeEntries = (Seq("q01_group_agg", "q03_filter_project",
      "q13_sort_multi", "q14_topk", "q16_date_ops",
      "t01_token_count", "t02_quality", "t03_langid")
      .filter(SparkEntry.queries.contains)) :+ DerivedEntry
    def modeRun(n: String): Double =
      if (n == DerivedEntry) timeNoop(derivedFrame(), n) else runToNoop(n)

    val (cold, warm, loads) = if (args.nonEmpty) (Nil, Nil, Nil) else {
      val cold = modeEntries.map { n => dropPageCache(); n -> modeRun(n) }
      val cache = new SegmentCache(4L << 30, MeasuredWLFU)
      dropPageCache() // the warm-up load pays the storage read, once
      val loads = Seq("lineitem", "documents").map { t =>
        val t0 = System.nanoTime()
        val df = Tables.load(spark, sfDir, t)
        cache.get(SegmentKey(t, df.columns.toSeq))(df)
        t -> (System.nanoTime() - t0) / 1e9
      } :+ {
        val t0 = System.nanoTime()
        cache.get(SegmentKey(DerivedEntry, derivedFrame().columns.toSeq))(derivedFrame())
        DerivedEntry -> (System.nanoTime() - t0) / 1e9
      }
      dropPageCache() // prove warm runs never touch storage
      val warm = modeEntries.map(n => n -> modeRun(n))
      cache.invalidateAll()
      (cold, warm, loads)
    }

    val total = results.map(_._2).filter(_ >= 0).sum
    // per-run suite totals — the round-over-round variance record
    val runTotals = (0 until benchRuns).map { i =>
      allRuns.map(_._2(i)).filter(_ >= 0).sum
    }
    val sfName = new java.io.File(sfDir).getName

    // full-precision, full-name record for humans and round-over-round
    // diffs; `runs` holds every raw measurement (run 1 of an entry that
    // builds a shared family artifact pays the build — the median does
    // not hide it, it is right here)
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_runs":$benchRuns,
         |"run_totals":[${runTotals.mkString(",")}],
         |"queries":${results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")},
         |"runs":${allRuns.map { case (k, rs) => "\"" + k + "\":[" + rs.mkString(",") + "]" }.mkString("{", ",", "}")},
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
      s"""{"metric":"total","value":${fmt(dp, total)},"unit":"sec","n_runs":$benchRuns,"run_totals":[${runTotals.map(fmt(dp, _)).mkString(",")}],"queries":$qs$modes,"sf":"$sfName","keys":"prefix; per-run detail in BENCH_DETAIL.json"}"""
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
