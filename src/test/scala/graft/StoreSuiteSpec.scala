package graft

import org.apache.spark.sql.DataFrame

import graft.operators.SsbCorpus
import graft.sources.{MockObjectFs, StoreScheme}

/** The reference's whole-suite discipline on the STORE scheme: its e2e
  * tests run entire SSB/TPC-H families against S3/MinIO, never a local
  * FS (`fpdb-main/test/`, `fpdb-aws/`). ModeExecSpec pins the 13 SSB
  * queries mode-invariant on `file:`; this suite pins them
  * scheme-invariant — every query planned and executed with the catalog
  * registered at `mockfs://`, rows equal to the `file:` run, and the
  * bytes demonstrably crossing the counted store boundary (a parity
  * test that silently fell back to `file:` reads would pass on rows;
  * the byte assertion makes that impossible). */
class StoreSuiteSpec extends SparkSpec {

  /** Deterministic row order; doubles formatted so accumulation-order
    * noise never decides the sort (ModeExecSpec's comparator). */
  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.map {
      case d: java.lang.Double => f"${d.doubleValue}%.3f"
      case x => String.valueOf(x)
    }.mkString("|"))

  private def assertRowsEqual(got: Seq[Seq[Any]], want: Seq[Seq[Any]],
      label: String): Unit = {
    assert(got.size == want.size, s"$label: ${got.size} rows vs ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      g.zip(w).foreach {
        case (a: java.lang.Double, b: java.lang.Double) =>
          val tol = 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
          assert(math.abs(a - b) <= tol, s"$label: $a vs $b in row $g vs $w")
        case (a, b) =>
          assert(String.valueOf(a) == String.valueOf(b), s"$label: $a vs $b in $g vs $w")
      }
    }
  }

  test("all 13 SSB queries are row-identical through the store scheme") {
    // one registration per dir: the whole family on file: first, then
    // the whole family on the store scheme (engine re-registers views
    // when the dir changes; interleaving would re-read footers 26×)
    val expect = SsbCorpus.names.map { n =>
      n -> rows(Engine.executeQuery(spark, sfDir, SsbCorpus.sql(n)))
    }
    val store = StoreScheme.mount(spark, sfDir)
    MockObjectFs.reset()
    val got = SsbCorpus.names.map { n =>
      n -> rows(Engine.executeQuery(spark, store, SsbCorpus.sql(n)))
    }
    expect.zip(got).foreach { case ((n, want), (_, have)) =>
      assertRowsEqual(have, want, s"SSB $n through mockfs")
    }
    // the family's reads really crossed the store boundary — GETs,
    // bytes, and at least one LIST (registration + 13 queries); exact
    // counts are codec/layout-dependent, existence is the contract
    val (opens, bytes, _, lists) = MockObjectFs.snapshot()
    assert(bytes > 0 && opens > 0 && lists > 0,
      s"SSB family must read through the scheme: opens=$opens bytes=$bytes lists=$lists")
  }

  test("streaming ingestion lists and reads through the store scheme") {
    // the d18/d19/s17 ingestion loops all start from a file-source
    // stream over an object store in production: FileStreamSource must
    // glob, list, and read its micro-batches through the scheme
    import org.apache.spark.sql.streaming.OutputMode
    val store = StoreScheme.mount(spark, sfDir)
    MockObjectFs.reset()
    val stream = graft.streaming.EventStream.readEventStream(spark, store)
    val q = graft.streaming.EventStream.streamingHourlyStats(stream)
      .writeStream.format("memory").queryName("store_hourly")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = rows(spark.table("store_hourly")
      .select("hour", "event_type", "n_events", "total_value"))
    val batch = rows(graft.streaming.EventStream
      .hourlyStats(graft.sources.Tables.events(spark, sfDir))
      .select("hour", "event_type", "n_events", "total_value"))
    assertRowsEqual(streamed, batch, "hourly stats streamed through mockfs")
    val (opens, bytes, _, lists) = MockObjectFs.snapshot()
    assert(bytes > 0 && opens > 0 && lists > 0,
      s"the stream must list and read through the scheme: " +
      s"opens=$opens bytes=$bytes lists=$lists")
  }

  test("fs entries execute through the scheme, not a file: fallback") {
    val dir = sfDir
    StoreScheme.mount(spark, dir)
    for (name <- Seq("fs01_store_scan", "fs02_store_hybrid", "fs03_store_suite")) {
      MockObjectFs.reset()
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
      val (_, bytes, _, _) = MockObjectFs.snapshot()
      assert(bytes > 0, s"$name must read its bytes through the store scheme")
    }
  }
}
