package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cache.{HybridScan, LRU, SegmentCache, SegmentKey}
import graft.sources.MockObjectFs

/** FS-truth IO accounting through the instrumented `mockfs://` scheme.
  *
  * The engine's 100 TB story is a BYTES story — projection reads only
  * its columns' chunks, a resident segment reads nothing, a warm hybrid
  * scan pays only the fetch column — and until this spec those claims
  * were asserted at the PLAN level (`ScanStats.planScans` ReadSchema /
  * numFiles) because the task-metric `fs_bytes` counter is
  * measured-unreliable on local parquet (see [[graft.util.ScanStats]]).
  * [[graft.sources.MockObjectFs]] counts inside `open()`'s stream, the
  * level an object store bills at, so here the same claims are pinned as
  * actual byte counts crossing the storage boundary.
  *
  * Ratios, not absolutes: encoded column sizes shift with writer/codec
  * versions, so every assertion compares two measured scans with slack
  * rather than a hardcoded byte count.
  */
class StoreIoSpec extends SparkSpec {

  private val Cols = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")

  private lazy val base: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockObjectFs].getName)
    val tmp = java.nio.file.Files.createTempDirectory("graft-storeio")
    graft.sources.Tables.lineitem(spark, sfDir)
      .select(Cols.map(col): _*)
      .repartition(2).write.mode("overwrite").parquet(s"mockfs:$tmp/lineitem.parquet")
    s"mockfs:$tmp"
  }
  private def tablePath = s"$base/lineitem.parquet"

  /** Run `body` with counters reset; return (result, bytes read). */
  private def ioBytes[T](body: => T): (T, Long) = {
    MockObjectFs.reset()
    val r = body
    (r, MockObjectFs.bytesRead.get)
  }

  private def fullScanAgg(): Long = ioBytes {
    spark.read.parquet(tablePath)
      .agg(sum("l_orderkey"), sum("l_quantity"), sum("l_extendedprice"),
        max("l_shipdate")).collect()
  }._2

  test("projection reads a fraction of the table's bytes; count() reads ~footers only") {
    val b4 = fullScanAgg()
    assert(b4 > 0, "full scan must read bytes through mockfs")
    val (_, b1) = ioBytes {
      spark.read.parquet(tablePath).agg(sum("l_quantity")).collect()
    }
    assert(b1 > 0 && b1 < (b4 * 6) / 10,
      s"1-column scan must read well under the 4-column bytes: $b1 vs $b4")
    // count() plans an empty ReadSchema: row counts come from row-group
    // metadata — on an object store that's the difference between a
    // footer GET and a table scan
    val (n, bc) = ioBytes(spark.read.parquet(tablePath).count())
    assert(n > 0)
    assert(bc < (b4 * 3) / 10, s"count() must be ~metadata-only: $bc vs $b4")
  }

  test("a cache-resident segment serves re-reads with zero storage bytes") {
    val cache = new SegmentCache(1L << 30, LRU)
    def seg: DataFrame = cache.get(SegmentKey("storeio_lineitem", Cols)) {
      spark.read.parquet(tablePath).select(Cols.map(col): _*)
    }
    val (_, cold) = ioBytes(seg.agg(sum("l_quantity")).collect())
    assert(cold > 0, "cold segment load must hit storage")
    val (_, warm) = ioBytes(seg.agg(sum("l_extendedprice")).collect())
    assert(warm == 0L,
      s"resident segment must cost ZERO storage bytes, read $warm")
    cache.invalidateAll()
  }

  test("a warm hybrid scan pays only the fetch column's bytes") {
    val b4 = fullScanAgg()
    val (_, bFetchOnly) = ioBytes {
      spark.read.parquet(tablePath).agg(max("l_shipdate")).collect()
    }
    val cache = new SegmentCache(1L << 30, LRU)
    def merged(): DataFrame = HybridScan.mergedScan(spark, base, "lineitem",
      cachedCols = Seq("l_quantity", "l_extendedprice"),
      fetchCols = Seq("l_shipdate"), fetchPredicate = None, cache = cache)
    def run(): Unit = {
      merged().agg(sum(col("l_extendedprice") * col("l_quantity")),
        max("l_shipdate")).collect(); ()
    }
    val (_, cold) = ioBytes(run())
    val (_, warm) = ioBytes(run())
    assert(cache.hits >= 1, "second merge must serve the segment resident")
    assert(warm < cold,
      s"warm hybrid must read less than cold (segment resident): $warm vs $cold")
    assert(warm < b4 / 2,
      s"warm hybrid must read well under the full-table bytes: $warm vs $b4")
    // fetch side = the date column + footers + the listing's metadata;
    // generous 3x slack over the bare column scan still pins "the fetch
    // column is the ONLY data crossing the storage boundary"
    assert(warm <= bFetchOnly * 3,
      s"warm hybrid bytes must be fetch-column-sized: $warm vs $bFetchOnly")
    cache.invalidateAll()
  }

  test("a partition filter cuts GETs and bytes to the matching partition") {
    val part = s"$base/lineitem_byday.parquet"
    spark.read.parquet(tablePath)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.partitionBy("ship_month").mode("overwrite").parquet(part)
    val (_, bAll) = ioBytes {
      spark.read.parquet(part).agg(sum("l_quantity")).collect()
    }
    val oAll = MockObjectFs.opens.get
    val (_, bOne) = ioBytes {
      spark.read.parquet(part).filter(col("ship_month") === "1996-03")
        .agg(sum("l_quantity")).collect()
    }
    val oOne = MockObjectFs.opens.get
    assert(bOne > 0, "the matching partition must still be read")
    assert(bOne < bAll / 4, s"partition-pruned bytes must collapse: $bOne vs $bAll")
    assert(oOne < oAll / 4, s"partition-pruned GETs must collapse: $oOne vs $oAll")
    // honest caveat, counted: path-based partition DISCOVERY still walks
    // the whole directory tree at planning (listCalls does not drop) —
    // only a catalog table with partition metadata prunes the listing
    // itself, which is the z05/day-partition lever's catalog form
    assert(MockObjectFs.listCalls.get > 0)
  }

  test("compareModes on the store scheme reports FS-truth bytes per pass") {
    MockObjectFs.reset()
    // the real testdata tables served through the scheme in place — the
    // full-catalog path (registerAll reads every footer through mockfs)
    val dir = "mockfs:/root/testdata/sf0.001"
    val qs = Seq("q6ish" ->
      ("SELECT sum(l_extendedprice * l_discount) AS rev " +
       "FROM lineitem WHERE l_quantity < 24"))
    val rep = graft.plans.ModeExec.compareModes(spark, dir, qs)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(rep.nonEmpty && rep.forall(_._3.isDefined),
      s"store bytes must be measured on mockfs: ${rep.toSeq}")
    val cw = rep.find(r => r._1 == "caching" && r._2 == "warm").get
    assert(cw._3.get == 0.0, s"caching warm must read ZERO store bytes: $cw")
    val pu = rep.find(_._1 == "pullup").get
    assert(pu._3.get > 0, s"pullup must pay store bytes: $pu")
  }

  test("the bandwidth throttle holds its lower bound") {
    val b4 = fullScanAgg() // unthrottled byte count B
    // 2 part files → ≤2 concurrent streams; bw = B/s means each task
    // thread owes ~ (B/2)/B = 0.5 s of sleep, a floor wall-clock can't
    // dodge (sleeps are real). Upper bounds are host-noise; only the
    // lower bound is asserted.
    MockObjectFs.bytesPerSec = b4
    try {
      val t0 = System.nanoTime()
      fullScanAgg()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(secs >= 0.4, f"throttled scan finished in $secs%.3f s; " +
        "the simulated store bandwidth is not being applied")
    } finally MockObjectFs.bytesPerSec = 0L
  }
}
