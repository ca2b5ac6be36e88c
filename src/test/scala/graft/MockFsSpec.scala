package graft

import org.apache.spark.sql.functions._

import graft.cache.{HybridScan, LRU, SegmentCache}
import graft.cache.HybridScan.AdaptiveScanRouter
import graft.sources.MockObjectFs

/** Scheme-coverage end of [[graft.sources.MockObjectFs]] (the byte
  * accounting end lives in [[StoreIoSpec]]): the reference deploys
  * exclusively against object stores (`fpdb-aws/`); graft's code must
  * therefore never bake in `file:` assumptions — URI rendering, listing,
  * `defaultTablePath` all have to survive a foreign scheme, without
  * needing a real S3 endpoint in the sandbox. */
class MockFsSpec extends SparkSpec {

  private lazy val base: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockObjectFs].getName)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mockfs")
    s"mockfs:$tmp"
  }

  test("hybrid merged scan + router run end-to-end under a non-file scheme") {
    // a 2-file table written THROUGH the scheme (committer rename paths
    // and all), then zipped through it
    graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
      .repartition(2).write.mode("overwrite").parquet(s"$base/lineitem.parquet")

    // the listing resolves the scheme through the Hadoop FS registry and
    // fingerprints (path, len, mtime) like any object-store listing would
    val tl = HybridScan.listTable(spark, base, "lineitem")
    assert(tl.files.size == 2, s"expected 2 data files, got ${tl.files}")
    assert(tl.files.forall(_._1.startsWith("mockfs:")),
      s"listing must render the foreign scheme, got ${tl.files.map(_._1)}")
    assert(tl.files.forall(f => f._2 > 0 && f._3 > 0), "len+mtime must be real")

    val cache = new SegmentCache(1L << 30, LRU)
    val merged = HybridScan.mergedScan(spark, base, "lineitem",
      cachedCols = Seq("l_quantity"), fetchCols = Seq("l_extendedprice"),
      fetchPredicate = None, cache = cache)
    val got = merged.agg(sum(col("l_extendedprice") * col("l_quantity")))
      .collect().head.getDouble(0)
    val want = spark.read.parquet(s"$base/lineitem.parquet")
      .agg(sum(col("l_extendedprice") * col("l_quantity")))
      .collect().head.getDouble(0)
    assert(math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want)),
      s"mockfs zip $got vs plain $want")
    assert(cache.misses == 1)

    // the router's hybrid route (residency check + fingerprint + zip) on
    // the same scheme
    val router = new AdaptiveScanRouter(cache, pushdownSlots = 4)
    val lease = router.scan(spark, base, "lineitem",
      Seq("l_quantity", "l_extendedprice", "l_shipdate"),
      expr("l_shipdate >= date '1996-01-01'"))
    lease.close()
    assert(lease.route == HybridScan.Hybrid,
      s"partial segment must route hybrid under mockfs, got ${lease.route}")
    val n = lease.df.count()
    val m = spark.read.parquet(s"$base/lineitem.parquet")
      .filter(expr("l_shipdate >= date '1996-01-01'")).count()
    assert(n == m)
    cache.invalidateAll()
  }

  test("bucketed managed tables resolve defaultTablePath under the second scheme") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevDb = spark.catalog.currentDatabase
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_mockdb LOCATION '$base/warehouse'")
      spark.catalog.setCurrentDatabase("graft_mockdb")
      val df = graft.sources.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      graft.plans.Bucketing.writeBucketedMulti(df, "mock_orders",
        buckets = 4, keys = Seq("o_custkey"))
      // the managed table landed under the mockfs database location —
      // reclaim/defaultTablePath resolved the foreign scheme
      val loc = spark.sql("DESCRIBE TABLE EXTENDED mock_orders")
        .filter(col("col_name") === "Location").select("data_type")
        .collect().head.getString(0)
      assert(loc.startsWith("mockfs:"), s"managed table location must be mockfs, got $loc")
      // and the bucketed layout still serves a shuffle-free join side
      val probe = graft.sources.Tables.customer(spark, sfDir)
        .select("c_custkey").limit(100)
      val joined = graft.plans.Bucketing.readBucketed(spark, "mock_orders")
        .hint("shuffle_hash")
        .join(probe, col("o_custkey") === col("c_custkey"))
      joined.count()
      val bucketSideExchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.toString.contains("mock_orders") => e
      }
      assert(bucketSideExchanges.isEmpty,
        "the bucketed (mockfs) side must not re-shuffle")
      // a second write to the same name exercises reclaim on mockfs
      graft.plans.Bucketing.writeBucketedMulti(df, "mock_orders",
        buckets = 4, keys = Seq("o_custkey"))
      assert(spark.table("mock_orders").count() == df.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      try spark.sql("DROP DATABASE IF EXISTS graft_mockdb CASCADE")
      catch { case _: Throwable => () }
      spark.catalog.setCurrentDatabase(prevDb)
    }
  }

  test("nested layouts list recursively under the second scheme") {
    // the listFiles override + recursion together: a partitioned table
    // written through mockfs must fingerprint its real nested files
    // (the raw-local default listFiles throws under a foreign scheme;
    // a non-recursive listing would silently fingerprint as empty)
    spark.range(60).selectExpr("id", "id % 3 as part")
      .write.partitionBy("part").mode("overwrite")
      .parquet(s"$base/nested.parquet")
    val before = MockObjectFs.listCalls.get
    val tl = HybridScan.listTable(spark, base, "nested")
    assert(tl.files.nonEmpty, "nested mockfs layout must never list empty")
    assert(tl.files.forall(_._1.contains("part=")),
      tl.files.map(_._1).mkString(", "))
    assert(tl.files.forall(_._1.startsWith("mockfs:")))
    // the flat recursive listing is billed as ONE LIST, like s3a's
    assert(MockObjectFs.listCalls.get == before + 1,
      s"recursive listing must count as one LIST call, " +
      s"got ${MockObjectFs.listCalls.get - before}")
    // staleness guard live on the nested layout: rewrite one partition
    val fp1 = tl.fingerprint
    spark.range(5).selectExpr("id", "cast(0 as bigint) as part")
      .write.mode("overwrite").parquet(s"$base/nested.parquet/part=0")
    assert(HybridScan.listTable(spark, base, "nested").fingerprint != fp1,
      "a nested rewrite through the scheme must change the fingerprint")
  }

  test("non-recursive listFiles and listLocatedStatus work under the scheme") {
    // the DEFAULT implementations build LocatedFileStatus through the
    // raw-local permission load (file:-only) and throw under mockfs —
    // both single-directory arms must take the permission-safe copy the
    // recursive branch uses (FileInputFormat-style callers hit these)
    import org.apache.hadoop.fs.Path
    spark.range(12).selectExpr("id", "id % 2 as part")
      .write.partitionBy("part").mode("overwrite")
      .parquet(s"$base/listing.parquet")
    val p = new Path(s"$base/listing.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Iterator.continually(fs.listFiles(p, false))
      .take(1).flatMap { it =>
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().getPath.getName
        b.result()
      }.toSeq
    assert(!files.exists(_.startsWith("part=")),
      "non-recursive listFiles must return only this directory's FILES")
    val located = {
      val it = fs.listLocatedStatus(p)
      val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(located.exists(st => st.isDirectory && st.getPath.getName.startsWith("part=")),
      "listLocatedStatus must include subdirectories (file-index contract)")
  }

  test("the aggregate bandwidth cap paces total bytes and composes as min, not in series") {
    // r13: totalBytesPerSec models the instance-level network bound a
    // real deployment also has (per-stream × streams composes with it
    // via min). Two pins: (a) a capped single-stream read is paced at
    // the cap; (b) per-stream + aggregate must NOT double-charge — a
    // read under equal per-stream and aggregate rates takes ~bytes/rate,
    // not ~2× (the serial-sleep composition the r13 review caught).
    import java.nio.file.Files
    spark.sparkContext.hadoopConfiguration // self-contained: don't rely
      .set("fs.mockfs.impl", classOf[MockObjectFs].getName) // on `base`
    val tmp = Files.createTempDirectory("graft-aggcap")
    // 16 MB (not 8): at 16 MB/s the sleep floor is ~1 s per read, so the
    // ~256 per-sleep scheduler overshoots are a small fraction of the
    // paced time and the ratio assertion below can't flake on a loaded
    // host (r13 ADVICE)
    val payload = new Array[Byte](16 << 20)
    new java.util.Random(7).nextBytes(payload)
    val raw = tmp.resolve("blob.bin")
    Files.write(raw, payload)
    val p = new org.apache.hadoop.fs.Path(s"mockfs:$raw")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(): Double = {
      val t0 = System.nanoTime()
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](1 << 16)
        while (in.read(buf, 0, buf.length) >= 0) ()
      } finally in.close()
      (System.nanoTime() - t0) / 1e9
    }
    try {
      // (a) aggregate-only: 16 MB at 16 MB/s total → ≥ 1 s floor
      MockObjectFs.reset()
      MockObjectFs.totalBytesPerSec = 16L << 20
      val capped = readAll()
      assert(capped >= 0.9, f"aggregate cap must pace the read: $capped%.3f s")
      // (b) per-stream 16 MB/s AND aggregate 16 MB/s: one 16 MB stream
      // is bounded by min(16,16) → ~1 s; the serial composition bug
      // slept both (~2 s).
      MockObjectFs.reset()
      MockObjectFs.bytesPerSec = 16L << 20
      MockObjectFs.totalBytesPerSec = 16L << 20
      val composed = readAll()
      assert(composed >= 0.9,
        f"composed throttles must still pace the read: $composed%.3f s")
      // RATIO against part (a), not an absolute wall ceiling: both reads
      // pay identical sleep floors plus the same per-sleep scheduler
      // overshoot (~256 chunked sleeps each), so host noise largely
      // cancels — the serial-composition regime would still double the
      // paced part (composed ≈ 2× capped). 1.7 sits midway between the
      // min regime (≈1×) and the serial regime (≈2×) with a full ~0.7 s
      // of the 1 s floor as noise budget (r13 ADVICE: the old 8 MB /
      // 1.6× margin could flake under heavy host load).
      assert(composed < 1.7 * capped,
        f"equal per-stream and aggregate rates must compose as min " +
        f"(≈ the aggregate-only time), not in series (≈ 2×): " +
        f"$composed%.3f s vs capped $capped%.3f s")
    } finally {
      MockObjectFs.bytesPerSec = 0L
      MockObjectFs.totalBytesPerSec = 0L
      Files.deleteIfExists(raw); Files.deleteIfExists(tmp)
    }
  }
}
