package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}

/** Write-time clustering: the z03 range scan must read a narrow file
  * slice of the clustered copy while returning exactly the original
  * table's answer. */
class LayoutSpec extends SparkSpec {

  /** Rows surviving parquet row-group/file pruning at the scan node —
    * the same harvest the bench records per entry (`BENCH_DETAIL.json`
    * `io` block, `scan_rows`), so a pruning regression trips here AND
    * shows in the round record. Decoded rows — not filesystem byte
    * counters — are the assertable in-file pruning measure on local
    * parquet (see [[graft.util.ScanStats]]'s measured caveat). */
  private def scanOutputRows(df: DataFrame): Long =
    graft.util.ScanStats.ofCollected(df)._3

  /** The z03 range predicate: on the clustered copy it lands on the
    * materialized DATE column (prunable stats); on the original it derives
    * the day from the NTZ timestamp (same rows, no skip — Spark's reader
    * never evaluates NTZ row-group stats, the finding that shaped
    * [[Layout]]'s choice of clustering column). */
  private def rangeFilter(df: DataFrame): DataFrame = {
    val day = if (df.columns.contains("l_shipday")) col("l_shipday")
      else col("l_shipdate").cast("date")
    df.filter(day >= lit(Layout.RangeLo).cast("date") &&
      day < lit(Layout.RangeHi).cast("date"))
  }

  test("z03 equals the same aggregate over the unclustered original") {
    val clustered = SparkEntry.queries("z03_clustered_scan")(spark, sfDir).collect()
    val original = Layout.rangeQuery(Tables.lineitem(spark, sfDir)).collect()
    assert(clustered.length == original.length)
    // clustering reorders the doubles' summation — compare to tolerance
    clustered.zip(original).foreach { case (c, o) =>
      (0 until c.length).foreach { i =>
        (c.get(i), o.get(i)) match {
          case (a: Double, b: Double) =>
            assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)), s"col $i: $a vs $b")
          case (a, b) => assert(a == b, s"col $i: $a vs $b")
        }
      }
    }
  }

  test("clustering makes the range predicate skip most files at the scan") {
    val total = Tables.lineitem(spark, sfDir).count()
    val matching = rangeFilter(Tables.lineitem(spark, sfDir)).count()
    val path = Layout.clusteredLineitem(spark, sfDir)
    val pruned = scanOutputRows(rangeFilter(spark.read.parquet(path)))
    // every matching row must survive pruning; the point is how few
    // NON-matching rows are decoded alongside them (16 range files ⇒ a
    // one-month slice overlaps 1-2 of them)
    assert(pruned >= matching, s"pruning dropped matching rows: $pruned < $matching")
    assert(pruned <= total / 4,
      s"clustered scan decoded $pruned of $total rows — stats did not prune")
    // the pruning ratio the bench's io block records for z03: the
    // clustered copy decodes ≤1/4 of what the arrival-ordered original
    // decodes for the same predicate (the original's unprunability is
    // pinned by its own test below)
    val unpruned = scanOutputRows(rangeFilter(Tables.lineitem(spark, sfDir)))
    assert(pruned * 4 <= unpruned,
      s"pruning ratio regressed: clustered decodes $pruned vs original $unpruned")
  }

  test("z04 equals the same box aggregate over the unclustered original") {
    val z = SparkEntry.queries("z04_zorder_scan")(spark, sfDir).collect()
    val o = Layout.boxQuery(Tables.lineitem(spark, sfDir)).collect()
    assert(z.length == o.length && z.length > 0)
    z.zip(o).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        (a.get(i), b.get(i)) match {
          case (x: Double, y: Double) =>
            assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)), s"col $i: $x vs $y")
          case (x, y) => assert(x == y, s"col $i: $x vs $y")
        }
      }
    }
  }

  test("z-order prunes on BOTH key dimensions; linear clustering only on one") {
    val total = Tables.lineitem(spark, sfDir).count()
    val zpath = Layout.zorderedLineitem(spark, sfDir)
    val z = spark.read.parquet(zpath)
    // a ~10%-per-axis box relative to THIS sf's key domain (the entry's
    // fixed bounds are domain-fraction-dependent, so pruning assertions
    // scale the box instead)
    val Array(maxPart, maxSupp) = Tables.lineitem(spark, sfDir)
      .agg(max(col("l_partkey")), max(col("l_suppkey")))
      .collect().head.toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    val partPred = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("l_partkey") >= (maxPart * 0.25).toLong &&
        col("l_partkey") < (maxPart * 0.35).toLong)
    val suppPred = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("l_suppkey") >= (maxSupp * 0.2).toLong &&
        col("l_suppkey") < (maxSupp * 0.3).toLong)
    // single-column predicates each skip tiles on their own axis
    val zPart = scanOutputRows(partPred(z))
    val zSupp = scanOutputRows(suppPred(z))
    assert(zPart <= total / 2, s"z-order did not prune on l_partkey: $zPart of $total")
    assert(zSupp <= total / 2, s"z-order did not prune on l_suppkey: $zSupp of $total")
    // the two-column box lands in few tiles
    val zBox = scanOutputRows(partPred(suppPred(z)))
    assert(zBox <= total / 4, s"z-order did not prune the 2-D box: $zBox of $total")
    // the io-block ratio for z04: the unclustered original decodes the
    // whole table for the same box (no stats to skip on), so the z-order
    // tile win is at least 4× in decoded rows
    val oBox = scanOutputRows(partPred(suppPred(Tables.lineitem(spark, sfDir))))
    assert(zBox * 4 <= oBox,
      s"z-order box pruning ratio regressed: $zBox vs unclustered $oBox")

    // control: linear clustering on l_partkey serves partkey queries but
    // leaves suppkey queries unprunable — the gap z-order closes.
    // Written through Fixtures.ensure like every derived layout: a fixed
    // path with mode(overwrite) (delete-then-write) would let two
    // concurrent test JVMs yank files out from under each other — the
    // exact race Fixtures exists to prevent.
    val linPath = graft.sources.Fixtures.path(sfDir, "spec_linear_partkey")
    graft.sources.Fixtures.ensure(spark, linPath) {
      Tables.lineitem(spark, sfDir)
        .repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(linPath)
    }
    val lin = spark.read.parquet(linPath)
    assert(scanOutputRows(partPred(lin)) <= total / 4)
    assert(scanOutputRows(suppPred(lin)) == total,
      "expected the partkey-sorted layout to decode ALL rows for a suppkey " +
        "predicate — if this starts pruning, the control is no longer a control")
  }

  test("the unclustered original cannot prune (row group spans the domain)") {
    val total = Tables.lineitem(spark, sfDir).count()
    val unpruned = scanOutputRows(rangeFilter(Tables.lineitem(spark, sfDir)))
    assert(unpruned == total,
      s"expected the arrival-ordered single-row-group scan to decode all " +
        s"$total rows, saw $unpruned — if the source layout changed, " +
        "re-evaluate what this spec demonstrates")
  }

  test("z05 equals the raw-events aggregate; the day predicate prunes directories") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // rows: layout must never change results
    val z = SparkEntry.queries("z05_partition_prune")(spark, sfDir).collect()
    val raw = Layout.dayQuery(Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))).collect()
    assert(z.length == raw.length && z.nonEmpty)
    z.zip(raw).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        (a.get(i), b.get(i)) match {
          case (x: Double, y: Double) =>
            assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)), s"col $i: $x vs $y")
          case (x, y) => assert(x == y, s"col $i: $x vs $y")
        }
      }
    }
    // pruning: one of the 30 day-directories is LISTED — before any
    // footer is opened (the s15 assertion pattern, AQE off for a
    // traversable tree)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val path = Layout.partitionedEvents(spark, sfDir)
      val days = spark.read.parquet(path).select(col("day")).distinct().count()
      assert(days > 1, "fixture collapsed to one day; pruning unprovable")
      val q = Layout.dayQuery(spark.read.parquet(path))
      q.collect()
      val parts = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numPartitions").value
      }.sum
      assert(parts == 1,
        s"one-day predicate listed $parts of $days partitions — not pruned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
