package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}

/** Write-time clustering: the z03 range scan must read a narrow file
  * slice of the clustered copy while returning exactly the original
  * table's answer. */
class LayoutSpec extends SparkSpec {

  /** Rows surviving parquet row-group/file pruning at the scan node.
    * The probe query is filter-only (no exchange), so AQE leaves the
    * FileSourceScanExec directly in the executed plan. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

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
  }

  test("the unclustered original cannot prune (row group spans the domain)") {
    val total = Tables.lineitem(spark, sfDir).count()
    val unpruned = scanOutputRows(rangeFilter(Tables.lineitem(spark, sfDir)))
    assert(unpruned == total,
      s"expected the arrival-ordered single-row-group scan to decode all " +
        s"$total rows, saw $unpruned — if the source layout changed, " +
        "re-evaluate what this spec demonstrates")
  }
}
