package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Tables}

/** Dev probe: why does the clustered range scan (not) prune? Prints the
  * read schema, pushed filters, and scan metrics for z03's range query. */
object ProbeLayout {
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("probe-layout", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("ts pushdown conf: " + spark.conf.get("spark.sql.parquet.filterPushdown.timestamp"))
    val dir = "/root/testdata/sf0.001"
    val path = Layout.clusteredLineitem(spark, dir)
    val df = spark.read.parquet(path)

    // control: cluster by a LONG column and range-filter on it.
    // Fixtures.ensure, not a fixed overwrite path: a concurrent JVM's
    // delete-then-write must not yank files out from under a lazy scan.
    val longPath = graft.sources.Fixtures.path(dir, "probe_by_orderkey")
    graft.sources.Fixtures.ensure(spark, longPath) {
      Tables.lineitem(spark, dir)
        .repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(longPath)
    }
    val dfL = spark.read.parquet(longPath)
    println("LONG filter scan rows:    " +
      scanRows(dfL.filter(col("l_orderkey") >= 100L && col("l_orderkey") < 500L)))

    println("NTZ filter scan rows:     " +
      scanRows(df.filter(col("l_shipdate") >= lit(Layout.RangeLo).cast("timestamp") &&
        col("l_shipdate") < lit(Layout.RangeHi).cast("timestamp"))))
    println("NTZ-literal filter rows:  " +
      scanRows(df.filter(col("l_shipdate") >= lit(Layout.RangeLo).cast("timestamp_ntz") &&
        col("l_shipdate") < lit(Layout.RangeHi).cast("timestamp_ntz"))))
    println("DATE-cast col filter rows:" +
      scanRows(df.filter(col("l_shipdate").cast("date") >= lit(Layout.RangeLo).cast("date"))))

    // LTZ read of the same NTZ-written files
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val dfLtz = spark.read.parquet(path)
    println("LTZ schema: " + dfLtz.schema("l_shipdate").dataType)
    println("LTZ filter scan rows:     " +
      scanRows(dfLtz.filter(col("l_shipdate") >= lit(Layout.RangeLo).cast("timestamp") &&
        col("l_shipdate") < lit(Layout.RangeHi).cast("timestamp"))))
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")

    // DATE-column clustered copy
    val datePath = graft.sources.Fixtures.path(dir, "probe_by_shipday")
    graft.sources.Fixtures.ensure(spark, datePath) {
      Tables.lineitem(spark, dir)
        .withColumn("l_shipday", col("l_shipdate").cast("date"))
        .repartitionByRange(16, col("l_shipday"))
        .sortWithinPartitions("l_shipday")
        .write.mode("overwrite").parquet(datePath)
    }
    val dfD = spark.read.parquet(datePath)
    println("DATE column filter rows:  " +
      scanRows(dfD.filter(col("l_shipday") >= lit(Layout.RangeLo).cast("date") &&
        col("l_shipday") < lit(Layout.RangeHi).cast("date"))))
  }
}
