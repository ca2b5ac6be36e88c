package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side catalog layer — the engine's sinks, completing the
  * source/sink story: parquet partitioned by a column (directory-pruned on
  * read), alongside `plans.Bucketing.writeBucketed` (co-located joins) and
  * the sharded CSV + zone-map path (`ZoneMapPruner.shardedOrders`).
  *
  * Partitioning by a low-cardinality column bakes the predicate into the
  * directory layout: a reader filtering on it scans only the matching
  * directories (`PartitionFilters` in the scan, zero data touched
  * elsewhere) — the write-side complement of the reference's partition
  * pruning, and at 100 TB the cheapest filter the engine has. */
object Sink {

  /** Persist `df` as parquet partitioned by `cols` (Hive-style layout). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Read a partitioned table back; filters on the partition columns
    * prune directories at plan time. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
