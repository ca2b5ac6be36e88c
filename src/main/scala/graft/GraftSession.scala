package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * The reference tunes an actor engine (parallel degree, 100k-row buffers,
  * 15MB S3 ranges — `fpdb-executor/include/fpdb/executor/physical/Globals.h`);
  * the Spark-native equivalents are shuffle partitioning, AQE, and runtime
  * bloom filters (predicate transfer, SURVEY.md §4.1). These settings are the
  * ones that transfer to a real cluster: on 1000 executors only `master` and
  * the partition counts change.
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def builder(appName: String, cpus: Int = defaultParallelism): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE skew-join split: the scale path for skewed join keys.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Predicate transfer, single-hop: runtime bloom filter injection
      // (reference: BloomFilterCreate/UsePOp, SURVEY.md §2.2).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // managed (bucketed) tables land outside the repo checkout
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))

  def get(appName: String): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
