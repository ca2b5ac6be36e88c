package graft.util

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.GraftCoreBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Scan-side IO accounting — bytes and files actually touched per query.
  *
  * At 100 TB bytes-scanned IS the cost model: a pruning regression that
  * shows up as noise-sized seconds at sf0.1 is a six-figure scan bill at
  * fleet scale. The reference measures bytes moved as a first-class bench
  * output (`fpdb-main/bench/BytesReadBench.cpp`; per-policy hit/miss byte
  * accounting in `fpdb-cache`), so graft's bench records the same
  * (BENCH_DETAIL.json `io` block) and LayoutSpec asserts the clustered
  * layouts' pruning ratios from these counters rather than one-off probes.
  *
  * Two complementary measurements, two mechanisms:
  *
  *  - [[ScanStats.planScans]]: plan-level `numFiles`/`filesSize`/
  *    `numOutputRows` metrics from every `FileSourceScanExec` in an
  *    EXECUTED plan. `numFiles`/`filesSize` are the file LISTING the scan
  *    committed to (post partition/shard pruning — what directory layout
  *    and zone maps save); `numOutputRows` is rows DECODED (post parquet
  *    row-group pruning — what write-time clustering saves). These are
  *    exact and deterministic, and are the bench's primary `io` record.
  *  - [[ScanStats.attach]]: task-level `InputMetrics.bytesRead` summed by
  *    a `SparkListener`. MEASURED CAVEAT (this host, Spark 4.1, file://):
  *    the vectorized parquet reader's column-chunk reads bypass the
  *    Hadoop `FileSystem.Statistics` callback — a full scan of a
  *    114,779-byte file reports 5,864 bytes (≈ the tracked
  *    footer/metadata path only), scaling with FILE COUNT, not data. On
  *    an object store (S3A et al.) the same counter is byte-accurate,
  *    which is why the bench still records it (`fs_bytes`) — but specs
  *    must not assert on its absolute value for local parquet; the
  *    listener bus is asynchronous, so snapshots flush it first
  *    ([[org.apache.spark.GraftCoreBridge.flushListenerBus]]).
  */
object ScanStats {

  /** Task-metric totals since `reset()`: filesystem-statistics input
    * bytes (see the caveat above) and SHUFFLE bytes written — the second
    * 100 TB cost axis. Shuffle metrics are JVM-internal counters, exact
    * on every deployment: the per-entry `shuffle_bytes` record is what
    * proves "shuffles carry hashes/partials, not text" as a number. */
  final class Tap private[ScanStats] (spark: SparkSession) {
    private val bytes = new LongAdder
    private val records = new LongAdder
    private val shuffle = new LongAdder

    private val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.add(m.inputMetrics.bytesRead)
          records.add(m.inputMetrics.recordsRead)
          shuffle.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    /** Drain the listener bus so every finished task is counted. */
    def flush(): Unit =
      GraftCoreBridge.flushListenerBus(spark.sparkContext)

    def reset(): Unit = { flush(); bytes.reset(); records.reset(); shuffle.reset() }

    /** (bytesRead, recordsRead) accumulated since the last reset. */
    def snapshot(): (Long, Long) = { flush(); (bytes.sum(), records.sum()) }

    /** Shuffle bytes written since the last reset. */
    def shuffleBytes(): Long = { flush(); shuffle.sum() }

    def detach(): Unit =
      try spark.sparkContext.removeSparkListener(listener)
      catch { case _: Throwable => () }
  }

  /** Register a task-metrics tap on `spark`. One tap sees the whole
    * session's tasks — callers bracket the work they want measured with
    * `reset()`/`snapshot()` (the bench runs entries one at a time, so
    * the bracket IS the entry). */
  def attach(spark: SparkSession): Tap = new Tap(spark)

  /** Every file scan in an executed plan, including under AQE's
    * [[AdaptiveSparkPlanExec]] and a command's
    * [[org.apache.spark.sql.execution.CommandResultExec]] — both are
    * LEAVES that hide the subtree that did the work (a write action's
    * whole query runs under the command node) — and inside subqueries. */
  private[graft] def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p.collectWithSubqueries {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectScans(q.plan)
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        collectScans(c.commandPhysicalPlan)
    }
    here.flatten
  }

  /** (numFiles, filesSize, scanOutputRows) summed over every file scan of
    * an executed plan. Metric values are only populated AFTER an action
    * ran the plan; a metric a Spark version doesn't carry reads as 0. */
  def planScans(plan: SparkPlan): (Long, Long, Long) = {
    val scans = collectScans(plan)
    def metric(s: FileSourceScanExec, name: String): Long =
      s.metrics.get(name).map(_.value).getOrElse(0L)
    (scans.map(metric(_, "numFiles")).sum,
      scans.map(metric(_, "filesSize")).sum,
      scans.map(metric(_, "numOutputRows")).sum)
  }

  /** Run `df` to completion (collect) and return its executed-plan scan
    * totals — the spec-side helper: pruning assertions read the same
    * counters the bench records. */
  def ofCollected(df: DataFrame): (Long, Long, Long) = {
    df.collect()
    planScans(df.queryExecution.executedPlan)
  }

  /** Plan-level totals accumulated over every SUCCESSFUL query execution
    * since `reset()` — the write-action path (`df.write.format("noop")`)
    * builds its own `QueryExecution`, invisible to the caller, so the
    * only place to read its executed plan is the execution listener. */
  final class PlanTap private[ScanStats] (spark: SparkSession) {
    private val files = new LongAdder
    private val filesBytes = new LongAdder
    private val scanRows = new LongAdder

    private val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit = {
        val (f, b, r) = planScans(qe.executedPlan)
        files.add(f); filesBytes.add(b); scanRows.add(r)
      }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    // QueryExecutionListener events ride the same asynchronous bus
    // (ExecutionListenerBus is a SparkListener), so one flush covers both taps
    private def flush(): Unit =
      GraftCoreBridge.flushListenerBus(spark.sparkContext)

    def reset(): Unit = { flush(); files.reset(); filesBytes.reset(); scanRows.reset() }

    /** (numFiles, filesSize, scanOutputRows) since the last reset. */
    def snapshot(): (Long, Long, Long) =
      { flush(); (files.sum(), filesBytes.sum(), scanRows.sum()) }

    def detach(): Unit =
      try spark.listenerManager.unregister(listener)
      catch { case _: Throwable => () }
  }

  /** Register a plan-level tap (file listing committed per execution). */
  def attachPlans(spark: SparkSession): PlanTap = new PlanTap(spark)
}
