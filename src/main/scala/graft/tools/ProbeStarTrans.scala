package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count => fCount, lit, sum => fSum}

/** Dev probe for the bench's `pred_transfer_star` block: executes the
  * p05 two-dim star rule off vs on under the same 0.9×-bracketed
  * threshold, prints every shuffle exchange's hash keys and
  * bytes-written, and the final adaptive plan — for diagnosing per-dim
  * leg attribution (which exchange carries which dim, and whether each
  * hinted backward semi ran broadcast BELOW its dim's exchange). */
object ProbeStarTrans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-probe-star")
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PROBE_MOCKFS=1 replicates the bench block exactly:
    // reads through the throttled instrumented store scheme — AQE stage
    // COMPLETION ORDER differs under store latency, which changes when
    // re-optimization sees which sizes (the li exchange can be created
    // before the fact stage's stats would have killed it)
    val useMock = sys.env.get("SPARK_GRAFT_PROBE_MOCKFS").contains("1")
    val scheme = if (useMock) "mockfs:" else ""
    if (useMock) {
      import graft.sources.MockObjectFs
      spark.sparkContext.hadoopConfiguration
        .set("fs.mockfs.impl", classOf[MockObjectFs].getName)
      MockObjectFs.reset()
      MockObjectFs.bytesPerSec =
        sys.env.getOrElse("SPARK_GRAFT_STORE_MBPS", "2").toLong << 20
      MockObjectFs.openLatencyMs = 5
    }
    def shapeStar(): DataFrame = {
      // the bench block's filter (NOT p05's key-correlated %43 — see the
      // bench scaladoc: a key filter propagates to the dim by constraint
      // inference and leaves the semi nothing to cut)
      val ord = spark.read.parquet(s"$scheme$sfDir/orders.parquet")
        .filter(col("o_orderdate") >= "2001-06-01")
      ord.join(spark.read.parquet(s"$scheme$sfDir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .join(spark.read.parquet(s"$scheme$sfDir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("l_returnflag"))
        .agg(fCount(lit(1)), fSum(col("l_extendedprice")))
    }
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def collectExchanges(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[ShuffleExchangeLike] =
      p.collectWithSubqueries {
        case e: ShuffleExchangeLike => Seq(e)
        case a: AdaptiveSparkPlanExec => collectExchanges(a.executedPlan)
        case q: QueryStageExec => collectExchanges(q.plan)
      }.flatten
    spark.conf.set("spark.graft.autoSemiReduction", "false")
    val sides = shapeStar().queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.flatMap(j => Seq(j.left.stats.sizeInBytes, j.right.stats.sizeInBytes))
    println(s"join sides (rule off): ${sides.sorted.mkString(", ")}")
    if (sides.isEmpty) { spark.stop(); return }
    val threshold = (sides.min * 9 / 10).max(1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    println(s"threshold: $threshold")
    // same AQE-off discipline as the bench block (see its scaladoc):
    // the static plan keeps both dim exchanges, so the legs measure the
    // semis' row cut and nothing else
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq(false, true).foreach { ruleOn =>
      spark.conf.set("spark.graft.autoSemiReduction", ruleOn.toString)
      val df = shapeStar()
      df.collect()
      println(s"---- ruleOn=$ruleOn exchanges ----")
      collectExchanges(df.queryExecution.executedPlan).foreach { e =>
        val keys = e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.map(_.sql).mkString(",")
          case other => other.getClass.getSimpleName
        }
        val bytes = e.metrics.get("shuffleBytesWritten")
          .orElse(e.metrics.get("dataSize")).map(_.value).getOrElse(0L)
        println(f"  keys=[$keys] bytes=$bytes%,d")
      }
      if (ruleOn) {
        println("---- optimized (rule on) ----")
        println(df.queryExecution.optimizedPlan.treeString.take(5000))
        println("---- final physical ----")
        println(df.queryExecution.executedPlan.toString.take(7000))
      }
    }
    spark.stop()
  }
}
