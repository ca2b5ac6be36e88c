package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count => fCount, lit, sum => fSum}

/** Dev probe for the bench's pred_transfer PAY shape: prints the
  * optimized plan's semi joins and hints under the same bracketed
  * threshold the bench block uses, rule off vs on — for diagnosing
  * round-over-round shuffle-byte drift in the `sel_*` legs. */
object ProbePredTrans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-probe-pt")
    spark.sparkContext.setLogLevel("ERROR")
    def shapeSel(): DataFrame = {
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      ord.join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(fCount(lit(1)), fSum(col("l_extendedprice")),
          fSum(col("l_quantity")))
    }
    // one-shot CLI: the session is created and stopped here, so no conf
    // restore is needed — but guard the empty-join case (a future
    // optimizer change collapsing the join must print a diagnostic, not
    // die on empty.min)
    spark.conf.set("spark.graft.autoSemiReduction", "false")
    val sides = shapeSel().queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.flatMap(j => Seq(j.left.stats.sizeInBytes, j.right.stats.sizeInBytes))
    println(s"join sides (rule off): ${sides.sorted.mkString(", ")}")
    if (sides.isEmpty) {
      println("no Join in the optimized plan — nothing to bracket")
      spark.stop()
      return
    }
    val threshold = (sides.min - 1).max(1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    println(s"threshold: $threshold")
    spark.conf.set("spark.graft.autoSemiReduction", "true")
    val on = shapeSel()
    println("---- optimized (rule on) ----")
    println(on.queryExecution.optimizedPlan.treeString.take(4000))
    println("---- physical ----")
    println(on.queryExecution.executedPlan.treeString.take(4000))
    spark.stop()
  }
}
