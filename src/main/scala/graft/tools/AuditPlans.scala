package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only: dump formatted physical plans for the round's key rewrites
  * (run: sbt "runMain graft.tools.AuditPlans [query...]"). */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("audit-plans") // cpus from SPARK_GRAFT_CPUS
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q33_volume_shipping", "q05_star_join", "d05_simhash_pairs", "ev06_asof_view")
    // SPARK_GRAFT_AUDIT_EXEC=1: execute to the noop sink first and print
    // the FINAL adaptive plan (isFinalPlan=true) — runtime-only operators
    // (ReusedExchange, AQEShuffleRead, runtime join conversions) are
    // invisible in the pre-execution plan.
    val exec = sys.env.get("SPARK_GRAFT_AUDIT_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(q) =>
          val df = q(spark, dir)
          if (exec) {
            // the noop write runs its own QueryExecution; capture it via
            // listener (async bus — flush before reading) and print ITS
            // final adaptive plan
            @volatile var captured: Option[org.apache.spark.sql.execution.QueryExecution] = None
            val l = new org.apache.spark.sql.util.QueryExecutionListener {
              override def onSuccess(f: String,
                  qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
                // pin the capture to the noop WRITE's execution: entries
                // whose construction runs inner actions (artifact builds,
                // localCheckpoint, count) fire extra onSuccess events
                // whose plan is NOT the query's (r17 ADVICE). The noop
                // sink's funcName is 'overwrite' (measured — v2 path via
                // OverwriteByExpression); 'save'/'command' cover the v1
                // and generic command paths.
                if (f == "overwrite" || f == "save" || f == "command")
                  captured = Some(qe)
              override def onFailure(f: String,
                  qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
            }
            spark.listenerManager.register(l)
            try {
              df.write.format("noop").mode("overwrite").save()
              org.apache.spark.GraftCoreBridge.flushListenerBus(spark.sparkContext)
            } catch { case e: Throwable => println(s"exec failed: ${e.getMessage}") }
            finally spark.listenerManager.unregister(l)
            captured match {
              case Some(qe) => println(qe.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
              case None => df.explain("formatted")
            }
          }
          else df.explain("formatted")
        case None => println(
          s"unknown query '$n'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
