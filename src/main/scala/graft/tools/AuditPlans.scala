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
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(q) => q(spark, dir).explain("formatted")
        case None => println(
          s"unknown query '$n'; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
