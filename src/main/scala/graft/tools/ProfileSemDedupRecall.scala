package graft.tools

import graft.GraftSession
import graft.operators.Dedup

/** Dev-only: print d11b's sampled semantic-dedup recall value (the entry
  * only exposes the boolean floor check). Calls the SAME pipeline
  * definitions the shipped gate uses (`Dedup.ivfSemDups` /
  * `Dedup.sampledSemDups`) — a re-implementation here could silently
  * drift and profile a different pipeline than the one d11b certifies.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileSemDedupRecall". */
object ProfileSemDedupRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("profile-semdedup", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ivfDups = Dedup.ivfSemDups(spark, dir)
    val sampleDups = Dedup.sampledSemDups(spark, dir)
    val denom = sampleDups.count()
    val hits = sampleDups.join(ivfDups, Seq("dup_id"), "left_semi").count()
    println(f"sampled semdedup recall at $dir: ${hits.toDouble / math.max(denom, 1L)}%.3f ($hits / $denom sampled dups, K=${Dedup.SemDedupSampleK})")
    spark.stop()
  }
}
