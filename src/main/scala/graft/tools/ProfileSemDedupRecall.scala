package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only: print d11b's sampled semantic-dedup recall value (the entry
  * only exposes the boolean floor check). Recomputes the d11b pipeline:
  * IVF-bucketed dup set over the full corpus vs the exact dup-ness of
  * the K=SemDedupSampleK deterministically-sampled vectors.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileSemDedupRecall". */
object ProfileSemDedupRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("profile-semdedup", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val asg = graft.operators.Similarity.ivfMultiAssigned(spark, dir)
    val ca = asg.select($"vec_id".as("a"), $"embedding".as("ea"), $"cell")
    val cb = asg.select($"vec_id".as("b"), $"embedding".as("eb"), $"cell".as("cellb"))
    val ivfDups = ca.join(cb, $"cell" === $"cellb" && ($"a" < $"b"))
      .filter(graft.functions.CosineSimilarity.column($"ea", $"eb") > Dedup.SemDedupTau)
      .select($"b".as("dup_id")).distinct()
    val emb = Tables.embeddings(spark, dir)
    val sample = emb.orderBy(md5($"vec_id".cast("string")), $"vec_id")
      .limit(Dedup.SemDedupSampleK)
      .select($"vec_id".as("b"), $"embedding".as("eb"))
    val corpus = Tables.spread(emb.select($"vec_id".as("a"), $"embedding".as("ea")))
    val sampleDups = corpus.join(broadcast(sample), $"a" < $"b")
      .filter(graft.functions.CosineSimilarity.column($"ea", $"eb") > Dedup.SemDedupTau)
      .select($"b".as("dup_id")).distinct()
    val denom = sampleDups.count()
    val hits = sampleDups.join(ivfDups, Seq("dup_id"), "left_semi").count()
    println(f"sampled semdedup recall at $dir: ${hits.toDouble / math.max(denom, 1L)}%.3f ($hits / $denom sampled dups, K=${Dedup.SemDedupSampleK})")
    spark.stop()
  }
}
