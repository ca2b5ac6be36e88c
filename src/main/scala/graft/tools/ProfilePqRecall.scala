package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}
import graft.sources.Tables

/** Dev-only: print the PQ/ADC recall@3 value (s09 only exposes the
  * boolean floor check). Run: sbt "runMain graft.tools.ProfilePqRecall". */
object ProfilePqRecall {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("profile-pq", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { dir =>
      Seq("s08_ann_pq", "s10_ann_ivfpq").foreach { entry =>
      val pq = SparkEntry.queries(entry)(spark, dir).select($"qid", $"nid")
      val emb = Tables.embeddings(spark, dir)
      val q = emb.filter($"vec_id" < 50).select($"vec_id".as("qid"), $"embedding".as("qe"))
      val n = Tables.spread(emb.select($"vec_id".as("nid"), $"embedding".as("ne")))
      val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid")
      val exact = broadcast(q).crossJoin(n)
        .withColumn("cosine", graft.functions.CosineSimilarity.column($"qe", $"ne"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"qid", $"nid")
      val hits = exact.join(pq, Seq("qid", "nid"), "left_semi").count()
      val total = exact.count()
      println(f"$entry recall@3 at $dir: ${hits.toDouble / total}%.3f ($hits / $total)")
      }
    }
    spark.stop()
  }
}
