package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}

/** Dev-only stage profiler for the jaccard pipeline (not part of the
  * library surface; run: sbt "runMain graft.tools.ProfileJaccard"). */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("profile", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s   rows=$n")
    }
    import graft.operators.{Dedup, TextAnalysis}
    import graft.sources.Tables
    val docs = Tables.documents(spark, dir)
    // warmup
    docs.count()
    val withSh = Tables.spread(docs)
      .withColumn("w", TextAnalysis.words(col("text")))
      .withColumn("sh", TextAnalysis.shingles(col("w"), 3))
    time("shingles only")(withSh.select(col("doc_id"), size(col("sh"))).count())
    val exploded = withSh
      .select(struct(col("doc_id"), size(col("sh")).as("n_sh")).as("d"),
        explode(col("sh")).as("s"))
    time("explode")(exploded.count())
    val buckets = exploded.groupBy(col("s"))
      .agg(sort_array(collect_list(col("d"))).as("ids"))
      .filter(size(col("ids")) > 1)
    time("buckets")(buckets.count())
    val pairs = buckets
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "pa")))
      .select(col("pa"), explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("pb"))
    time("pairs")(pairs.count())
    val grouped = pairs.groupBy(col("pa.doc_id"), col("pb.doc_id"), col("pa.n_sh"), col("pb.n_sh"))
      .agg(count(lit(1)))
    time("pair groupBy")(grouped.count())
    time("full d06")(SparkEntry.queries("d06_jaccard_pairs")(spark, dir).count())
    spark.stop()
  }
}
