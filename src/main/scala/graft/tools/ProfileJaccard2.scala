package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev-only: isolate the slow part of the shingle-explode stage. */
object ProfileJaccard2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("profile2", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s   rows=$n")
    }
    import graft.operators.TextAnalysis
    import graft.sources.Tables
    val docs = Tables.documents(spark, dir)
    docs.count() // warmup
    val spreadDocs = Tables.spread(docs)
    val base = spreadDocs
      .withColumn("w", TextAnalysis.words(col("text")))
      .withColumn("sh", TextAnalysis.shingles(col("w"), 3))
    time("explode only (no struct)")(
      base.select(col("doc_id"), explode(col("sh")).as("s")).count())
    time("explode + plain n_sh col")(
      base.select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s")).count())
    time("explode + struct")(
      base.select(struct(col("doc_id"), size(col("sh")).as("n_sh")).as("d"),
        explode(col("sh")).as("s")).count())
    // force materialization boundary before explode
    val mat = base.select(col("doc_id"), size(col("sh")).as("n_sh"), col("sh"))
      .repartition(32)
    time("explode after repartition")(
      mat.select(struct(col("doc_id"), col("n_sh")).as("d"), explode(col("sh")).as("s")).count())
    // no-distinct shingles (is array_distinct the cost?)
    val rawSh = spreadDocs
      .withColumn("w", TextAnalysis.words(col("text")))
      .withColumn("sh", transform(
        sequence(lit(0), size(col("w")) - 3),
        i => concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2),
          element_at(col("w"), i + 3))))
    time("explode, no array_distinct")(
      rawSh.select(col("doc_id"), explode(col("sh")).as("s")).count())
    spark.stop()
  }
}
