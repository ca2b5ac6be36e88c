package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Dev-only: time the PQ artifact's phases (train vs encode). */
object ProfilePqTrain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("profile-pq-train", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, dir)
    val sub = emb.select($"vec_id", posexplode(
      transform(sequence(lit(0), lit(7)), m => slice($"embedding", m * 8 + 1, lit(8)))))
      .toDF("vec_id", "m", "subvec")
      .repartition(8)
      .persist()
    t("materialize sub")(sub.count())
    val models = (0 until 8).map { m =>
      t(s"fit $m") {
        val fit = sub.filter($"m" === m).withColumn("features", array_to_vector($"subvec"))
        new KMeans().setK(16).setSeed(42L + m).setMaxIter(5).fit(fit)
      }
    }
    t("total-refit") {
      val fit = sub.filter($"m" === 0).withColumn("features", array_to_vector($"subvec"))
      new KMeans().setK(16).setSeed(42L).setMaxIter(5).fit(fit)
    }
    println(s"models: ${models.size}")
    spark.stop()
  }
}
