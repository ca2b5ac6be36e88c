package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Measures the claim [[graft.functions.RollingWindowHash]] is built on:
  * stride-1 window hashing via the rolling expression vs the composed
  * `transform(sequence, i => md5(slice(...)))` form that re-concatenates
  * and re-digests k tokens per position. Both run the full d20 span
  * pipeline (same shuffles, same answer — only the discriminator
  * differs), so the delta isolates the hashing stage.
  *
  * The sf0.1 corpus is 1.5 MB of text — the ×k digest blow-up is 30 MB
  * of md5 across 32 cores, i.e. invisible — so `copies` replicates the
  * corpus (fresh doc_ids) until the hashing stage is the dominant cost,
  * which is exactly the regime a real corpus is always in.
  *
  * Run: `sbt "runMain graft.tools.ProfileRollingHash /root/testdata/sf0.1 20 64"`
  */
object ProfileRollingHash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(graft.operators.Dedup.SpanWindow)
    val copies = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get("graft-profile-rwh", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val nDocs = base.count()
    val docs = Tables.spread(
      if (copies == 1) base
      else base.crossJoin(spark.range(copies).select(col("id").as("copy")))
        .select((col("doc_id") + col("copy") * lit(nDocs)).as("doc_id"), col("text")))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      var rows = 0L
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (rows, secs)
    }
    val (rRows, rolling) = time("rolling") {
      graft.operators.Dedup.substringSpans(docs, k)()
    }
    val (mRows, md5win) = time("md5-window") {
      graft.operators.Dedup.substringSpans(docs, k)(ws =>
        transform(sequence(lit(0), size(ws) - k),
          i => md5(concat_ws(" ", slice(ws, i + 1, lit(k))))))
    }
    require(rRows == mRows, s"span counts diverged: $rRows vs $mRows")
    println(f"""{"probe":"rolling_hash","k":$k,"spans":$rRows,"rolling_s":$rolling%.2f,"md5_window_s":$md5win%.2f,"speedup_x":${md5win / rolling}%.2f}""")
    spark.stop()
  }
}
