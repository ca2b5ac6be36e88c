package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // the ENGINE session (extensions + tuned confs + metrics listener),
    // not a vanilla one — the correctness gate must exercise the
    // optimizer rules it ships and log the recall trades it takes
    val spark = GraftSession.get("graft-verify", cpus)
    new java.io.File(outDir).mkdirs()
    // dev-only subset filter (comma-separated entry names); the driver
    // never sets it, so its 2-arg full-dump contract is untouched
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // sorted order + artifact release at family boundaries: families
    // share session artifacts (dup groups, IVF index); releasing them
    // when a family completes keeps the suite's storage footprint at
    // one family's worth instead of the whole run's (see Bench)
    var lastFamily = ""
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      if (name.takeWhile(!_.isDigit) != lastFamily) {
        graft.util.SessionCache.releaseAll(spark)
        lastFamily = name.takeWhile(!_.isDigit)
      }
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // delete any PREVIOUS run's output for this entry: a failure
        // that leaves stale parquet in a reused outDir would be graded
        // as a pass against oracle_sql.json — the compare must see the
        // entry as missing, not as last run's rows
        try {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(new java.io.File(s"$outDir/$name"))
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
