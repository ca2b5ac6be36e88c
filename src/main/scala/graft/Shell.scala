package graft

/** Interactive SQL client — the engine's analog of the reference's
  * primary entry point (`fpdb-main/src/Client.cpp:94-111`, driven by the
  * interactive main in `fpdb-main/src/main.cpp`): a user sits at a
  * prompt, types SQL, and each statement runs through the same
  * catalog-registration + Catalyst pipeline as the programmatic API
  * ([[Engine.executeQuery]] — registration cached per session, so only
  * the first statement pays the catalog fetch).
  *
  * Usage (`bin/graft-sql` wraps the `java -cp` invocation — sbt's run
  * task does not forward stdin to the forked JVM, so interactive use
  * goes through the script):
  *  - `bin/graft-sql [sfDir]` — interactive: statements end with `;`
  *    and may span lines; `exit;` or EOF quits;
  *  - `bin/graft-sql [sfDir] -e "sql; sql2;"` — run statements, exit;
  *  - `bin/graft-sql [sfDir] -f queries.sql` — run a script file.
  * Commands:
  *  - `\d;` — list the registered tables and their columns;
  *  - `\explain <sql>;` — formatted physical plan instead of rows.
  * Output rows are capped at [[MaxRows]] — an interactive client is for
  * inspection; unbounded result dumps belong in a sink write.
  */
object Shell {

  val MaxRows = 100

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(a => a == "-e" || a == "-f")
    val dir = positional.dropRight(flags.length) // -e/-f consume the next positional
      .headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-shell")
    spark.sparkContext.setLogLevel("WARN") // keep the prompt readable
    val script: Option[String] = args.sliding(2).collectFirst {
      case Array("-e", sql) => sql
      case Array("-f", path) =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    }
    script match {
      case Some(text) =>
        text.split(';').map(_.trim).filter(_.nonEmpty)
          .foreach(runStatement(spark, dir, _))
      case None => repl(spark, dir)
    }
    spark.stop()
  }

  private def repl(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    println(s"graft SQL shell - tables from $dir; statements end with ';', exit; quits")
    val buf = new StringBuilder
    print("graft> "); Console.flush()
    var line = in.readLine()
    var done = false
    while (!done && line != null) {
      buf.append(line).append('\n')
      // execute every complete (';'-terminated) statement in the buffer
      while (!done && buf.indexOf(";") >= 0) {
        val cut = buf.indexOf(";")
        val stmt = buf.substring(0, cut).trim
        buf.delete(0, cut + 1)
        if (stmt.equalsIgnoreCase("exit") || stmt.equalsIgnoreCase("quit")) done = true
        else if (stmt.nonEmpty) runStatement(spark, dir, stmt)
      }
      if (!done) {
        print(if (buf.toString.trim.isEmpty) "graft> " else "    -> "); Console.flush()
        line = in.readLine()
      }
    }
  }

  private def runStatement(spark: org.apache.spark.sql.SparkSession,
      dir: String, stmt: String): Unit =
    try {
      if (stmt == "\\d") {
        // force registration with a no-op query, then describe the views
        Engine.executeQuery(spark, dir, "SELECT 1").collect()
        spark.catalog.listTables().collect().map(_.name).sorted.foreach { t =>
          val cols = spark.table(t).schema.map(f => s"${f.name} ${f.dataType.simpleString}")
          println(s"  $t(${cols.mkString(", ")})")
        }
      } else if (stmt.toLowerCase.startsWith("\\explain ")) {
        println(Engine.executeQuery(spark, dir, stmt.substring(9))
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      } else {
        val t0 = System.nanoTime()
        val df = Engine.executeQuery(spark, dir, stmt)
        df.show(MaxRows, truncate = false)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"($secs%.2f s)")
      }
    } catch {
      case e: Exception => println(s"error: ${e.getMessage}")
    }
}
