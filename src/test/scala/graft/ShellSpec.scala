package graft

import org.scalatest.funsuite.AnyFunSuite

/** Statement splitting for the SQL client — pure-function tests (the
  * end-to-end client is exercised via bin/graft-sql; here we pin the
  * quote-aware boundary scan that a raw split(';') would get wrong). */
class ShellSpec extends AnyFunSuite {

  test("splits on unquoted semicolons, keeps trailing unterminated text") {
    assert(Shell.splitStatements("select 1; select 2 ;  select 3") ==
      Seq("select 1", "select 2", "select 3"))
  }

  test("semicolons inside string literals do not end a statement") {
    assert(Shell.splitStatements("SELECT ';' AS x; SELECT 2") ==
      Seq("SELECT ';' AS x", "SELECT 2"))
    assert(Shell.splitStatements("SELECT \"a;b\", `c;d` FROM t") ==
      Seq("SELECT \"a;b\", `c;d` FROM t"))
  }

  test("doubled-quote escape stays inside the literal") {
    // 'it''s; fine' — the '' reads as close+reopen, the ';' is quoted either way
    assert(Shell.splitStatements("SELECT 'it''s; fine'; SELECT 2") ==
      Seq("SELECT 'it''s; fine'", "SELECT 2"))
  }

  test("backslash-escaped quote stays inside the literal (Spark default)") {
    // escapedStringLiterals=false: \' does not close the literal
    assert(Shell.splitStatements("SELECT 'it\\'s; x'; SELECT 2") ==
      Seq("SELECT 'it\\'s; x'", "SELECT 2"))
    assert(Shell.splitStatements("SELECT \"a\\\";b\"; SELECT 2") ==
      Seq("SELECT \"a\\\";b\"", "SELECT 2"))
    // backticked identifiers have no backslash escape: `a\` closes at the
    // second backtick, the following ';' splits
    assert(Shell.splitStatements("SELECT `a\\`; SELECT 2") ==
      Seq("SELECT `a\\`", " SELECT 2").map(_.trim))
    // a trailing backslash as the literal's last char must not read past
    // the buffer
    assert(Shell.statementEnd("SELECT 'abc\\") == -1)
  }

  test("statementEnd reports -1 for an open literal spanning the buffer") {
    assert(Shell.statementEnd("SELECT 'unclosed; still quoted") == -1)
    assert(Shell.statementEnd("SELECT 1") == -1)
    assert(Shell.statementEnd("a;b") == 1)
  }

  test("statement splitting ignores quotes and ';' inside SQL comments") {
    // "-- don't" used to open a literal that never closed: the whole
    // script was submitted as one broken statement
    assert(Shell.splitStatements("-- don't touch\nselect 1;\nselect 2;")
      == Seq("-- don't touch\nselect 1", "select 2"))
    // a ';' inside a line comment is text, not a boundary
    assert(Shell.splitStatements("select 1; -- half; done\nselect 2;")
      == Seq("select 1", "-- half; done\nselect 2"))
    assert(Shell.splitStatements("/* x; 'y */ select 1; select 2;")
      == Seq("/* x; 'y */ select 1", "select 2"))
    // comment markers inside literals stay literal
    assert(Shell.splitStatements("select '--;'; select 2;")
      == Seq("select '--;'", "select 2"))
    // bracketed comments NEST in Spark SQL: the first */ must not end
    // the outer comment (a mid-comment ';' used to split the statement)
    assert(Shell.splitStatements("/* a /* b */ c; */ select 1;")
      == Seq("/* a /* b */ c; */ select 1"))
  }

  test("\\store reports counters and drives the throttle knobs") {
    // spark-free command paths (counters are process-global); a throw or
    // a false return would leave the interactive store cockpit broken
    val fs = graft.sources.MockObjectFs
    val spark: org.apache.spark.sql.SparkSession = null // never touched
    val out = new java.io.ByteArrayOutputStream
    def run(cmd: String): Boolean =
      Console.withOut(new java.io.PrintStream(out))(
        Shell.runStatement(spark, "unused-dir", cmd))
    try {
      assert(run("\\store"))
      assert(out.toString.contains("GETs=") && out.toString.contains("throttle:"))
      assert(run("\\store bw 2m"))
      assert(fs.bytesPerSec == 2L * 1024 * 1024)
      // the exact format the usage line advertises, and case-insensitive
      // subcommands like every other shell command
      assert(run("\\store BW 4m/s"))
      assert(fs.bytesPerSec == 4L * 1024 * 1024)
      assert(run("\\store latency 5"))
      assert(fs.openLatencyMs == 5L)
      assert(run("\\store bw off") && fs.bytesPerSec == 0L)
      assert(run("\\store latency off") && fs.openLatencyMs == 0L)
      assert(run("\\store reset"))
      assert(run("\\store bogus arg2")) // usage text, not a failure
      assert(out.toString.contains("usage:"))
    } finally { fs.bytesPerSec = 0L; fs.openLatencyMs = 0L }
  }
}
