package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational operator surface: every query runs, and the physical plans
  * have the scale-critical properties (pushdown, top-k fusion, broadcast). */
class RelationalSpec extends SparkSpec {

  test("every SparkEntry query executes and yields its declared schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // d/q/s/t/m/ev oracle compare needs stable column names — no autogen
      assert(!df.columns.exists(_.contains("(")), s"$name leaks unaliased column names: ${df.columns.mkString(",")}")
      df.limit(1).collect() // forces analysis + a little execution
    }
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q02 pushes its filters into the parquet scan") {
    val plan = SparkEntry.queries("q02_scalar_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_shipdate"), "range filter should reach the scan")
  }

  test("q03 prunes columns at the scan (ReadSchema is narrow)") {
    val plan = SparkEntry.queries("q03_filter_project")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"scan reads more columns than the projection needs: $readSchema")
  }

  test("q14 top-k fuses into TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q14_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q05 broadcasts the small dimensions") {
    val plan = SparkEntry.queries("q05_star_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q56 LATERAL decorrelates to a ranked window join, not a loop") {
    val plan = SparkEntry.queries("q56_lateral")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"correlated ORDER BY/LIMIT lateral must plan as WindowGroupLimit:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("t15 per-source cap pushes the rank limit into the shuffle (WindowGroupLimit)") {
    val plan = SparkEntry.queries("t15_source_cap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k over a partitioned window must push per-group limits:\n${plan.take(2000)}")
  }

  test("q58 heavy hitters: exact pass runs only over broadcast candidates") {
    val df = SparkEntry.queries("q58_heavy_hitters")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate restriction must be a broadcast semi join:\n${plan.take(2000)}")
    assert(plan.contains("cms_estimate"),
      s"candidate filter must probe the sketch natively:\n${plan.take(2000)}")
  }

  test("q59 recursive CTE walks each ancestor chain to the root") {
    val rows = SparkEntry.queries("q59_recursive")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // implicit-heap closed form: depth(i) = floor(log2(i + 1))
      val expected = 63 - java.lang.Long.numberOfLeadingZeros(id + 1)
      assert(r.getAs[Int]("depth") == expected,
        s"doc $id: depth ${r.getAs[Int]("depth")} != $expected")
    }
  }

  test("q54 quality checks run all constraints in ONE table scan") {
    val plan = SparkEntry.queries("q54_quality_checks")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 scan, found $scans:\n${plan.take(2000)}")
  }

  test("no query plans an unintended CartesianProduct") {
    val intended = Set("q12_cross_join") // tiny dims, explicit cross join
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!intended(name)) {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a cartesian product")
      }
    }
  }

  test("q01 aggregates match a direct computation") {
    import spark.implicits._
    val row = SparkEntry.queries("q01_group_agg")(spark, sfDir)
      .filter($"l_returnflag" === "A" && $"l_linestatus" === "F")
      .collect().head
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")
        && $"l_returnflag" === "A" && $"l_linestatus" === "F")
    val expected = li.agg(sum($"l_quantity"), count(lit(1))).collect().head
    assert(math.abs(row.getAs[Double]("sum_qty") - expected.getDouble(0)) < 1e-6)
    assert(row.getAs[Long]("count_order") == expected.getLong(1))
  }

  test("Engine.executeQuery runs SQL text over the registered catalog") {
    val df = Engine.executeQuery(spark, sfDir,
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 0")
    assert(df.collect().head.getAs[Long]("n") > 0)
  }
}
