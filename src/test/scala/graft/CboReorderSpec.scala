package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import graft.operators.VariantCorpus

/** CBO join-reorder robustness — the reference's own optimizer claim,
  * reproduced Spark-natively (round-6 verdict item 5).
  *
  * The reference ships FROM-reordered variants of TPC-H Q5/Q9
  * (`resources/query/tpch/modified/05-jo1/jo2.sql`, `09-jo1/jo2.sql`) as
  * a harness for its Calcite heuristic join ordering over its own
  * row-count metadata (`fpdb-calcite/java/.../Optimizer.java:156-175`,
  * `FPDBRelMdRowCount`): whatever order the user declares, the optimizer
  * should emit the same (good) join tree. Graft's corpus entries
  * (hv51/52, hv91/92) pin result equality through the stat-less temp-view
  * path; THIS spec pins plan convergence through the stats path —
  * catalog tables + `ANALYZE TABLE ... FOR ALL COLUMNS` +
  * `spark.sql.cbo.joinReorder.enabled` (session default, GraftSession),
  * asserting both declared orders optimize to one join tree.
  *
  * On a cluster this is the difference between "query speed depends on
  * how the analyst happened to write the FROM clause" and "the engine
  * owns join order": at 100 TB a fact-table-first mistake in a 6-way
  * join is the whole job's runtime.
  */
class CboReorderSpec extends SparkSpec {

  /** Isolated session: `newSession()` shares the SparkContext and the
    * external catalog but NOT the temp-view registry — the corpus
    * engine's temp views (`orders` etc., stat-less) would otherwise
    * shadow the ANALYZEd catalog tables under the same names. */
  private lazy val cbo: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        s.sql(s"CREATE TABLE IF NOT EXISTS graft_cbo.$t USING parquet " +
          s"LOCATION '$sfDir/$t.parquet'")
        // row counts + column NDV/min/max — what JoinReorder costs with.
        // MEASURED SPARK 4.1 PITFALL (the second TIMESTAMP_NTZ gap after
        // the footer-stats one that shaped Layout): FilterEstimation's
        // evaluateBinary has no TimestampNTZType case and MatchErrors the
        // whole optimization phase when a predicate touches an NTZ column
        // THAT HAS column stats. Stats-less NTZ columns fall back to
        // default selectivity — so ANALYZE everything except NTZ columns.
        val cols = s.table(s"graft_cbo.$t").schema.fields
          .filterNot(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
          .map(_.name)
        s.sql(s"ANALYZE TABLE graft_cbo.$t COMPUTE STATISTICS " +
          s"FOR COLUMNS ${cols.mkString(", ")}")
      }
    s.catalog.setCurrentDatabase("graft_cbo")
    s
  }

  private def optimized(entry: String): LogicalPlan =
    cbo.sql(VariantCorpus.sqlText(entry)).queryExecution.optimizedPlan

  /** In-order (join-tree) sequence of base relations with join types —
    * the human-readable convergence witness used in failure messages. */
  private def joinFingerprint(p: LogicalPlan): Seq[String] = {
    val tables = p.collect {
      case j: Join => j.joinType.sql
    }
    val leaves = p.collectLeaves().map(_.toString.linesIterator.next().take(60))
    tables ++ leaves
  }

  test("ANALYZE produced CBO stats (non-vacuous: row counts present)") {
    val st = cbo.table("lineitem").queryExecution.optimizedPlan.stats
    assert(st.rowCount.exists(_ > 0),
      "catalog stats missing — joinReorder would silently never fire")
  }

  test("Q5 join-order variants optimize to one join tree (hv51 ≡ hv52)") {
    val p1 = optimized("hv51_tpch_jo")
    val p2 = optimized("hv52_tpch_jo")
    assert(p1.sameResult(p2),
      s"""declared FROM order leaked into the optimized plan:
         |hv51: ${joinFingerprint(p1).mkString(" | ")}
         |hv52: ${joinFingerprint(p2).mkString(" | ")}""".stripMargin)
  }

  /** Table names under a plan node (catalog-qualified leaves only). */
  private def leafTables(p: LogicalPlan): Set[String] =
    p.collectLeaves().flatMap { l =>
      "graft_cbo\\.(\\w+)".r.findFirstMatchIn(l.toString).map(_.group(1))
    }.toSet

  /** The BOTTOM joins of a tree — joins neither side of which contains
    * another join — as the set of table-name pairings they connect. */
  private def bottomJoinPairings(p: LogicalPlan): Set[Set[String]] =
    p.collect {
      case j: Join if j.left.collectFirst { case x: Join => x }.isEmpty &&
        j.right.collectFirst { case x: Join => x }.isEmpty =>
        leafTables(j)
    }.toSet

  test("Q9 join-order variants converge where cost discriminates (hv91/hv92)") {
    // MEASURED CATALYST BEHAVIOR (vs the reference's blanket claim):
    // JoinReorderDP converges declared orders wherever costs STRICTLY
    // differ — both variants push the selective p_name-filtered
    // part ⋈ lineitem core and the tiny supplier ⋈ nation pairing to the
    // tree's bottom regardless of FROM order (asserted here; at 100 TB
    // this placement is the plan's cost). On an EXACT cost tie the DP
    // keeps its first-enumerated candidate, so the two variants may
    // attach `orders` vs `supplier⋈nation` in either top-level order
    // (observed at sf0.001: one tie) — a declared-order artifact with
    // equal estimated cost, which physical planning then broadcasts the
    // same way. So the spec pins the cost-driven structure, not
    // tie-ordering cosmetics.
    val p1 = optimized("hv91_tpch_jo")
    val p2 = optimized("hv92_tpch_jo")
    val b1 = bottomJoinPairings(p1)
    val b2 = bottomJoinPairings(p2)
    assert(b1 == b2,
      s"""cost-driven bottom pairings diverged with declared order:
         |hv91: $b1
         |hv92: $b2""".stripMargin)
    assert(b1.contains(Set("lineitem", "part")),
      s"the selective part⋈lineitem core is not a bottom join: $b1")
    assert(b1.contains(Set("supplier", "nation")),
      s"the tiny supplier⋈nation pairing is not a bottom join: $b1")
  }

  test("reordering keeps every join keyed — no cartesian is introduced") {
    // JoinReorder explores join-set permutations; a broken exploration
    // can pick an order where two relations meet before any predicate
    // connects them (a cross join a 100 TB plan cannot survive). Every
    // join in both converged trees must carry a condition.
    for (entry <- Seq("hv51_tpch_jo", "hv52_tpch_jo", "hv91_tpch_jo", "hv92_tpch_jo")) {
      val bare = optimized(entry).collect { case j: Join if j.condition.isEmpty => j }
      assert(bare.isEmpty, s"$entry: reordered plan contains a condition-less join")
    }
  }
}
