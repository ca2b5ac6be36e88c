package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.Graph

/** PageRank semantics (mass conservation, teleport locality) and the
  * iteration discipline (checkpointed fixpoint — the returned vector
  * must not re-execute the per-round join chain per action). */
class GraphSpec extends SparkSpec {

  private def edgesOf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def uniformTele(n: Int, ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(id => (id, 1.0 / n)).toDF("id", "t")
  }

  test("pagerank conserves unit mass on a symmetric graph (no dangling leak)") {
    // path graph 1-2-3 plus isolated-ish pair 4-5
    val e = edgesOf(1L -> 2L, 2L -> 3L, 4L -> 5L)
    val pr = Graph.pagerank(e, uniformTele(5, Seq(1L, 2L, 3L, 4L, 5L)))
    val total = pr.agg(sum(col("pr"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9,
      s"rank mass must stay 1.0 under the symmetric update, got $total")
    import spark.implicits._
    // the path's center receives from both ends → strictly richer than a leaf
    val m = pr.as[(Long, Double)].collect().toMap
    assert(m(2L) > m(1L), s"center of a path must out-rank a leaf: $m")
  }

  test("personalized teleport keeps mass on the seed side of a disconnected graph") {
    // two disconnected components; teleport only into the first
    val e = edgesOf(1L -> 2L, 3L -> 4L)
    import spark.implicits._
    val tele = Seq((1L, 0.5), (2L, 0.5), (3L, 0.0), (4L, 0.0)).toDF("id", "t")
    val m = Graph.pagerank(e, tele).as[(Long, Double)].collect().toMap
    assert(m(3L) == 0.0 && m(4L) == 0.0,
      s"no walk reaches the unseeded component, got $m")
    assert(math.abs(m(1L) + m(2L) - 1.0) < 1e-9)
  }

  test("the returned vector is a materialized fixpoint — no scan re-execution per action") {
    val pr = SparkEntry.queries("g01_pagerank")(spark, sfDir)
    val scans = pr.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.isEmpty,
      "g01 must serve from the checkpointed rank vector; a FileSourceScan means " +
        "every action re-runs the 3-round join chain from parquet")
  }

  test("g01 covers every node once; g02 is supplier-only with non-negative mass") {
    val pr = SparkEntry.queries("g01_pagerank")(spark, sfDir)
    val nodes = Graph.purchaseEdges(spark, sfDir)
      .select(col("src").as("id")).union(
        Graph.purchaseEdges(spark, sfDir).select(col("dst").as("id")))
      .distinct().count()
    assert(pr.count() == nodes)
    assert(pr.select(countDistinct(col("id"))).head().getLong(0) == nodes)

    val ppr = SparkEntry.queries("g02_ppr_seeds")(spark, sfDir)
    import spark.implicits._
    val rows = ppr.as[(Long, Double)].collect()
    assert(rows.forall(_._1 % 2 == 1), "g02 output must be supplier nodes only")
    assert(rows.forall(_._2 >= 0.0))
    val mass = rows.map(_._2).sum
    assert(mass > 0.0 && mass < 1.0,
      s"supplier-side PPR mass must be a proper fraction of the walk, got $mass")
  }
}
