package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Predicate transfer (reference research core #3: bloom-filter
  * pre-filtering across the join graph, CIDR 2024;
  * `fpdb-executor/src/physical/transform/pred-trans/PredTransOrder.cpp`,
  * `SmallToLargePredTransOrder.cpp`).
  *
  * Spark-native layering:
  *  1. single-hop transfer is ON in the engine session —
  *     `spark.sql.optimizer.runtime.bloomFilter.enabled` injects a bloom
  *     filter from the filtered build side into the probe-side scan
  *     (`InjectRuntimeFilter`), exactly the reference's
  *     BloomFilterCreate/Use pair around one join (SURVEY.md §2.2);
  *  2. multi-hop, small→large transfer is this utility: reduce the fact
  *     table with `left_semi` joins against each (already-filtered)
  *     dimension, smallest first, before the real joins run. Catalyst
  *     plans each reduction as a broadcast semi join when the dim is
  *     small — a map-side filter over the fact scan with no shuffle —
  *     and layer 1 then adds blooms on what remains.
  *
  * Semantics-preserving by construction (a semi join never adds or
  * duplicates fact rows), which the oracle check proves: the transferred
  * plan must hash-match the plain-join SQL.
  */
object PredicateTransfer {

  /** Reduce `fact` by semi-joining each (dim, joinCond), in order.
    * Callers pass dims smallest-first (the reference's
    * SmallToLargePredTransOrder); [[reduceAuto]] orders them from stats. */
  def reduce(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (f, (dim, cond)) => f.join(dim, cond, "left_semi") }

  /** [[reduce]] with the dims ordered smallest-first by Catalyst's
    * optimized-plan size estimate — the automatic equivalent of the
    * reference's small-to-large transfer ordering
    * (`pred-trans/SmallToLargePredTransOrder.cpp:12-31`, which BFS-walks
    * dims ascending by stats). Cheapest reductions run first so each later
    * semi join probes an already-smaller fact. Stats come from the plan
    * (file sizes, CBO when available) — no data is read at plan time. */
  def reduceAuto(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    // withActive: `.stats` evaluates lazily on the CALLER's thread (the
    // optimized plan itself is computed under Spark's own bracket, the
    // stats visitor choice is not) — a pool thread with no inherited
    // active session would sort dims by default-conf size estimates
    // (r13 review; AutoSemiReduction's stats reads need no bracket —
    // rules run inside executePhase, which Spark wraps itself)
    reduce(fact, dims.sortBy { case (d, _) =>
      org.apache.spark.sql.GraftBridge.withActive(d.sparkSession)(
        d.queryExecution.optimizedPlan.stats.sizeInBytes)
    })

  /** p01 — the q05 star join executed with explicit predicate transfer:
    * the region filter walks region→nation→customer→orders, and lineitem
    * is semi-join-reduced by the surviving order keys before the wide
    * joins. Oracle = the untransferred SQL (results must be identical). */
  private def p01PredTransStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val nation = PredicateTransfer.reduce(
      Tables.nation(s, dir),
      Seq((broadcast(region), $"n_regionkey" === $"r_regionkey")))
    val cust = PredicateTransfer.reduce(
      Tables.customer(s, dir),
      Seq((broadcast(nation), $"c_nationkey" === $"n_nationkey")))
    val ord = PredicateTransfer.reduce(
      Tables.orders(s, dir).filter(
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp")),
      Seq((cust, $"o_custkey" === $"c_custkey")))
    val li = PredicateTransfer.reduce(
      Tables.lineitem(s, dir),
      Seq((ord, $"l_orderkey" === $"o_orderkey")))
    // the actual joins now touch only surviving rows
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(graft.sources.Tables.exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val p01Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_pred_trans_star" -> p01PredTransStar _,
  )

  val oracleSql: Map[String, String] = Map(
    "p01_pred_trans_star" -> p01Sql,
  )
}
