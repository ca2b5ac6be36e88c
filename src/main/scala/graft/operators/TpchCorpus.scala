package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Engine

/** The reference's primary workload, wholesale: its TPC-H SQL corpus
  * (`resources/query/tpch/original/01.sql..22.sql`, executed by
  * `fpdb-main/src/Client.cpp:94-111` and `fpdb-main/test/TPCHTest.cpp`),
  * adapted to the testdata schema and run as PLAIN SQL TEXT through
  * [[Engine.executeQuery]] — the exact workflow of a reference user
  * arriving with their .sql files.
  *
  * Adaptation rules (each file documents its own deltas in a header
  * comment):
  *  - the testdata has no `partsupp` table; Q2/Q11/Q16 derive it as a
  *    deterministic CTE over lineitem (one row per observed (part,
  *    supplier) pair; supplycost = min observed unit price, availqty =
  *    total shipped quantity) so all 22 run with their defining operator
  *    structures intact — the CTE text is identical in both engines;
  *  - columns absent from the testdata schema (l_commitdate,
  *    l_receiptdate, l_shipmode, o_shippriority, c_phone, p_container,
  *    p_mfgr, *_comment, *_address) are dropped from outputs or replaced
  *    by the nearest present column, preserving each query's operator
  *    structure (the correlated EXISTS stays a correlated EXISTS, the
  *    grouped-HAVING IN subquery stays one, ...);
  *  - literals are re-drawn from the testdata's value domains (dates
  *    1995-2001, NATION_0..24, single-word p_type, 'Brand#N');
  *  - vendor-specific syntax is normalized to text that parses and
  *    agrees on BOTH Spark and DuckDB (date literals, INTERVAL 'n' DAY,
  *    CAST(extract(...) AS BIGINT), CTE instead of CREATE VIEW) — the
  *    same string IS the oracle, the strongest equivalence the driver
  *    can check.
  *
  * Every entry hits the full engine path: per-session catalog
  * registration, Catalyst analysis/optimization (including the session's
  * AutoSemiReduction + runtime bloom filters), AQE execution.
  */
object TpchCorpus {

  /** All 22 stock queries (2/11/16 run over the derived-partsupp CTE). */
  val ids: Seq[Int] = 1 to 22

  /** The adapted SQL text of stock query `i` — read from the classpath
    * ONCE per id (the bench times each entry's closure several
    * iterations; resource decode must not ride the timed path). */
  private val sqlTexts: Map[Int, String] = ids.map { i =>
    val path = f"/graft/tpch/q$i%02d.sql"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing corpus resource $path")
    i -> (try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close())
  }.toMap

  def sql(i: Int): String = sqlTexts(i)

  private def entryName(i: Int): String = f"h$i%02d_tpch"

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    ids.map { i =>
      val text = sql(i)
      entryName(i) -> ((s: SparkSession, dir: String) => Engine.executeQuery(s, dir, text))
    }.toMap

  /** The oracle is the SAME text DuckDB runs on the same tables. */
  val oracleSql: Map[String, String] =
    ids.map(i => entryName(i) -> sql(i)).toMap
}

/** The reference's second SQL corpus: the 13 Star Schema Benchmark
  * queries (`resources/query/ssb/original/1.1.sql..4.3.sql`, run by
  * `fpdb-main/test/SSBTest.cpp`), adapted to the testdata star schema and
  * run as plain text through [[Engine.executeQuery]] like [[TpchCorpus]].
  *
  * Mapping (per-file headers document query-specific deltas): the
  * denormalized `lineorder` is `lineitem JOIN orders`; the `date`
  * dimension folds into extract()/date ranges over o_orderdate;
  * s_region/c_region go through nation→region; p_category/p_mfgr map to
  * p_type and p_brand1 to p_brand; lo_revenue is
  * l_extendedprice·(1−l_discount) and (lo_supplycost being absent)
  * profit is revenue net of tax; the absent city columns make Q3.2/Q4.3
  * drill one level coarser (nations within a region). */
object SsbCorpus {

  val names: Seq[String] =
    Seq("1_1", "1_2", "1_3", "2_1", "2_2", "2_3",
        "3_1", "3_2", "3_3", "3_4", "4_1", "4_2", "4_3")

  private val sqlTexts: Map[String, String] = names.map { name =>
    val path = s"/graft/ssb/q$name.sql"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing corpus resource $path")
    name -> (try scala.io.Source.fromInputStream(in, "UTF-8").mkString
             finally in.close())
  }.toMap

  /** Read once per name at object init — never on the timed path. */
  def sql(name: String): String = sqlTexts(name)

  private def entryName(n: String): String = s"b${n.replace("_", "")}_ssb"

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    names.map { n =>
      val text = sql(n)
      entryName(n) -> ((s: SparkSession, dir: String) => Engine.executeQuery(s, dir, text))
    }.toMap

  val oracleSql: Map[String, String] =
    names.map(n => entryName(n) -> sql(n)).toMap
}

/** The reference's query-VARIANT corpora — its own plan-robustness
  * harness, run the same way as the originals (plain SQL text through
  * [[Engine.executeQuery]], same-string DuckDB oracle):
  *
  *  - `resources/query/tpch/modified/`: join-order rewrites of Q5/Q9
  *    (05-jo1/jo2, 09-jo1/jo2 — the corpus `fpdb-calcite`'s join-order
  *    heuristics are tested through); here they exercise Catalyst's
  *    join reordering on FROM-reordered, alias-rewritten forms whose
  *    results must equal the canonical queries'.
  *  - `resources/query/tpch/synthetic/`: the co-located fact-fact joins
  *    (co-join-2/3-table) the reference's storage-side co-located join
  *    runs on; graft's equivalent mechanism is the bucketed-write path
  *    (plans/Bucketing, zero-Exchange join asserted by BucketingSpec) —
  *    these entries pin the queries' semantics through the text path.
  *  - `resources/query/ssb/generated/`: five machine-generated SSB
  *    star queries at month grain (d_yearmonthnum) with drawn literal
  *    predicates.
  *  - `resources/query/ssb/typed/`: the originals with explicit CASTs
  *    at every measure/filter use site (the reference's all-string CSV
  *    schema exercise; see the bt* file headers for the
  *    value-preserving-cast adaptation note).
  *
  * Each .sql file documents its testdata-schema deltas in its header. */
object VariantCorpus {

  /** (entry name, classpath resource) — hv = TPC-H variants,
    * bv/bt = SSB generated/typed variants. */
  private val files: Seq[(String, String)] =
    Seq(
      "hv01_tpch_co" -> "/graft/tpch/hv01.sql",
      "hv02_tpch_co" -> "/graft/tpch/hv02.sql",
      "hv51_tpch_jo" -> "/graft/tpch/hv51.sql",
      "hv52_tpch_jo" -> "/graft/tpch/hv52.sql",
      "hv91_tpch_jo" -> "/graft/tpch/hv91.sql",
      "hv92_tpch_jo" -> "/graft/tpch/hv92.sql") ++
    (1 to 5).map(i => f"bv$i%02d_ssb_gen" -> f"/graft/ssb/bv$i%02d.sql") ++
    Seq("11", "12", "13", "21", "22", "23", "31", "32", "33", "34",
        "41", "42", "43")
      .map(n => s"bt${n}_ssb_typed" -> s"/graft/ssb/bt$n.sql")

  private def read(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing corpus resource $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private val texts: Map[String, String] =
    files.map { case (name, path) => name -> read(path) }.toMap

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    texts.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => Engine.executeQuery(s, dir, text))
    }

  /** Same text, same engine-equivalence contract as the originals. */
  val oracleSql: Map[String, String] = texts

  /** The raw corpus text of one entry — CboReorderSpec runs the
    * join-order variant pairs against ANALYZEd catalog tables (not the
    * Engine's stat-less temp views) to pin plan convergence. */
  def sqlText(entry: String): String = texts(entry)
}
