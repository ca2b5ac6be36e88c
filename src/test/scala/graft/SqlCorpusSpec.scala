package graft

import graft.operators.{SsbCorpus, TpchCorpus}

/** The reference's TPC-H corpus as plain SQL text through the engine:
  * every adapted file must parse, analyze against the registered catalog,
  * and execute. Result equivalence vs DuckDB on the SAME text is the
  * driver's correctness gate (h01..h22 entries); this spec proves the
  * Spark side of the workflow end to end at the smallest scale factor. */
class SqlCorpusSpec extends SparkSpec {

  test("corpus is complete: all 22 stock queries") {
    assert(TpchCorpus.ids == (1 to 22), s"corpus ids: ${TpchCorpus.ids}")
    assert(TpchCorpus.queries.size == TpchCorpus.ids.size)
    assert(TpchCorpus.oracleSql.keySet == TpchCorpus.queries.keySet)
  }

  /** Literal selections that are empty at the 6k-row sf0.001 (a nation
    * pair with no supplier at this scale, the late-ship anti-join, the
    * recent-order anti-join): verified non-empty and DuckDB-equivalent by
    * the driver's sf0.01 gate; here they still must analyze and execute. */
  private val emptyAtSf0001 = Set(7, 21, 22)

  TpchCorpus.ids.foreach { i =>
    test(f"q$i%02d executes through Engine.executeQuery and returns rows") {
      val df = TpchCorpus.queries(f"h$i%02d_tpch")(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // scalar aggregates are 1 row by construction; row-returning shapes
      // must not silently select nothing at sf0.001 either
      if (emptyAtSf0001(i)) assert(n >= 0)
      else assert(n > 0, f"q$i%02d returned no rows at $sfDir")
    }
  }

  test("SSB corpus is complete: all 13 queries") {
    assert(SsbCorpus.names.size == 13)
    assert(SsbCorpus.oracleSql.keySet == SsbCorpus.queries.keySet)
  }

  /** Two-specific-nations drill-downs select nothing at sf0.001 (a
    * nation pair may have no trade among 6k lines); sf0.01 gate has data. */
  private val ssbEmptyAtSf0001 = Set("3_3", "3_4")

  SsbCorpus.names.foreach { n =>
    test(s"ssb q$n executes through Engine.executeQuery and returns rows") {
      val df = SsbCorpus.queries(s"b${n.replace("_", "")}_ssb")(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (ssbEmptyAtSf0001(n)) assert(df.count() >= 0)
      else assert(df.count() > 0, s"ssb q$n returned no rows at $sfDir")
    }
  }
}
