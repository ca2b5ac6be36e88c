package graft

import graft.plans.PredicateTransfer
import graft.sources.Tables

/** Predicate-transfer utility: semantics preserved, auto ordering sorts
  * dims small-to-large from plan stats (the p01 oracle entry covers the
  * end-to-end star query). */
class PredicateTransferSpec extends SparkSpec {

  test("reduceAuto orders dims smallest-first from plan stats") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir) // much smaller than orders
    val ord = Tables.orders(spark, sfDir)
    // passed biggest-first on purpose; auto ordering must flip them
    val reduced = PredicateTransfer.reduceAuto(li, Seq(
      (ord, $"l_orderkey" === $"o_orderkey"),
      (sup, $"l_suppkey" === $"s_suppkey")))
    val lines = reduced.queryExecution.optimizedPlan.toString.linesIterator.toSeq
    val ordJoin = lines.indexWhere(l => l.contains("Join LeftSemi") && l.contains("o_orderkey"))
    val supJoin = lines.indexWhere(l => l.contains("Join LeftSemi") && l.contains("s_suppkey"))
    assert(ordJoin >= 0 && supJoin >= 0, s"expected two semi joins:\n${lines.mkString("\n")}")
    assert(ordJoin < supJoin,
      "the smaller dim (supplier) must be applied first (deeper in the tree)")
  }

  test("reduce and reduceAuto are pure filters: row count matches a plain semi") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir).filter($"s_nationkey" < 5)
    val viaReduce = PredicateTransfer.reduce(li,
      Seq((sup, $"l_suppkey" === $"s_suppkey"))).count()
    val viaAuto = PredicateTransfer.reduceAuto(li,
      Seq((sup, $"l_suppkey" === $"s_suppkey"))).count()
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey", "left_semi").count()
    assert(viaReduce == plain && viaAuto == plain)
    assert(plain > 0 && plain < li.count(), "filter must be real and partial")
  }
}
