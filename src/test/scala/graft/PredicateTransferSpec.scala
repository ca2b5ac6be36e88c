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

  test("reduceBackward plans a semi join with the DIM on the left and measurably reduces it") {
    // r13 verdict item 1: the reference transfers BOTH directions
    // (SmallToLargePredTransOrder.cpp builds a BloomFilterCreate(B)/
    // Use(B) pair per edge; BFSPredTransOrder carries TransferDir::BOTH).
    // graft's backward leg: the forward-reduced fact's surviving keys
    // semi-reduce each dim BEFORE the wide join.
    import spark.implicits._
    val part = Tables.part(spark, sfDir).filter($"p_type" === "PROMO")
    val li = PredicateTransfer.reduce(Tables.lineitem(spark, sfDir),
      Seq((part, $"l_partkey" === $"p_partkey")))
    val orders = Tables.orders(spark, sfDir)
    val Seq(ordReduced) = PredicateTransfer.reduceBackward(li,
      Seq((orders, $"o_orderkey" === $"l_orderkey")))
    // plan shape: a LeftSemi join whose LEFT side is the orders leaf —
    // the dim is what survives, the fact is only the build/filter side
    val plan = ordReduced.queryExecution.optimizedPlan
    val semi = plan.collect {
      case j @ org.apache.spark.sql.catalyst.plans.logical.Join(
          left, _, org.apache.spark.sql.catalyst.plans.LeftSemi, _, _)
          if left.output.exists(_.name == "o_orderkey") => j
    }
    assert(semi.nonEmpty,
      s"expected a backward LeftSemi with orders on the left:\n$plan")
    // the backward pass must be a real reduction on this shape: PROMO is
    // ~1/6 of parts, so a large fraction of orders has no surviving line
    val before = orders.count()
    val after = ordReduced.count()
    assert(after > 0 && after < before,
      s"backward transfer must reduce orders: $after vs $before")
    // and it is PURE: member rows identical to a plain dim-side semi
    val plain = orders.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
    assert(ordReduced.exceptAll(plain).isEmpty &&
      plain.exceptAll(ordReduced).isEmpty,
      "reduceBackward must equal the plain dim-side semi join")
  }

  test("transfer (forward then backward) preserves the wide join's rows") {
    import spark.implicits._
    val part = Tables.part(spark, sfDir).filter($"p_type" === "STANDARD")
    val supp = Tables.supplier(spark, sfDir)
    val (li, Seq(partR, suppR)) = PredicateTransfer.transfer(
      Tables.lineitem(spark, sfDir), Seq(
        (part, $"l_partkey" === $"p_partkey"),
        (supp, $"l_suppkey" === $"s_suppkey")))
    val transferred = li
      .join(partR, $"l_partkey" === $"p_partkey")
      .join(suppR, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"p_partkey", $"s_suppkey")
    val plain = Tables.lineitem(spark, sfDir)
      .join(part, $"l_partkey" === $"p_partkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"p_partkey", $"s_suppkey")
    assert(transferred.count() == plain.count())
    assert(transferred.exceptAll(plain).isEmpty &&
      plain.exceptAll(transferred).isEmpty,
      "two-direction transfer must never change the wide join's rows")
  }
}
