package graft

import org.apache.spark.sql.functions._
import graft.plans.Bucketing
import graft.sources.Tables

/** Bucketed co-located joins: same-bucketed fact tables join without a
  * shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without shuffle exchanges") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real shuffle-or-colocated join decision (no broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity"),
        "li_bkt", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice"),
        "ord_bkt", "o_orderkey", 4)
      val joined = Bucketing.readBucketed(spark, "li_bkt")
        .join(Bucketing.readBucketed(spark, "ord_bkt"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-located join must not shuffle:\n${plan.take(1500)}")

      // and it computes the same result as the plain join
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
        .agg(sum($"l_quantity" * $"o_totalprice")).collect().head.getDouble(0)
      val got = joined
        .agg(sum($"l_quantity" * $"o_totalprice")).collect().head.getDouble(0)
      assert(math.abs(got - expected) / math.abs(expected) < 1e-9)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
