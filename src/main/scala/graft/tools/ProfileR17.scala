package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.sources.Tables

/** Dev-only A/B harness for the r17 optimization round: each candidate
  * rewrite next to its current form, timed to the noop sink min-of-N in
  * one session (guide §1.4). Variants here are THROWAWAY copies — the
  * real change lands in the operator once a variant measures faster and
  * the oracle proves row-identity.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileR17 [labels...]"
  */
object ProfileR17 {

  private def timeNoop(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.get("profile-r17")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val words = (c: Column) => split(c, " ")

    // ---- variant frames ------------------------------------------------
    def q01_base() = SparkEntry.queries("q01_group_agg")(s, dir)
    def q01_spread() =
      Tables.spread(Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          Tables.exactSum($"l_extendedprice").as("sum_base_price"),
          Tables.exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          Tables.exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          avg($"l_quantity").as("avg_qty"),
          avg($"l_extendedprice").as("avg_price"),
          avg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")

    def q35_base() = SparkEntry.queries("q35_percentiles")(s, dir)
    def q35_bykey() =
      Tables.lineitem(s, dir)
        .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
        .repartition($"l_returnflag")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("median_price"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("percentile(l_quantity, 0.25)").as("p25_qty"))
        .orderBy($"l_returnflag")

    def q43_base() = SparkEntry.queries("q43_salted_join")(s, dir)
    def q43_salted(saltOf: Column => Column, spreadFact: Boolean) = {
      val salts = 8
      val fact0 = Tables.lineitem(s, dir)
      val fact = if (spreadFact) Tables.spread(
        fact0.select($"l_orderkey", $"l_linenumber", $"l_extendedprice")) else fact0
      val dim = Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority")
      val saltedFact = fact.withColumn("__fsalt",
        saltOf(concat($"l_orderkey", lit(":"), $"l_linenumber")))
      val saltedDim = dim.withColumn("__dsalt",
        explode(array((0 until salts).map(lit): _*)))
      saltedFact.join(saltedDim,
          $"l_orderkey" === $"o_orderkey" && col("__fsalt") === col("__dsalt"))
        .drop("__fsalt", "__dsalt")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), Tables.exactSum($"l_extendedprice").as("gross"))
        .orderBy($"o_orderpriority")
    }
    val md5Salt = (c: Column) => pmod(
      conv(substring(md5(coalesce(c.cast("string"), lit(""))), 1, 2), 16, 10)
        .cast("int"), lit(8))
    val xxSalt = (c: Column) =>
      pmod(xxhash64(coalesce(c.cast("string"), lit(""))), lit(8L)).cast("int")

    def q30_base() = SparkEntry.queries("q30_multi_exists")(s, dir)
    def q30_bykey() = {
      val perSupp = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
        .repartition($"l_orderkey")
        .groupBy($"l_orderkey", $"l_suppkey")
        .agg(sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("r_cnt"))
      val byOrder = Window.partitionBy($"l_orderkey")
      perSupp
        .withColumn("n_supp", count(lit(1)).over(byOrder))
        .withColumn("n_supp_r", sum(when($"r_cnt" > 0, 1L).otherwise(0L)).over(byOrder))
        .filter($"r_cnt" > 0 && $"n_supp" > 1 && $"n_supp_r" === 1)
        .groupBy($"l_suppkey".as("suppkey"))
        .agg(sum($"r_cnt").as("numwait"))
        .orderBy($"numwait".desc, $"suppkey")
        .limit(20)
    }

    def t07_base() = SparkEntry.queries("t07_tfidf")(s, dir)
    def t07_bykey() = {
      val docs = Tables.documents(s, dir)
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = docs.repartition($"doc_id")
        .select($"doc_id", explode(words($"text")).as("word"))
        .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"word")
      tf.join(broadcast(df), "word")
        .crossJoin(broadcast(n))
        .withColumn("score", $"tf" * log($"n_docs" / $"df"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"doc_id", $"rank", $"word", $"score")
        .orderBy($"doc_id", $"rank")
    }

    def t08_base() = SparkEntry.queries("t08_repetition")(s, dir)
    def t08_bykey() = {
      val docs = Tables.documents(s, dir).repartition($"doc_id")
        .withColumn("w", words($"text"))
      val shingles = (w: Column, k: Int) =>
        graft.operators.TextAnalysis.shingles(w, k)
      val perDoc = docs.select(
        $"doc_id",
        size($"w").as("n_words"),
        (lit(1.0) - size(shingles($"w", 3)).cast("double")
          / greatest(size($"w") - 2, lit(1))).as("dup_trigram_frac"))
      val bigram = docs
        .select($"doc_id",
          explode(graft.functions.WordShingles.columnAll($"w", 2)).as("bg"))
        .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("f"))
        .groupBy($"doc_id")
        .agg((max($"f").cast("double") / sum($"f")).as("top_bigram_share"))
      perDoc.join(bigram, Seq("doc_id"), "left")
        .select($"doc_id", $"n_words", $"top_bigram_share", $"dup_trigram_frac",
          ($"n_words" >= 20 && coalesce($"top_bigram_share", lit(0.0)) <= 0.1
            && $"dup_trigram_frac" <= 0.05).as("gopher_ok"))
        .orderBy($"doc_id")
    }

    def ev16_base() = SparkEntry.queries("ev16_interpolate")(s, dir)
    def ev16_segment() = {
      val obs = Tables.events(s, dir)
        .filter($"user_id" < 50)
        .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
        .agg(avg($"value").as("v"))
      val byUser = Window.partitionBy($"user_id").orderBy($"hour")
      obs
        .withColumn("nh", lead($"hour", 1).over(byUser))
        .withColumn("nv", lead($"v", 1).over(byUser))
        .select($"user_id", $"hour".as("ph"), $"v".as("pv"), $"nh", $"nv")
        .select($"user_id", $"ph", $"pv", $"nh", $"nv",
          explode(sequence($"ph",
            coalesce($"nh" - expr("INTERVAL 1 HOUR"), $"ph"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
        .withColumn("filled", when($"hour" === $"ph", $"pv").otherwise(
          $"pv" + ($"nv" - $"pv")
            * (unix_timestamp($"hour") - unix_timestamp($"ph")).cast("double")
            / (unix_timestamp($"nh") - unix_timestamp($"ph")).cast("double")))
        .select($"user_id", $"hour", $"filled", ($"hour" =!= $"ph").as("interpolated"))
        .orderBy($"user_id", $"hour")
    }

    def ev11_base() = SparkEntry.queries("ev11_session_overlap")(s, dir)
    def ev11_ckpt() = {
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val iv = Tables.events(s, dir)
        .withColumn("sec", unix_timestamp($"ts"))
        .withColumn("prev_s", lag($"sec", 1).over(byUser))
        .withColumn("ns",
          when($"prev_s".isNull || $"sec" - $"prev_s" > 1800, 1).otherwise(0))
        .withColumn("sid", sum($"ns").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(min($"sec").as("start_s"), max($"sec").as("end_s"))
      val bucketed = iv.withColumn("bucket",
        explode(sequence(floor($"start_s" / 3600L).cast("long"),
          floor($"end_s" / 3600L).cast("long")))).localCheckpoint()
      val a = bucketed.select($"bucket", $"user_id".as("u1"),
        $"start_s".as("start1"), $"end_s".as("end1"))
      val b = bucketed.select($"bucket".as("bucket2"), $"user_id".as("u2"),
        $"start_s".as("start2"), $"end_s".as("end2"))
      a.join(b, $"bucket" === $"bucket2" && $"u1" < $"u2" &&
          $"start1" <= $"end2" && $"start2" <= $"end1")
        .select($"u1", $"start1", $"u2", $"start2")
        .distinct()
        .orderBy($"u1", $"start1", $"u2", $"start2")
    }

    def ev11_merge() = {
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val iv = Tables.events(s, dir)
        .withColumn("sec", unix_timestamp($"ts"))
        .withColumn("prev_s", lag($"sec", 1).over(byUser))
        .withColumn("ns",
          when($"prev_s".isNull || $"sec" - $"prev_s" > 1800, 1).otherwise(0))
        .withColumn("sid", sum($"ns").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid")
        .agg(min($"sec").as("start_s"), max($"sec").as("end_s"))
      val bucketed = iv.withColumn("bucket",
        explode(sequence(floor($"start_s" / 3600L).cast("long"),
          floor($"end_s" / 3600L).cast("long"))))
      val a = bucketed.select($"bucket", $"user_id".as("u1"),
        $"start_s".as("start1"), $"end_s".as("end1")).hint("merge")
      val b = bucketed.select($"bucket".as("bucket2"), $"user_id".as("u2"),
        $"start_s".as("start2"), $"end_s".as("end2")).hint("merge")
      a.join(b, $"bucket" === $"bucket2" && $"u1" < $"u2" &&
          $"start1" <= $"end2" && $"start2" <= $"end1")
        .select($"u1", $"start1", $"u2", $"start2")
        .distinct()
        .orderBy($"u1", $"start1", $"u2", $"start2")
    }

    def hv02_base() = SparkEntry.queries("hv02_tpch_co")(s, dir)
    def partsupp_only() =
      graft.Engine.executeQuery(s, dir,
        "SELECT count(*) AS n, sum(ps_availqty) AS q FROM (" +
          "with partsupp as (\nselect\n  l_partkey as ps_partkey,\n  l_suppkey as ps_suppkey,\n  min(l_extendedprice / l_quantity) as ps_supplycost,\n  cast(sum(l_quantity) as bigint) as ps_availqty\nfrom lineitem\ngroup by l_partkey, l_suppkey\n)\nSELECT * FROM partsupp) t")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q01_base" -> (() => q01_base()),
      "q01_spread" -> (() => q01_spread()),
      "q35_base" -> (() => q35_base()),
      "q35_bykey" -> (() => q35_bykey()),
      "q43_base" -> (() => q43_base()),
      "q43_md5_inline" -> (() => q43_salted(md5Salt, spreadFact = false)),
      "q43_xx" -> (() => q43_salted(xxSalt, spreadFact = false)),
      "q43_xx_spread" -> (() => q43_salted(xxSalt, spreadFact = true)),
      "q30_base" -> (() => q30_base()),
      "q30_bykey" -> (() => q30_bykey()),
      "t07_base" -> (() => t07_base()),
      "t07_bykey" -> (() => t07_bykey()),
      "t08_base" -> (() => t08_base()),
      "t08_bykey" -> (() => t08_bykey()),
      "ev16_base" -> (() => ev16_base()),
      "ev16_segment" -> (() => ev16_segment()),
      "ev11_base" -> (() => ev11_base()),
      "ev11_ckpt" -> (() => ev11_ckpt()),
      "ev11_merge" -> (() => ev11_merge()),
      "hv02_base" -> (() => hv02_base()),
      "partsupp_only" -> (() => partsupp_only()),
      "q41_base" -> (() => SparkEntry.queries("q41_approx_distinct")(s, dir)),
      "q41_spread" -> (() => Tables.spread(Tables.lineitem(s, dir)
        .select($"l_returnflag", $"l_orderkey"))
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_orderkey").as("ad"),
          countDistinct($"l_orderkey").as("ed"))
        .select($"l_returnflag",
          (abs($"ad" - $"ed").cast("double") / $"ed" <= 0.1).as("distinct_ok"))
        .orderBy($"l_returnflag")),
      "s06_base" -> (() => SparkEntry.queries("s06_ann_ivf_recall")(s, dir)),
      "s09_base" -> (() => SparkEntry.queries("s09_ann_pq_recall")(s, dir)),
      "s11_base" -> (() => SparkEntry.queries("s11_ann_ivfpq_recall")(s, dir))
    )
    // `plantimes`: split a sample of tail entries into construction /
    // plan-force / execution time, to decide whether the ~0.3 s tail is
    // planning-bound or execution-bound.
    if (args.contains("plantimes")) {
      val sample = Seq("q05_star_join", "q13_sort_multi", "b12_ssb", "h06_tpch",
        "t01_token_count", "ev03_sessionize", "z01_zone_prune", "m01_thumb",
        "d01_exact_dup", "s01_knn_brute")
        .filter(SparkEntry.queries.contains)
      // warm everything once
      sample.foreach { n =>
        try SparkEntry.queries(n)(s, dir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } }
      println("entry, construct_ms, planforce_ms, exec_ms (min of 5)")
      sample.foreach { n =>
        val c = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
        (1 to 5).foreach { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(s, dir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis+optimization+physical
          val t2 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          c += (((t1-t0)/1e6, (t2-t1)/1e6, (t3-t2)/1e6))
        }
        println(f"$n%-22s ${c.map(_._1).min}%8.1f ${c.map(_._2).min}%8.1f ${c.map(_._3).min}%8.1f")
      }
      s.stop(); return
    }

    val wanted = if (args.isEmpty) variants else variants.filter(v => args.contains(v._1))

    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    // one warm pass over everything first (codegen, page cache, artifacts)
    wanted.foreach { case (l, f) =>
      try timeNoop(f()) catch { case e: Throwable =>
        println(s"[profile] $l FAILED: ${e.getMessage}") }
    }
    val out = wanted.map { case (l, f) =>
      val ts = (1 to reps).map(_ => try timeNoop(f()) catch { case _: Throwable => -1.0 })
      l -> ts
    }
    println("==== RESULTS (min | sorted runs) ====")
    out.foreach { case (l, ts) =>
      val ok = ts.filter(_ >= 0)
      val mn = if (ok.isEmpty) -1.0 else ok.min
      println(f"$l%-16s min=$mn%6.3f  runs=${ts.sorted.map(t => f"$t%5.3f").mkString(" ")}")
    }
    s.stop()
  }
}
