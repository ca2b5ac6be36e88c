package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.sources.Tables

/** Dev-only A/B harness for the r18 optimization round (the ProfileR17
  * discipline): each candidate rewrite timed against its previous form to
  * the noop sink, min-of-N, interleaved in ONE session so JIT/page-cache/
  * host state cancel. "base" variants are THROWAWAY copies of the r17
  * forms; the operators already carry the r18 rewrites, so base-vs-entry
  * is the A/B.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileR18 [labels...]"
  */
object ProfileR18 {

  private def timeNoop(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.get("profile-r18")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    // ---- hv01/hv02: engine probe-spread vs plain path ------------------
    // The co-join spread keys on the EXACT shipped text, so appending a
    // comment-only suffix disables it without changing the query — the
    // honest same-session A/B for an engine-internal change.
    def hv(n: Int, spread: Boolean): DataFrame = {
      val text = graft.operators.VariantCorpus.sqlText(f"hv$n%02d_tpch_co")
      graft.Engine.executeQuery(s, dir,
        if (spread) text else text + "\n-- nospread-control")
    }

    // ---- d15: r17 form (4 independent sig/sh subtrees) -----------------
    import graft.operators.Dedup.{minhashCandidates, minhashSignatures, NumHashes}
    def d15_base(): DataFrame = {
      val docs = Tables.documents(s, dir)
      val pairs = minhashCandidates(docs)
      val sig = minhashSignatures(docs)
      val sh = Tables.spread(docs)
        .withColumn("w", graft.operators.TextAnalysis.words($"text"))
        .withColumn("sh", graft.operators.TextAnalysis.shingles($"w", 3))
        .select($"doc_id", $"sh")
      val matches = (0 until NumHashes)
        .map(k => when(col(f"a.m$k%02d") === col(f"b.m$k%02d"), 1).otherwise(0))
        .reduce(_ + _)
      val inter = size(array_intersect($"sh_a", $"sh_b"))
      pairs
        .join(sig.as("a"), $"doc_a" === $"a.doc_id")
        .join(sig.as("b"), $"doc_b" === $"b.doc_id")
        .withColumn("est_j", matches.cast("double") / NumHashes)
        .select($"doc_a", $"doc_b", $"est_j")
        .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
        .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
        .withColumn("exact_j",
          inter.cast("double") / (size($"sh_a") + size($"sh_b") - inter))
        .select($"doc_a", $"doc_b", $"est_j", $"exact_j",
          abs($"est_j" - $"exact_j").as("abs_err"))
        .orderBy($"doc_a", $"doc_b")
    }

    // ---- d17: r17 form (seen bands consumed twice, no clustering) ------
    import graft.operators.Dedup.{bandHashes, MaxBucketSize}
    def d17_base(): DataFrame = {
      val docs = Tables.documents(s, dir)
      val seenB = bandHashes(docs.filter(pmod($"doc_id", lit(2)) === 0))
      val newB = bandHashes(docs.filter(pmod($"doc_id", lit(2)) === 1))
      val okBuckets = seenB.groupBy($"band_idx", $"band_hash")
        .agg(countDistinct($"doc_id").as("n")).filter($"n" <= MaxBucketSize)
        .select($"band_idx", $"band_hash")
      val seenOk = seenB.join(okBuckets, Seq("band_idx", "band_hash"), "left_semi")
      newB.join(seenOk.select($"band_idx", $"band_hash", $"doc_id".as("seen_doc")),
          Seq("band_idx", "band_hash"))
        .select($"doc_id".as("new_doc"), $"seen_doc")
        .distinct()
        .orderBy($"new_doc", $"seen_doc")
    }

    // ---- ev11: r17 form (match in every shared bucket, distinct dedups) -
    def ev11_base(): DataFrame = {
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

    // ---- d15 mid: combined per-doc frame, planner-chosen joins ---------
    // (no merge hints: lets the vocabulary-sized side broadcast, so the
    // combined frame computes twice — still half the base's 4 subtrees —
    // without the SMJ sort/exchange chain the hinted form paid for)
    def d15_mid(): DataFrame = {
      val docs = Tables.documents(s, dir)
      val pairs = minhashCandidates(docs)
      val sigCols = (0 until NumHashes)
        .map(k => element_at(col("sig"), k + 1).as(f"m$k%02d"))
      val per = Tables.spread(docs)
        .withColumn("w", graft.operators.TextAnalysis.words($"text"))
        .withColumn("sh", graft.operators.TextAnalysis.shingles($"w", 3))
        .withColumn("sig", graft.functions.MinHashLcg.column(col("sh"), NumHashes))
        .select((col("doc_id") +: col("sh") +: sigCols): _*)
      val matches = (0 until NumHashes)
        .map(k => when(col(f"a.m$k%02d") === col(f"b.m$k%02d"), 1).otherwise(0))
        .reduce(_ + _)
      val inter = size(array_intersect($"a.sh", $"b.sh"))
      pairs
        .join(per.as("a"), $"doc_a" === $"a.doc_id")
        .join(per.as("b"), $"doc_b" === $"b.doc_id")
        .withColumn("est_j", matches.cast("double") / NumHashes)
        .withColumn("exact_j",
          inter.cast("double") / (size($"a.sh") + size($"b.sh") - inter))
        .select($"doc_a", $"doc_b", $"est_j", $"exact_j",
          abs($"est_j" - $"exact_j").as("abs_err"))
        .orderBy($"doc_a", $"doc_b")
    }

    // ---- q59: recursive CTE, LocalRelation frontier conf A/B -----------
    // (GraftSession now sets 100000 session-wide, so the BASE leg pins
    // the stock default back explicitly for the comparison)
    def q59_conf(anchorLimit: Option[String]): DataFrame = {
      val key = "spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation"
      val prev = s.conf.getOption(key)
      anchorLimit match {
        case Some(v) => s.conf.set(key, v)
        case None    => ()
      }
      try SparkEntry.queries("q59_recursive")(s, dir)
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => if (anchorLimit.isDefined) s.conf.unset(key)
      }
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "hv01_spread" -> (() => hv(1, spread = true)),
      "hv01_base" -> (() => hv(1, spread = false)),
      "hv02_spread" -> (() => hv(2, spread = true)),
      "hv02_base" -> (() => hv(2, spread = false)),
      "d15_new" -> (() => SparkEntry.queries("d15_minhash_estimate")(s, dir)),
      "d15_base" -> (() => d15_base()),
      "d15_mid" -> (() => d15_mid()),
      "d17_new" -> (() => SparkEntry.queries("d17_incremental_lsh")(s, dir)),
      "d17_base" -> (() => d17_base()),
      "ev11_new" -> (() => SparkEntry.queries("ev11_session_overlap")(s, dir)),
      "ev11_base" -> (() => ev11_base()),
      "q59_base" -> (() => q59_conf(Some("100"))),
      "q59_local" -> (() => q59_conf(Some("100000"))),
      "dm10_base" -> (() => SparkEntry.queries("dm10_conf_mode")(s, dir)),
      "t07_entry" -> (() => SparkEntry.queries("t07_tfidf")(s, dir)),
      "h01_entry" -> (() => SparkEntry.queries("h01_tpch")(s, dir)),
      "h21_entry" -> (() => SparkEntry.queries("h21_tpch")(s, dir)),
      "hv91_entry" -> (() => SparkEntry.queries("hv91_tpch_jo")(s, dir)),
      "hv92_entry" -> (() => SparkEntry.queries("hv92_tpch_jo")(s, dir))
    )

    // `dm10split`: construct+route (plan-time) vs execution legs for the
    // conf-mode entry — attributes dm10's wall time to routing vs the
    // hybrid zip execution (r17 verdict item 4).
    if (args.contains("dm10split")) {
      (1 to 2).foreach { _ =>
        try timeNoop(SparkEntry.queries("dm10_conf_mode")(s, dir))
        catch { case e: Throwable => println(s"[warm] $e") }
      }
      println("run, construct_route_ms, exec_ms")
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries("dm10_conf_mode")(s, dir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"$i: ${(t1 - t0) / 1e6}%8.1f ${(t2 - t1) / 1e6}%8.1f")
      }
      // control: the same SQL through the plain engine path
      (1 to 2).foreach { _ =>
        try timeNoop(graft.Engine.executeQuery(s, dir,
          graft.operators.SsbCorpus.sql("2_1")))
        catch { case e: Throwable => println(s"[warm] $e") }
      }
      println("plain-path control (construct_ms, exec_ms)")
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.Engine.executeQuery(s, dir,
          graft.operators.SsbCorpus.sql("2_1"))
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"$i: ${(t1 - t0) / 1e6}%8.1f ${(t2 - t1) / 1e6}%8.1f")
      }
      s.stop(); return
    }

    val wanted = if (args.isEmpty) variants else variants.filter(v => args.contains(v._1))

    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    wanted.foreach { case (l, f) =>
      try timeNoop(f()) catch { case e: Throwable =>
        println(s"[profile] $l FAILED: ${e.getMessage}") }
    }
    val out = (1 to reps).flatMap { _ =>
      wanted.map { case (l, f) =>
        l -> (try timeNoop(f()) catch { case _: Throwable => -1.0 })
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy { case (l, _) => wanted.indexWhere(_._1 == l) }
    println("==== RESULTS (min | sorted runs) ====")
    out.foreach { case (l, ts) =>
      val ok = ts.filter(_ >= 0)
      val mn = if (ok.isEmpty) -1.0 else ok.min
      println(f"$l%-16s min=$mn%6.3f  runs=${ts.sorted.map(t => f"$t%5.3f").mkString(" ")}")
    }
    s.stop()
  }
}
