package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.sources.ZoneMapPruner

/** Property-style tests over generated inputs (deterministic seeds): the
  * native expressions against their composed formulations on adversarial
  * strings, asofJoin against a naive quadratic reference, and zone-map
  * pruning soundness. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // words incl. empty, unicode, punctuation, repeats
  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.const(""), Gen.const("héllo"), Gen.const("日本語"), Gen.const("a|b"),
    Gen.alphaNumStr.map(_.take(12)), Gen.const("the"), Gen.const("🙂🙃"))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("property: MinHashSignature == composed min(rotated md5) on generated texts") {
    import spark.implicits._
    val docs = samples(textGen, 120, seed = 7L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("sh", graft.operators.TextAnalysis.shingles(split($"text", " "), 3))
    val viaExpr = docs.select($"doc_id",
      graft.functions.MinHashSignature.column($"sh", 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val aggs = (0 until 4).map { k =>
      val rot = if (k == 0) md5($"s")
        else concat(substring(md5($"s"), k + 1, 32 - k), substring(md5($"s"), 1, k))
      min(rot).as(s"m$k")
    }
    val viaComposed = docs.select($"doc_id", explode($"sh").as("s"))
      .groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    // composed drops docs with empty shingle arrays; expr emits null sigs
    viaComposed.foreach { case (id, sig) => assert(viaExpr(id) == sig, s"doc $id") }
    (viaExpr.keySet -- viaComposed.keySet).foreach { id =>
      assert(viaExpr(id).forall(_ == null), s"doc $id: empty shingles must give null mins")
    }
  }

  test("property: MinHashLcg == composed LCG-over-md5-key on generated texts") {
    import graft.functions.MinHashLcg
    import spark.implicits._
    val docs = samples(textGen, 120, seed = 29L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("sh", graft.operators.TextAnalysis.shingles(split($"text", " "), 3))
    val viaExpr = docs.select($"doc_id", MinHashLcg.column($"sh", 4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Any](1))).toMap
    val v = conv(substring(md5($"s"), 1, 12), 16, 10).cast("long")
    val aggs = (0 until 4).map(k =>
      min(($"v" * MinHashLcg.A(k) + MinHashLcg.B(k)).bitwiseAND(MinHashLcg.Mask48)).as(s"m$k"))
    val viaComposed = docs.select($"doc_id", explode($"sh").as("s"))
      .withColumn("v", v)
      .groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    viaComposed.foreach { case (id, sig) =>
      assert(viaExpr(id).get == sig, s"doc $id")
    }
    (viaExpr.keySet -- viaComposed.keySet).foreach { id =>
      assert(viaExpr(id).get.forall(_ == null),
        s"doc $id: empty shingles must give null minhashes")
    }
  }

  test("property: SimHash32 == composed bit votes on generated texts") {
    import spark.implicits._
    val docs = samples(textGen, 120, seed = 11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaExpr = docs
      .select($"doc_id", graft.functions.SimHash32.column(split($"text", " ")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = conv(substring(md5($"word"), 1, 8), 16, 10).cast("long")
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftright($"v", j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"sb$j"))
    val fp = (0 until 32)
      .map(j => when(col(s"sb$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val viaComposed = docs.select($"doc_id", explode(split($"text", " ")).as("word"))
      .withColumn("v", v)
      .groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", fp.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaComposed)
  }

  test("property: asofJoin == naive quadratic reference on generated events") {
    import spark.implicits._
    val rowGen = for {
      k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 40L)
    } yield (k, t)
    val leftRows = samples(rowGen, 60, seed = 13L).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
    val rightRows = samples(rowGen, 60, seed = 17L).zipWithIndex
      .map { case ((k, t), i) => (k, t, 1000L + i) }
      .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq // unique (k, t)
    val got = graft.streaming.EventStream.asofJoin(
        leftRows.toDF("k", "t", "lid"), rightRows.toDF("k", "t", "p"), "k", "t", "p")
      .collect().map(r => r.getLong(2) -> Option(r.getAs[java.lang.Long]("p")).map(_.toLong)).toMap
    val naive = leftRows.map { case (k, t, lid) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (cands.isEmpty) None else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got == naive)
  }

  test("property: star-contraction CC == driver union-find on random graphs") {
    import spark.implicits._
    // random edge sets over a small id space force chains, cycles, stars,
    // self-loops, parallel edges and isolated-pair mixes — the shapes the
    // large-star/small-star alternation must contract identically to the
    // obvious sequential union-find
    val edgeGen: Gen[(Long, Long)] =
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L))
    val graphGen: Gen[List[(Long, Long)]] =
      Gen.chooseNum(1, 50).flatMap(n => Gen.listOfN(n, edgeGen))
    samples(graphGen, 4, seed = 101L).foreach { edges =>
      val df = edges.toDF("src", "dst")
      val got = graft.operators.Dedup.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // sequential union-find with min-label extraction
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      // CC labels only nodes that appear in edges; union-find roots are
      // already component minima because unions always point max -> min
      assert(got == want, s"edges=$edges")
    }
  }

  test("property: zone-map pruning is sound (never drops a matching shard)") {
    import ZoneMapPruner._
    val valuesGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))
    val predGen: Gen[RangePred] = for {
      v <- Gen.chooseNum(-110.0, 110.0); hi <- Gen.chooseNum(-110.0, 110.0)
      p <- Gen.oneOf[RangePred](Gt("x", v), Ge("x", v), Lt("x", v), Le("x", v),
        EqTo("x", v), Neq("x", v), NotNull("x"),
        Between("x", math.min(v, hi), math.max(v, hi)))
    } yield p
    def sat(p: RangePred, x: Double): Boolean = p match {
      case Gt(_, v) => x > v;  case Ge(_, v) => x >= v
      case Lt(_, v) => x < v;  case Le(_, v) => x <= v
      case EqTo(_, v) => x == v
      case Neq(_, v) => x != v
      case NotNull(_) => true // generated values are never null
      case Between(_, lo, hi) => x >= lo && x <= hi
      case other => fail(s"unexpected pred $other")
    }
    val cases = samples(Gen.zip(valuesGen, Gen.listOfN(3, predGen)), 300, seed = 23L)
    cases.foreach { case (values, preds) =>
      val shard = graft.sources.ShardZoneMap("s", Map("x" -> (values.min, values.max)))
      val hasMatch = values.exists(x => preds.forall(sat(_, x)))
      val kept = prune(Seq(shard), preds).nonEmpty
      assert(!hasMatch || kept,
        s"pruned a shard containing a match: values=$values preds=$preds")
    }
  }

  test("property: outward rounding brackets exactly; long-domain pruning stays sound") {
    import ZoneMapPruner._
    // the r15 hazard band on purpose: longs straddling 2^53, where
    // doubles stop being exact, plus the full range
    val longGen = Gen.oneOf(
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue - 1),
      Gen.chooseNum((1L << 53) - 10, (1L << 53) + 1000),
      Gen.chooseNum(-(1L << 53) - 1000, -(1L << 53) + 10))
    samples(longGen, 600, seed = 77L).foreach { n =>
      val bd = java.math.BigDecimal.valueOf(n)
      val lo = outward(bd, isMin = true)
      val hi = outward(bd, isMin = false)
      assert(lo <= hi, s"inverted bracket for $n: $lo > $hi")
      assert(lo == Double.NegativeInfinity ||
        new java.math.BigDecimal(lo).compareTo(bd) <= 0,
        s"stored lo $lo exceeds exact $n")
      assert(hi == Double.PositiveInfinity ||
        new java.math.BigDecimal(hi).compareTo(bd) >= 0,
        s"stored hi $hi undercuts exact $n")
    }
    // prune soundness over LONG shard values with exact-double literals
    // (the rangePreds gate): bounds go through the same outward path
    // build() uses; satisfaction is TRUE long semantics
    val exactLitGen = longGen.suchThat(v =>
      v != Long.MaxValue && v.toDouble.toLong == v)
    val valsGen = Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, longGen))
    def sat(p: RangePred, x: Long): Boolean = p match {
      case Gt(_, v) => x > v.toLong;  case Ge(_, v) => x >= v.toLong
      case Lt(_, v) => x < v.toLong;  case Le(_, v) => x <= v.toLong
      case EqTo(_, v) => x == v.toLong
      case Between(_, lo, hi) => x >= lo.toLong && x <= hi.toLong
    }
    val predGen: Gen[RangePred] = for {
      v <- exactLitGen; h <- exactLitGen
      p <- Gen.oneOf[RangePred](Gt("x", v.toDouble), Ge("x", v.toDouble),
        Lt("x", v.toDouble), Le("x", v.toDouble), EqTo("x", v.toDouble),
        Between("x", math.min(v, h).toDouble, math.max(v, h).toDouble))
    } yield p
    val cases = samples(Gen.zip(valsGen, Gen.listOfN(2, predGen)), 400, seed = 79L)
    cases.foreach { case (values, preds) =>
      val loB = outward(java.math.BigDecimal.valueOf(values.min), isMin = true)
      val hiB = outward(java.math.BigDecimal.valueOf(values.max), isMin = false)
      val shard = graft.sources.ShardZoneMap("s", Map("x" -> (loB, hiB)))
      val hasMatch = values.exists(x => preds.forall(sat(_, x)))
      val kept = prune(Seq(shard), preds).nonEmpty
      assert(!hasMatch || kept,
        s"pruned a shard containing a match: values=$values preds=$preds " +
        s"bounds=($loB,$hiB)")
    }
  }

  test("property: string zone pruning is sound under UTF-8 ordering (incl. multi-byte)") {
    import ZoneMapPruner._
    // strings crossing the UTF-16-vs-UTF-8 ordering divergence on
    // purpose: supplementary plane (surrogate pairs) vs [U+E000, U+FFFF]
    // BMP chars — Java compareTo orders these OPPOSITE to Spark's
    // UTF8String byte order, exactly where a wrong comparator prunes a
    // shard whose rows match
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.const("\uffff"), Gen.const("\ue000"),
      Gen.const(new String(Character.toChars(0x10348))), // supplementary
      Gen.const(""), Gen.const("é"), Gen.const("中"))
    val strGen = Gen.chooseNum(0, 4).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))
    val valuesGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, strGen))
    val predGen: Gen[RangePred] = for {
      v <- strGen; h <- strGen
      p <- Gen.oneOf[RangePred](SGt("x", v), SGe("x", v), SLt("x", v),
        SLe("x", v), SEq("x", v), SNeq("x", v), SPrefix("x", v),
        if (utf8Cmp(v, h) <= 0) SBetween("x", v, h) else SBetween("x", h, v))
    } yield p
    def sat(p: RangePred, x: String): Boolean = p match {
      case SGt(_, v) => utf8Cmp(x, v) > 0;  case SGe(_, v) => utf8Cmp(x, v) >= 0
      case SLt(_, v) => utf8Cmp(x, v) < 0;  case SLe(_, v) => utf8Cmp(x, v) <= 0
      case SEq(_, v) => utf8Cmp(x, v) == 0
      case SNeq(_, v) => utf8Cmp(x, v) != 0
      case SPrefix(_, v) => x.startsWith(v)
      case SBetween(_, lo, hi) => utf8Cmp(x, lo) >= 0 && utf8Cmp(x, hi) <= 0
      case _ => fail(s"unexpected pred $p")
    }
    val cases = samples(Gen.zip(valuesGen, Gen.listOfN(3, predGen)), 300, seed = 41L)
    cases.foreach { case (values, preds) =>
      val lo = values.reduce((a, b) => if (utf8Cmp(a, b) <= 0) a else b)
      val hi = values.reduce((a, b) => if (utf8Cmp(a, b) >= 0) a else b)
      val shard = graft.sources.ShardZoneMap("s", Map.empty,
        Map("x" -> (lo, hi)))
      val hasMatch = values.exists(x => preds.forall(sat(_, x)))
      val kept = prune(Seq(shard), preds).nonEmpty
      assert(!hasMatch || kept,
        s"pruned a shard containing a match: values=$values preds=$preds")
    }
    // the divergence itself, pinned: UTF-8 byte order puts the
    // supplementary char ABOVE U+E000 (Java compareTo disagrees)
    val supp = new String(Character.toChars(0x10348))
    assert(utf8Cmp(supp, "\ue000") > 0 && supp.compareTo("\ue000") < 0,
      "fixture must cover the UTF-16/UTF-8 ordering divergence")
  }

  test("property: OR-tree pruning is sound over random interval shards") {
    import ZoneMapPruner._
    val valuesGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))
    val leafGen: Gen[RangePred] = for {
      v <- Gen.chooseNum(-110.0, 110.0)
      p <- Gen.oneOf[RangePred](Gt("x", v), Ge("x", v), Lt("x", v),
        Le("x", v), EqTo("x", v))
    } yield p
    // OrPred over 2-3 branches, each branch 1-2 conjuncts
    val branchGen = Gen.chooseNum(1, 2).flatMap(n => Gen.listOfN(n, leafGen))
    val orGen: Gen[RangePred] =
      Gen.chooseNum(2, 3).flatMap(n => Gen.listOfN(n, branchGen)).map(OrPred(_))
    def satLeaf(p: RangePred, x: Double): Boolean = p match {
      case Gt(_, v) => x > v;  case Ge(_, v) => x >= v
      case Lt(_, v) => x < v;  case Le(_, v) => x <= v
      case EqTo(_, v) => x == v
      case Between(_, lo, hi) => x >= lo && x <= hi
      case OrPred(bs) => bs.exists(_.forall(satLeaf(_, x)))
      case _ => fail(s"unexpected pred $p")
    }
    val cases = samples(Gen.zip(valuesGen,
      Gen.listOfN(2, Gen.oneOf(leafGen, orGen))), 300, seed = 43L)
    cases.foreach { case (values, preds) =>
      val shard = graft.sources.ShardZoneMap("s",
        Map("x" -> (values.min, values.max)))
      val hasMatch = values.exists(x => preds.forall(satLeaf(_, x)))
      val kept = prune(Seq(shard), preds).nonEmpty
      assert(!hasMatch || kept,
        s"pruned a shard containing a match: values=$values preds=$preds")
    }
  }

  test("property: CMS estimate never underestimates; verified candidates = exact heavies") {
    import spark.implicits._
    // skewed keys: key k appears ~k times (triangular), so thresholds
    // split the key set nontrivially
    val keyGen = Gen.chooseNum(1L, 40L).flatMap(k => Gen.listOfN(k.toInt, Gen.const(k)))
    val rows = samples(keyGen, 200, seed = 91L).flatten
    val df = rows.toDF("k")
    val sk = df.select(expr("count_min_sketch(k, 0.01d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val exact = df.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = df.select($"k").distinct()
      .select($"k", graft.functions.CmsEstimate.column(lit(sk), $"k").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated key $k: est=${est(k)} < exact=$n")
    }
    // the q58 contract: estimate-filtered candidates, exactly counted and
    // re-thresholded, are EXACTLY the true heavy-hitter set
    val threshold = 25L
    val heavies = exact.filter(_._2 >= threshold).keySet
    val viaSketch = est.filter(_._2 >= threshold).keySet // no false negatives
      .filter(k => exact(k) >= threshold)                // exact verify
    assert(viaSketch == heavies)
  }

  test("property: bloomNew == plain anti-join on generated seen/batch overlaps") {
    import spark.implicits._
    // d16's exactness claim, adversarially: random overlap structure,
    // including empty seen, empty batch, full overlap, and duplicate
    // batch rows. The sketch may false-positive freely (verify join
    // removes it); a false NEGATIVE would surface as a missing row here.
    val hashGen = Gen.chooseNum(0, 60).map(i => s"k$i")
    for ((seedBase, caseName) <- Seq(11L -> "mixed", 5000L -> "mixed2")) {
      val seen = samples(hashGen, 40, seed = seedBase).distinct
      val batch = samples(hashGen, 50, seed = seedBase + 1000) // dups kept
      for (seenSet <- Seq(seen, Seq.empty[String], batch.distinct)) {
        val seenDf = seenSet.toDF("h")
        val batchDf = batch.zipWithIndex
          .map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "h")
        val got = graft.operators.Dedup.bloomNew(seenDf, batchDf)
          .select($"doc_id").as[Long].collect().toSet
        val expect = batchDf.join(seenDf, Seq("h"), "left_anti")
          .select($"doc_id").as[Long].collect().toSet
        assert(got == expect,
          s"$caseName/seen=${seenSet.size}: bloom path $got != anti-join $expect")
        // the hash-domain-SLICED gate must agree on the same fixtures —
        // including slices the seen side never populates (null filter =
        // definitely absent) and the degenerate 1-slice case
        for (slices <- Seq(1, 4)) {
          val sliced = graft.operators.Dedup
            .bloomNewSliced(seenDf, batchDf, seenSet.size.toLong, slices)
            .select($"doc_id").as[Long].collect().toSet
          assert(sliced == expect,
            s"$caseName/seen=${seenSet.size}/slices=$slices: " +
              s"sliced gate $sliced != anti-join $expect")
        }
      }
    }
  }

  test("property: ordinal-zip mergedScan == plain scan over random column splits") {
    import graft.cache.{HybridScan, LRU, SegmentCache}
    // every lineitem column participates across iterations — the zip must
    // survive any cached/fetched partition of the schema, including the
    // NTZ timestamp and string columns
    val all = graft.sources.Tables.lineitem(spark, sfDir).columns.toSeq
    val rnd = new scala.util.Random(41L)
    (1 to 6).foreach { i =>
      val shuffled = rnd.shuffle(all)
      val k = 1 + rnd.nextInt(all.size - 1)
      val (cached, fetched0) = (shuffled.take(k), shuffled.drop(k))
      val fetched = if (fetched0.nonEmpty) fetched0 else Seq(shuffled.head)
      val cache = new SegmentCache(1L << 30, LRU)
      val merged = HybridScan.mergedScan(spark, sfDir, "lineitem",
        cachedCols = cached, fetchCols = fetched, fetchPredicate = None,
        cache = cache).select(all.map(col): _*)
      val plain = graft.sources.Tables.lineitem(spark, sfDir)
        .select(all.map(col): _*)
      assert(merged.count() == plain.count(), s"iter $i: cardinality")
      assert(merged.exceptAll(plain).isEmpty && plain.exceptAll(merged).isEmpty,
        s"iter $i: cached=$cached fetched=$fetched must zip to the plain rows")
      cache.invalidateAll()
    }
  }

  test("property: joining two hybrid scans composes (orders ⋈ merged lineitem)") {
    import graft.cache.{HybridScan, LRU, SegmentCache}
    val cache = new SegmentCache(1L << 30, LRU)
    val li = HybridScan.mergedScan(spark, sfDir, "lineitem",
      cachedCols = Seq("l_orderkey", "l_quantity"),
      fetchCols = Seq("l_extendedprice"), fetchPredicate = None, cache = cache)
    val ord = HybridScan.mergedScan(spark, sfDir, "orders",
      cachedCols = Seq("o_orderkey", "o_orderpriority"),
      fetchCols = Seq("o_totalprice"), fetchPredicate = None, cache = cache)
    val got = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_quantity") * col("o_totalprice")).as("x"))
      .collect().head.getDouble(0)
    val want = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_quantity") * col("o_totalprice")).as("x"))
      .collect().head.getDouble(0)
    assert(math.abs(got - want) <= 1e-6 * math.max(1.0, math.abs(want)),
      s"hybrid join $got vs plain $want")
    cache.invalidateAll()
  }
}
