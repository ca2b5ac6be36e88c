package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup semantics on crafted inputs where ground truth is known. */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // long enough that a one-word edit keeps Jaccard ≈ 0.9: at J ≈ 0.9 a
  // 4-row band collides with p = J⁴ ≈ 0.66 and missing all 4 bands has
  // p ≈ 1.3% — a fair ask of any fixed hash family (at the old 14-word
  // text J ≈ 0.6 gave each family only a coin flip)
  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home tonight " +
    "while seven curious ravens watch silently from the old oak tree near the " +
    "river bend waiting for scraps of bread left behind by careless picnic guests"

  test("identical texts produce identical minhash signatures and a candidate pair") {
    val d = docs(1L -> base, 2L -> base,
      3L -> "completely different words about spark engines and columnar scans today")
    val sigs = Dedup.minhashSignatures(d).collect().map(r => r.getLong(0) -> r.toSeq.tail)
    assert(sigs.find(_._1 == 1L).get._2 == sigs.find(_._1 == 2L).get._2)
    val pairs = Dedup.minhashCandidates(d).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("one-word edit still collides in some LSH band") {
    val edited = base.replace("dog", "cat")
    val pairs = Dedup.minhashCandidates(docs(1L -> base, 2L -> edited))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)),
      "near-identical docs (1 of ~40 words changed, J ≈ 0.9) should share a band")
  }

  test("simhash: identical texts get hamming 0; near texts get small hamming") {
    val edited = base.replace("dog", "cat")
    val d = docs(1L -> base, 2L -> base, 3L -> edited)
    val fps = Dedup.simhashes(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    val hamming = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(hamming <= 8, s"one-word edit moved $hamming simhash bits")
    assert(fps(1L) >= 0 && fps(1L) < (1L << 32), "fingerprint is 32-bit")
  }

  test("jaccard pairs: exact duplicate scores 1.0, disjoint docs don't appear") {
    val d = docs(1L -> base, 2L -> base,
      3L -> "completely different words about spark engines and columnar scans today")
    val pairs = Dedup.jaccardPairs(d, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 3L)))
  }

  test("df-guarded jaccard: a hot shingle no longer generates quadratic candidates") {
    // 40 docs all sharing ONE boilerplate shingle, otherwise pairwise
    // disjoint — the templated-corpus shape that makes exact d06 quadratic
    val hot = (1L to 40L).map(i => i -> s"shared boiler plate u$i v$i w$i x$i")
    val d = docs(hot: _*)
    // unguarded: every pair meets in the "shared boiler plate" bucket
    val unguarded = Dedup.jaccardPairs(d, 0.0).count()
    assert(unguarded == 40L * 39 / 2, "all pairs share the hot shingle")
    // guarded at maxDf=10: the df-40 bucket is excluded, no pair shares a
    // kept shingle -> zero candidates, zero pairs
    assert(Dedup.jaccardPairsDfGuarded(d, 0.0, maxDf = 10).count() == 0)
  }

  test("df-guarded jaccard equals brute-force J over the KEPT shingle sets") {
    import spark.implicits._
    // doc texts built from a mix of one hot phrase (df > maxDf) and
    // overlapping rare tails, so guarded J differs from unguarded J
    val d = docs((1L to 12L).map { i =>
      val tail = if (i % 2 == 0) s"alpha beta gamma delta t$i" else s"alpha beta gamma delta s$i"
      i -> s"common header words here $tail"
    }: _*)
    val maxDf = 6
    val got = Dedup.jaccardPairsDfGuarded(d, 0.0, maxDf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute force: per-doc distinct 3-gram shingle sets, df filter, exact J
    val sets = d.collect().map { r =>
      val w = r.getString(1).split(" ")
      r.getLong(0) -> w.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val kept = sets.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
    val want = (for {
      a <- kept.keys; b <- kept.keys if a < b
      inter = kept(a).intersect(kept(b)).size if inter > 0
      j = inter.toDouble / (kept(a).size + kept(b).size - inter)
    } yield (a, b) -> j).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-12, s"pair $k") }
  }

  test("MinHashSignature expression equals the composed md5/min formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir).limit(100)
      .withColumn("w", split($"text", " "))
      .withColumn("sh", graft.operators.TextAnalysis.shingles($"w", 3))
    val viaExpr = d.select($"doc_id",
      graft.functions.MinHashSignature.column($"sh", 4).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // stream k = min over shingles of the md5 hex rotated left by k chars
    val aggs = (0 until 4).map { k =>
      val rot = if (k == 0) md5($"s")
        else concat(substring(md5($"s"), k + 1, 32 - k), substring(md5($"s"), 1, k))
      min(rot).as(s"m$k")
    }
    val viaComposed = d.select($"doc_id", explode($"sh").as("s"))
      .groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(viaExpr.keySet == viaComposed.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig == viaComposed(id), s"doc $id") }
  }

  test("minhash_sig is SQL-registered via GraftExtensions") {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir).limit(5)
      .createOrReplaceTempView("docs_mh_test")
    val n = spark.sql(
      """SELECT minhash_sig(split(text, ' '), 4) AS sig FROM docs_mh_test""")
      .filter(size($"sig") === 4).count()
    assert(n == 5)
  }

  test("MinHashLcg expression equals the composed (a*v+b) mod 2^48 formulation") {
    import graft.functions.MinHashLcg
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir).limit(100)
      .withColumn("w", split($"text", " "))
      .withColumn("sh", graft.operators.TextAnalysis.shingles($"w", 3))
    val viaExpr = d.select($"doc_id", MinHashLcg.column($"sh", 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val v = conv(substring(md5($"s"), 1, 12), 16, 10).cast("long")
    val aggs = (0 until 4).map(k =>
      min(($"v" * MinHashLcg.A(k) + MinHashLcg.B(k)).bitwiseAND(MinHashLcg.Mask48))
        .as(s"m$k"))
    val viaComposed = d.select($"doc_id", explode($"sh").as("s"))
      .withColumn("v", v)
      .groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(viaExpr.keySet == viaComposed.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig == viaComposed(id), s"doc $id") }
  }

  test("SimHash32 expression equals the composed explode/vote formulation") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir).limit(100)
    val viaExpr = Dedup.simhashes(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = conv(substring(md5($"word"), 1, 8), 16, 10).cast("long")
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftright($"v", j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"sb$j"))
    val fp = (0 until 32)
      .map(j => when(col(s"sb$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val viaComposed = d.select($"doc_id", explode(split($"text", " ")).as("word"))
      .withColumn("v", v)
      .groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", fp.as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaComposed)
  }

  test("connected components assigns min-id labels across chained pairs") {
    import spark.implicits._
    // components: {1,2,3} (chained), {7,9}, singletons excluded
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("src", "dst")
    val got = graft.operators.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("simhash pairs: banded candidate gen matches brute force, no nested-loop join") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir)
    val banded = Dedup.simhashPairs(d, 3)
    // scale guard: candidate generation must be the bucketed equi-join shape,
    // never an n² BroadcastNestedLoopJoin / cartesian over the corpus
    val physical = banded.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"banded simhash pairs must not plan an all-pairs join:\n$physical")
    // correctness guard: pigeonhole banding loses nothing vs brute force
    val fps = Dedup.simhashes(d).collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ida, idb, h)).toSet
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("64-bit simhash: banded pairs match brute force; sign bit handled") {
    // enough docs that some 64-bit fingerprints differ in high bits (incl.
    // bit 63, where the BIGINT goes negative — shifts must mask correctly)
    val d = docs((1L to 30L).map { i =>
      val twin = if (i % 2 == 0) s"${base} tail$i" else s"${base} tail${i - 1} extra"
      i -> twin
    }: _*)
    val fps = Dedup.simhashes(d, bits = 64).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(fps.exists(_._2 < 0), "some 64-bit fingerprint should set bit 63")
    val brute = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 7
    } yield (ida, idb, h)).toSet
    val got = Dedup.simhashPairs(d, maxHamming = 7, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("LSH bucket cap drops degenerate buckets (recall trade, capped work)") {
    // 4 identical docs land in one bucket per band (size 4)
    val d = docs(1L -> base, 2L -> base, 3L -> base, 4L -> base)
    assert(Dedup.minhashCandidates(d).count() == 6) // C(4,2) under default cap
    assert(Dedup.minhashCandidates(d, maxBucket = 3).count() == 0,
      "buckets over the cap must be dropped entirely")
  }

  test("connected components throws instead of returning unconverged labels") {
    import spark.implicits._
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    // star contraction needs ~log(diameter) rounds plus the confirming
    // round; one round can never certify a fixpoint from a chain
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 1)
    }
    val ok = Dedup.connectedComponents(chain).collect().map(r => r.getLong(1)).distinct
    assert(ok.sameElements(Array(1L)), "chain is one component labeled by its min id")
  }

  test("semantic dedup keeps exactly the vectors with no earlier near neighbor") {
    import spark.implicits._
    import graft.functions.CosineSimilarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val survivors = SparkEntry.queries("d11_semdedup")(spark, sfDir)
      .select($"vec_id").as[Long].collect().toSet
    // brute-force reference: dup iff some smaller-id vector is above tau
    val pairs = emb.select($"vec_id".as("a"), $"embedding".as("ea"))
      .crossJoin(emb.select($"vec_id".as("b"), $"embedding".as("eb")))
      .filter($"a" < $"b")
      .filter(CosineSimilarity.column($"ea", $"eb") > Dedup.SemDedupTau)
      .select($"b").as[Long].collect().toSet
    val all = emb.select($"vec_id").as[Long].collect().toSet
    assert(survivors == all -- pairs,
      "survivors must be the complement of later-id near-duplicates")
    assert(survivors.nonEmpty && survivors.size <= all.size)
  }

  test("contamination scoring broadcasts the benchmark set (corpus never shuffled by shingle)") {
    val df = SparkEntry.queries("t10_contamination")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$physical")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every score is a valid fraction and benchmark docs are excluded
    assert(rows.forall { r =>
      val f = r.getDouble(3); f >= 0.0 && f <= 1.0 && r.getLong(0) % 97 != 0
    })
  }

  test("minhash LSH candidates cover all very-high-jaccard pairs in testdata") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir)
    val trueHigh = Dedup.jaccardPairs(d, 0.9).select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashCandidates(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trueHigh.subsetOf(cands),
      s"missed near-dups: ${trueHigh -- cands}")
  }

  test("LSH candidate shuffle volume is independent of document length") {
    // The 100 TB design claim, as a measured number instead of prose:
    // minhashCandidates' shuffles carry (band, hash, doc_id) tuples and
    // pair ids — never text — so growing every document ~6× must leave
    // shuffle bytes within noise while a text-carrying shuffle would grow
    // ~6×. Uses the same task-metric tap the bench records per entry
    // (shuffle_bytes in BENCH_DETAIL.json io block; suites run serially,
    // so the bracket sees only this test's jobs).
    import spark.implicits._
    val tap = graft.util.ScanStats.attach(spark)
    def shuffleOf(df: org.apache.spark.sql.DataFrame): Long = {
      tap.reset()
      Dedup.minhashCandidates(df).collect()
      tap.shuffleBytes()
    }
    val thin = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val fat = thin.withColumn("text",
      concat_ws(" ", (1 to 6).map(_ => $"text"): _*))
    val a = shuffleOf(thin)
    val b = shuffleOf(fat)
    assert(a > 0, "expected the bucket groupBy to shuffle something")
    assert(b <= a * 2,
      s"shuffle grew with document length ($a B thin vs $b B at ~6× text) — " +
        "a shuffle in the LSH path is carrying text")
    tap.detach()
  }

  test("d16 bloom-gated incremental dedup is exactly the plain anti-join") {
    import spark.implicits._
    // seen: A, B; batch: one dup (B), one new (C). The sketch path must
    // return precisely the anti-join's rows — a bloom false negative
    // would lose a duplicate, a skipped verify would keep one.
    val seen = Seq("text aaa", "text bbb").toDF("text").select(md5($"text").as("h"))
    val batch = Seq((10L, "text bbb"), (11L, "text ccc")).toDF("doc_id", "text")
      .select($"doc_id", md5($"text").as("h"))
    val got = Dedup.bloomNew(seen, batch).select($"doc_id").as[Long].collect().toSet
    val plain = batch.join(seen, Seq("h"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == plain && got == Set(11L),
      s"bloom path $got must equal anti-join $plain = {11}")
  }

  test("d16 empty seen corpus: every batch row is new (null sketch guarded)") {
    import spark.implicits._
    // BloomFilterAggregate over zero rows yields a NULL sketch; an
    // unguarded NULL probe would three-valued-logic away the whole batch.
    val seen = Seq.empty[String].toDF("text").select(md5($"text").as("h"))
    val batch = Seq((10L, "text bbb"), (11L, "text ccc")).toDF("doc_id", "text")
      .select($"doc_id", md5($"text").as("h"))
    val got = Dedup.bloomNew(seen, batch).select($"doc_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L), s"empty corpus must pass the whole batch through, got $got")
  }

  test("d16 sketch sized from the corpus still gates at 10x the old fixed capacity") {
    import spark.implicits._
    // seen = 1M hashes (10x the previously hard-coded 100k capacity). A
    // saturated sketch would answer YES for nearly everything and the
    // gate would silently become the full anti-join; sized correctly,
    // the bloom-negative fraction of truly-new rows stays ≈ 1 - fpp.
    val n = 1000000L
    val seen = spark.range(n).select(md5(concat(lit("seen-"), $"id")).as("h"))
    val newRows = 1000
    val batch = spark.range(newRows).select(md5(concat(lit("new-"), $"id")).as("h"))
    val bytes = Dedup.bloomSidecar(seen, n)
    assert(bytes != null)
    val negatives = batch.filter(!Dedup.bloomMight(bytes, $"h")).count()
    assert(negatives >= (newRows * 0.9).toLong,
      s"only $negatives/$newRows truly-new rows short-circuited the anti-join — " +
        "the sketch is saturated (capacity not tracking the corpus)")
    // and no false negatives: every seen hash must answer YES
    val fn = seen.limit(1000).filter(!Dedup.bloomMight(bytes, $"h")).count()
    assert(fn == 0, s"$fn bloom false negatives — must be impossible")
  }

  test("d18 persistent band index: index side never shuffles; pairs equal the in-query variant") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // no broadcast (force a real distribution decision) and no AQE (a
      // statically traversable plan tree for the subtree assertion)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val edited = base.replace("dog", "cat")
      val seen = docs(2L -> base,
        4L -> "completely different words about spark engines and columnar scans today")
      Dedup.writeBandIndex(seen, "d18_spec_idx", 4)
      val got = Dedup.indexedLshPairs(spark, "d18_spec_idx", docs(1L -> edited))
      val plan = got.queryExecution.executedPlan
      def readsIndex(p: SparkPlan): Boolean =
        p.collect { case f: FileSourceScanExec => f }
          .exists(_.toString.contains("d18_spec_idx"))
      assert(readsIndex(plan), "plan must scan the persistent index table")
      assert(plan.toString.contains("Bucketed: true"),
        s"index scan must use the bucket layout:\n${plan.toString.take(2000)}")
      // THE claim: between the index scan and the batch join, zero
      // shuffle — the cap groupBy, the semi-join, and the batch join all
      // reuse the on-disk HashPartitioning(band_idx, band_hash); only
      // the batch side moves (and the post-join distinct shuffles pairs,
      // which are result-sized, not corpus-sized)
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      import org.apache.spark.sql.catalyst.plans.Inner
      val batchJoin = plan.collect {
        case j: BaseJoinExec if j.joinType == Inner && readsIndex(j) => j
      }
      assert(batchJoin.nonEmpty, s"no batch-vs-index join found:\n${plan.toString.take(2000)}")
      val indexSides = Seq(batchJoin.head.left, batchJoin.head.right).filter(readsIndex)
      assert(indexSides.nonEmpty)
      indexSides.foreach { side =>
        val shuffles = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"index side must plan shuffle-free:\n${side.toString.take(3000)}")
      }
      // and the rows are exactly the in-query d17 variant's
      val expected = Dedup.incrementalLshPairs(seen, docs(1L -> edited))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == expected && rows.contains((1L, 2L)),
        s"indexed pairs $rows must equal in-query pairs $expected")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS d18_spec_idx")
    }
  }

  test("compactBandIndex recovers crashed swaps and clears stale baks") {
    import graft.operators.Dedup
    val t = "cbi_recover_idx"
    val bak = t + "_compact_bak"
    try {
      Dedup.writeBandIndex(docs(2L -> base,
        4L -> "completely different words about spark engines and columnar scans today"), t, 4)
      val rows = spark.table(t).count()
      // crashed promote: the index parked under the bak name, nothing at
      // the queried name — the next compaction must swap it back, not die
      // on getTableMetadata
      spark.sql(s"ALTER TABLE $t RENAME TO $bak")
      Dedup.compactBandIndex(spark, t)
      assert(spark.table(t).count() == rows, "parked index not restored")
      assert(!spark.catalog.tableExists(bak))
      // completed swap's leftover bak: must be cleared up front, or the
      // promote rename fails TABLE_ALREADY_EXISTS on every future run
      spark.range(1).toDF("x").write.saveAsTable(bak)
      Dedup.compactBandIndex(spark, t)
      assert(!spark.catalog.tableExists(bak), "stale bak not cleared")
      assert(spark.table(t).count() == rows)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS $bak")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_compact_tmp")
    }
  }

  test("d18 append maintenance: processed batches join the index under the same bucket scheme") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val edited = base.replace("dog", "cat")
      // round 1: index holds only doc 4; the batch (doc 1 ~ doc 2) has
      // no near-dup in the corpus yet
      Dedup.writeBandIndex(
        docs(4L -> "completely different words about spark engines and columnar scans today"),
        "d18_spec_append", 4)
      val before = Dedup.indexedLshPairs(spark, "d18_spec_append", docs(1L -> edited))
        .collect()
      assert(!before.exists(r => r.getLong(1) == 2L), "doc 2 is not indexed yet")
      // maintenance: doc 2's batch was processed — append its bands
      Dedup.appendBandIndex(spark, "d18_spec_append", docs(2L -> base))
      val after = Dedup.indexedLshPairs(spark, "d18_spec_append", docs(1L -> edited))
      assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .contains((1L, 2L)), "the appended corpus must be visible to the next batch")
      // the append preserved the layout: the index side still plans
      // shuffle-free (multiple files per bucket is fine, re-partitioning
      // would not be)
      val plan = after.queryExecution.executedPlan
      assert(plan.toString.contains("Bucketed: true"),
        s"appended index must still scan bucketed:\n${plan.toString.take(2000)}")
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      import org.apache.spark.sql.catalyst.plans.Inner
      def readsIndex(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
          .exists(_.toString.contains("d18_spec_append"))
      val join = plan.collect {
        case j: BaseJoinExec if j.joinType == Inner && readsIndex(j) => j
      }.head
      Seq(join.left, join.right).filter(readsIndex).foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"appended index side must stay shuffle-free:\n${side.toString.take(2000)}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS d18_spec_append")
    }
  }

  test("compactBandIndex folds per-append files to one per bucket, same pairs, still bucketed") {
    import org.apache.spark.sql.functions.input_file_name
    try {
      val edited = base.replace("dog", "cat")
      Dedup.writeBandIndex(docs(2L -> base), "d18_spec_compact", 4)
      // three appended batches fragment the buckets
      for (id <- Seq(10L, 12L, 14L))
        Dedup.appendBandIndex(spark, "d18_spec_compact",
          docs(id -> s"unique filler text number $id about nothing in particular at all today"))
      def files(): Long = spark.table("d18_spec_compact")
        .select(input_file_name()).distinct().count()
      val before = Dedup.indexedLshPairs(spark, "d18_spec_compact", docs(1L -> edited))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fragmented = files()
      assert(fragmented > 4, s"appends must fragment the buckets (got $fragmented files)")
      Dedup.compactBandIndex(spark, "d18_spec_compact")
      assert(files() <= 4, s"compaction must fold to at most one file per bucket, got ${files()}")
      val after = Dedup.indexedLshPairs(spark, "d18_spec_compact", docs(1L -> edited))
      assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == before,
        "compaction must not change the candidate pairs")
      assert(after.queryExecution.executedPlan.toString.contains("Bucketed: true"),
        "the compacted table must still scan bucketed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS d18_spec_compact")
      spark.sql("DROP TABLE IF EXISTS d18_spec_compact_compact_tmp")
      spark.sql("DROP TABLE IF EXISTS d18_spec_compact_compact_bak")
    }
  }

  test("d19 persistent hash corpus: corpus side of the verify join never shuffles; append closes the loop") {
    import spark.implicits._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val seen = Seq("text aaa", "text bbb").toDF("text").select(md5($"text").as("h"))
      Dedup.writeHashCorpus(seen, "d19_spec_corpus", 4)
      val batch = Seq((10L, "text bbb"), (11L, "text ccc")).toDF("doc_id", "text")
        .select($"doc_id", md5($"text").as("h"))
      val got = Dedup.corpusNew(spark, "d19_spec_corpus", batch)
      assert(got.select($"doc_id").as[Long].collect().toSet == Set(11L),
        "persistent-corpus path must equal the plain anti-join")
      // the 100 TB property: the corpus-sized side of the verify join
      // reuses its bucket layout — only the bloom-positive batch slice
      // shuffles
      def readsCorpus(p: SparkPlan): Boolean =
        p.collect { case f: FileSourceScanExec => f }
          .exists(_.toString.contains("d19_spec_corpus"))
      val anti = got.queryExecution.executedPlan.collect {
        case j: BaseJoinExec if j.joinType == LeftAnti && readsCorpus(j) => j
      }
      assert(anti.nonEmpty, "verify join not found in the plan")
      Seq(anti.head.left, anti.head.right).filter(readsCorpus).foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"corpus side must plan shuffle-free:\n${side.toString.take(2500)}")
      }
      // maintenance: append the batch's NEW hashes — the identical batch
      // re-ingested is now all-duplicate
      Dedup.appendHashCorpus(spark, "d19_spec_corpus", got)
      assert(Dedup.corpusNew(spark, "d19_spec_corpus", batch).count() == 0,
        "an appended batch must be fully seen on replay")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS d19_spec_corpus")
    }
  }

  test("batchCandidates stays self-free even when the index already holds the batch (replay)") {
    try {
      val edited = base.replace("dog", "cat")
      Dedup.writeBandIndex(docs(2L -> base), "d18_spec_replay", 4)
      val batch = docs(1L -> edited, 3L -> edited) // 1 and 3 are in-batch near-dups
      // the crash-replay state: this batch's append committed, candidates re-run
      Dedup.appendBandIndex(spark, "d18_spec_replay", batch)
      val pairs = Dedup.batchCandidates(spark, "d18_spec_replay", batch)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L), (3L, 2L)),
        s"replayed batch must still see ONLY corpus-side pairs, got $pairs — " +
          "self/in-batch matches through its own committed bands are forbidden")
    } finally spark.sql("DROP TABLE IF EXISTS d18_spec_replay")
  }

  test("d16 sketch capacity raises Spark's runtime-filter caps instead of silently clamping") {
    import spark.implicits._
    // 10M expected items exceeds both default caps (4M items / 67M bits);
    // a clamped sketch serializes to ≤ 67108864/8 ≈ 8.39 MB — anything
    // larger proves the capacity actually took effect (measured: ~9.1 MB,
    // Spark's ~7.3 bits/item at its default fpp)
    val itemsCap = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsCap = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) = (spark.conf.get(itemsCap), spark.conf.get(bitsCap))
    val seen = Seq("a", "b").toDF("text").select(md5($"text").as("h"))
    val bytes = Dedup.bloomSidecar(seen, 10000000L)
    assert(bytes.length > 67108864 / 8,
      s"sketch is ${bytes.length} B — capacity was clamped by the session caps")
    // ...and the session-global caps are RESTORED afterwards: they also
    // clamp the optimizer's own injected runtime filters, and leaving
    // them raised would let any later unrelated join build a multi-GB
    // filter the defaults exist to prevent
    assert(spark.conf.get(itemsCap) == prevItems &&
      spark.conf.get(bitsCap) == prevBits,
      "bloom caps must be restored after the sidecar build")
  }

  test("replayed (duplicated) index rows never push a bucket over the cap") {
    // a crash-replayed append duplicates band ROWS; the cap must price a
    // bucket at its DISTINCT doc population — a row count would drop a
    // legitimate bucket and silently lose all its candidates, breaking
    // the documented replay tolerance
    val hotSeen = docs(2L -> base, 4L -> base, 6L -> base) // 3 distinct docs/bucket
    val replayed = hotSeen.union(hotSeen)                  // every band row twice
    val pairs = Dedup.incrementalLshPairs(replayed, docs(1L -> base), maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (1L, 6L)),
      s"cap must count distinct docs, not replayed rows — got $pairs")
  }

  test("d17 incremental LSH: batch meets its seen near-dup; seen-side cap bounds the join") {
    val edited = base.replace("dog", "cat")
    val seen = docs(2L -> base,
      4L -> "completely different words about spark engines and columnar scans today")
    val batch = docs(1L -> edited)
    val pairs = Dedup.incrementalLshPairs(seen, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "one-word edit must collide with its seen original")
    assert(!pairs.contains((1L, 4L)), "unrelated seen doc must not pair")
    // a degenerate seen bucket (4 identical docs) above the cap is
    // excluded BEFORE the batch join — the d03/d15 economics, applied to
    // the stationary index side
    val hotSeen = docs(2L -> base, 4L -> base, 6L -> base, 8L -> base)
    assert(Dedup.incrementalLshPairs(hotSeen, docs(1L -> base)).count() == 4 * 1)
    assert(Dedup.incrementalLshPairs(hotSeen, docs(1L -> base), maxBucket = 3).count() == 0,
      "a seen bucket over the cap must never expand against the batch")
  }

  test("rolling window hash: equal windows collide, unequal don't, n<k is empty") {
    import spark.implicits._
    val w = "w1 w2 w3 w4 w5" // the shared 5-word passage
    // the two copies sit at DIFFERENT offsets (prefix 3 vs mid 7 words),
    // so agreement exercises the O(1) roll across arbitrary distances,
    // not just the initial window
    val arr = (s"p1 p2 p3 $w m1 m2 m3 m4 m5 m6 m7 $w s1").split(" ").toSeq
    val hs = Seq(arr).toDF("ws")
      .select(graft.functions.RollingWindowHash.column(col("ws"), 5))
      .as[Seq[Long]].head()
    assert(hs.length == arr.length - 5 + 1)
    val first = 3; val second = 3 + 5 + 7 // 0-based starts of the two copies
    assert(hs(first) == hs(second), "equal 5-word windows must hash equal")
    val dups = hs.groupBy(identity).filter(_._2.size > 1).keys.toSet
    assert(dups == Set(hs(first)), "only the shared window may repeat")
    val short = Seq(Seq("a", "b")).toDF("ws")
      .select(graft.functions.RollingWindowHash.column(col("ws"), 5))
      .as[Seq[Long]].head()
    assert(short.isEmpty, "n < k has no windows")
  }

  test("rolling_window_hash is SQL-callable and matches the Column API") {
    import spark.implicits._
    val arr = (1 to 9).map(i => s"v$i")
    Seq(arr).toDF("ws").createOrReplaceTempView("rwh_probe")
    val viaSql = spark.sql("SELECT rolling_window_hash(ws, 4) AS hs FROM rwh_probe")
      .as[Seq[Long]].head()
    val viaCol = Seq(arr).toDF("ws")
      .select(graft.functions.RollingWindowHash.column(col("ws"), 4))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.length == 6)
  }

  test("substring spans: shared passage found at different alignments, maximal extent") {
    // 12-word passage S inside two docs at different offsets; all filler
    // words unique, so the ONLY duplicated 5-windows are those fully
    // inside S — the maximal span in each doc is exactly S's extent
    val s12 = (1 to 12).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $s12 a4 a5",
      2L -> s"b1 b2 b3 b4 b5 b6 $s12 b7")
    val spans = Dedup.substringSpans(d, 5)().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans == Set((1L, 4L, 15L, 12L), (2L, 7L, 18L, 12L)))
  }

  test("substring spans: contiguous duplicated windows merge, a one-word gap splits") {
    val p = "p1 p2 p3 p4 p5"
    val q = "q1 q2 q3 q4 q5"
    val d = docs(
      1L -> s"$p $p",   // dup windows at 1 and 6: 6 <= 1+5 -> one span [1,10]
      2L -> s"$q z $q") // dup windows at 1 and 7: 7 >  1+5 -> [1,5] and [7,11]
    val spans = Dedup.substringSpans(d, 5)().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans == Set((1L, 1L, 10L, 10L), (2L, 1L, 5L, 5L), (2L, 7L, 11L, 5L)))
  }

  test("span removal: whole-document duplicate loses everything; canonical copy untouched") {
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = Dedup.spanRemoval(docs(1L -> t, 2L -> t), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((2L, 30L, 30L, "")),
      "only the later copy is affected, and it loses all 30 words")
  }

  test("span removal: a partial copy loses exactly the copied extent") {
    val s12 = (1 to 12).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $s12 a4 a5",          // canonical occurrence of S
      2L -> s"b1 b2 b3 b4 b5 b6 $s12 b7")    // later copy at another offset
    val out = Dedup.spanRemoval(d, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((2L, 19L, 12L, "b1 b2 b3 b4 b5 b6 b7")))
  }

  test("groupwise split: every near-dup cluster lands in ONE split; singletons keep their naive split") {
    import spark.implicits._
    val docIds = (1L to 60L).toDF("doc_id")
    // docs 1..40 paired into 20 groups keyed by the lower member; 41..60 singleton
    val groups = (1L to 40L).map(d => (d, ((d - 1) / 2) * 2 + 1)).toDF("doc_id", "group_id")
    val out = Dedup.groupwiseSplit(docIds, groups).collect()
    assert(out.length == 60)
    out.groupBy(_.getAs[Long]("group_id")).foreach { case (gid, rows) =>
      assert(rows.map(_.getAs[String]("split")).toSet.size == 1,
        s"group $gid straddles splits — the leakage d22 exists to prevent")
    }
    out.filter(_.getAs[Long]("doc_id") > 40).foreach { r =>
      assert(r.getAs[String]("naive") == r.getAs[String]("split"),
        "a singleton's group key is its own id, so the split must equal t06's")
    }
    // the fixed md5 rule makes rescues deterministic: among 20 pairs some
    // non-representative member must cross the 230/256 boundary
    assert(out.exists(r => r.getAs[String]("naive") != r.getAs[String]("split")),
      "crafted pairs must contain at least one rescued doc")
  }

  test("d23 window index: corpus-known spans found, batch-internal repeats ignored, index side shuffle-free") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val s12 = (1 to 12).map(i => s"s$i").mkString(" ")
      val t8 = (1 to 8).map(i => s"t$i").mkString(" ")
      Dedup.writeWindowIndex(docs(2L -> s"c1 c2 $s12 c3"), "d23_spec_idx", 4, k = 5)
      // batch doc 1 carries the corpus passage S at a different offset;
      // docs 3 and 5 share T, which the corpus has never seen
      val batch = docs(
        1L -> s"b1 b2 b3 b4 $s12 b5",
        3L -> s"x1 x2 $t8 x3",
        5L -> s"y1 $t8 y2 y3")
      val got = Dedup.spansAgainstIndex(spark, "d23_spec_idx", batch, k = 5)
      val rows = got.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows == Set((1L, 5L, 16L, 12L)),
        s"corpus-known span must be exact and batch-internal repeats ignored: $rows")
      // the index side of the verify semi-join reuses the on-disk
      // h-bucketing: zero shuffle below the join on that side
      val plan = got.queryExecution.executedPlan
      def readsIndex(p: SparkPlan): Boolean =
        p.collect { case f: FileSourceScanExec => f }
          .exists(_.toString.contains("d23_spec_idx"))
      assert(readsIndex(plan), "plan must scan the persistent window index")
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val semi = plan.collect { case j: BaseJoinExec if readsIndex(j) => j }
      assert(semi.nonEmpty, s"no batch-vs-index join:\n${plan.toString.take(2000)}")
      Seq(semi.head.left, semi.head.right).filter(readsIndex).foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"index side must plan shuffle-free:\n${side.toString.take(3000)}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS d23_spec_idx")
    }
  }

  test("d23 append maintenance: a processed batch's windows serve the next batch") {
    val t8 = (1 to 8).map(i => s"t$i").mkString(" ")
    try {
      Dedup.writeWindowIndex(
        docs(2L -> (1 to 12).map(i => s"c$i").mkString(" ")), "d23_app_idx", 4, k = 5)
      val b1 = docs(3L -> s"x1 x2 $t8 x3")
      assert(Dedup.spansAgainstIndex(spark, "d23_app_idx", b1, k = 5).count() == 0,
        "the corpus has never seen T")
      Dedup.appendWindowIndex(spark, "d23_app_idx", b1, k = 5)
      val spans = Dedup.spansAgainstIndex(spark, "d23_app_idx",
          docs(5L -> s"y1 $t8 y2 y3"), k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(spans == Set((5L, 2L, 9L, 8L)),
        s"after the append, batch 2 must meet batch 1's passage: $spans")
      // the append is GATED: re-ingesting a batch that quotes the corpus
      // adds nothing — the index stays distinct-window-sized
      val before = spark.table("d23_app_idx").count()
      Dedup.appendWindowIndex(spark, "d23_app_idx", b1, k = 5)
      assert(spark.table("d23_app_idx").count() == before,
        "re-appending known windows must not grow the index")
      // compaction is layout-generic: folding the per-append files of
      // the WINDOW index preserves rows and the span answers
      Dedup.compactBandIndex(spark, "d23_app_idx")
      assert(spark.table("d23_app_idx").count() == before,
        "compaction must preserve the index rows")
      val after = Dedup.spansAgainstIndex(spark, "d23_app_idx",
          docs(5L -> s"y1 $t8 y2 y3"), k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(after == spans, "compaction must not change span answers")
    } finally spark.sql("DROP TABLE IF EXISTS d23_app_idx")
  }

  test("d20 windows the corpus ONCE: a single documents scan in the span plan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Dedup.substringSpans(
        graft.sources.Tables.documents(spark, sfDir), Dedup.SpanWindow)()
      val scans = df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }
      assert(scans.length == 1,
        s"the count-over-window formulation must not re-run the scan+digests " +
          s"(found ${scans.length} scans)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("substring spans: rolling discriminator agrees with full-md5 windows on testdata") {
    val real = graft.sources.Tables.documents(spark, sfDir)
    val k = graft.operators.Dedup.SpanWindow
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
    val rolled = sorted(Dedup.substringSpans(real, k)())
    val exact = sorted(Dedup.substringSpans(real, k)(ws =>
      transform(sequence(lit(0), size(ws) - k),
        i => md5(concat_ws(" ", slice(ws, i + 1, lit(k)))))))
    assert(rolled.nonEmpty, "sf0.001 corpus must contain duplicated spans")
    assert(rolled == exact,
      "64-bit rolling hash and full md5 must induce identical spans")
  }
}
