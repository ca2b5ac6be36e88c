package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {

  test("cosine_sim expression matches the composed dot/norm formulation") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val a = e.select($"vec_id".as("ida"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("idb"), $"embedding".as("eb"))
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      (CosineSimilarity.column($"ea", $"eb")
        - Similarity.dot($"ea", $"eb")
          / (Similarity.norm($"ea") * Similarity.norm($"eb"))).as("d"))
      .agg(max(abs($"d"))).collect().head.getDouble(0)
    assert(diff < 1e-12, s"expression drifts from composed math by $diff")
  }

  test("cosine_sim of mismatched-length arrays is NULL, not a prefix score") {
    import spark.implicits._
    // a truncated/corrupt embedding must not yield a confident cosine
    // over the common prefix — the composed zip_with formulation (and a
    // SQL oracle) are NULL there, and the native expression must agree.
    // Both eval paths: codegen (projection) and interpreted (the same
    // expression evaluated via a filter on a literal frame).
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val got = df.select(CosineSimilarity.column($"a", $"b").as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty, "mismatched lengths must be NULL")
    assert(got(1).exists(c => math.abs(c - 1.0) < 1e-12))
    // interpreted path agrees (expression evaluated driver-side)
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null) == null, "interpreted eval must also be NULL")
  }

  test("cosine_sim of a vector with itself is 1.0") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val worst = e.select(abs(CosineSimilarity.column($"embedding", $"embedding") - 1.0).as("d"))
      .agg(max($"d")).collect().head.getDouble(0)
    assert(worst < 1e-12)
  }

  test("cosine_sim is registered for SQL via GraftExtensions") {
    import spark.implicits._
    Tables.embeddings(spark, sfDir).limit(3).createOrReplaceTempView("emb_sql_test")
    val n = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_sql_test a CROSS JOIN emb_sql_test b""".stripMargin)
      .filter($"c".isNotNull).count()
    assert(n == 9)
  }

  test("brute-force knn: rank 1 is the probe itself at cosine ~1") {
    import spark.implicits._
    val top = SparkEntry.queries("s01_knn_brute")(spark, sfDir)
      .filter($"rank" === 1).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getAs[Long]("qid") == r.getAs[Long]("nid"), "self is nearest")
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("IVF ANN retrieves self at rank 1 within its k-means cell") {
    import spark.implicits._
    val res = SparkEntry.queries("s04_ann_ivf")(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("qid") == r.getAs[Long]("nid"))
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("IVF ANN clears the measured recall@3 floor vs exact ground truth") {
    val res = SparkEntry.queries("s06_ann_ivf_recall")(spark, sfDir).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Boolean]("recall_ok"),
      "k-means IVF single-probe recall@3 fell below the 0.45 floor")
  }

  test("driver-side Lloyd k-means is deterministic and centroid-sound") {
    // fixed synthetic input: 3 well-separated clusters in 2-D
    val pts = (0 until 30).toArray.map { i =>
      val c = i % 3
      Array(c * 10.0 + (i % 5) * 0.1, c * 10.0 - (i % 7) * 0.1)
    }
    val a = Similarity.kmeansLloyd(pts, 3, seed = 7L, iters = 10)
    val b = Similarity.kmeansLloyd(pts, 3, seed = 7L, iters = 10)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "same seed + input must reproduce identical centroids")
    val c = Similarity.kmeansLloyd(pts, 3, seed = 8L, iters = 10)
    assert(a.length == 3 && c.length == 3)
    // with separated clusters every centroid must sit inside one cluster's
    // x-range regardless of seed
    Seq(a, c).foreach(_.foreach { ctr =>
      assert(Seq(0.0, 10.0, 20.0).exists(x => math.abs(ctr(0) - x) < 1.0),
        s"centroid ${ctr.toSeq} far from every true cluster")
    })
    intercept[IllegalArgumentException] {
      Similarity.kmeansLloyd(pts.take(2), 3, seed = 1L, iters = 1)
    }
  }

  test("PQ codes cover every (vector, subspace) pair exactly once") {
    import spark.implicits._
    val (codes, cdf) = graft.operators.Similarity.pqArtifact(spark, sfDir)
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(codes.count() == nVec * graft.operators.Similarity.PqM)
    assert(codes.groupBy($"vec_id", $"m").count().filter($"count" =!= 1).isEmpty,
      "each (vector, subspace) must carry exactly one code")
    assert(cdf.count() == graft.operators.Similarity.PqM * graft.operators.Similarity.PqK)
    val codeRange = codes.agg(min($"code"), max($"code")).head()
    assert(codeRange.getInt(0) >= 0 && codeRange.getInt(1) < graft.operators.Similarity.PqK)
  }

  test("PQ/ADC ANN clears the measured recall@3 floor vs exact ground truth") {
    val res = SparkEntry.queries("s09_ann_pq_recall")(spark, sfDir).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Boolean]("recall_ok"),
      "PQ/ADC recall@3 fell below the 0.30 floor")
  }

  test("composed IVF-PQ ANN clears its end-to-end recall@3 floor") {
    val res = SparkEntry.queries("s11_ann_ivfpq_recall")(spark, sfDir).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Boolean]("recall_ok"),
      "IVF-PQ composed recall@3 fell below the 0.25 floor")
  }

  test("filtered knn pre-filters: predicate pushed to the corpus scan, k rows kept") {
    val df = SparkEntry.queries("s12_knn_filtered")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the metadata predicate must reach parquet BEFORE any distance math —
    // post-filtering top-k would silently drop result rows
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)")
      || plan.contains("EqualTo(label,3)"), s"label predicate not pushed:\n${plan.take(2000)}")
    val rows = df.collect()
    // every probe keeps a FULL top-5 (the filtered corpus has >> 5 vectors)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.length == 5, s"probe $qid returned ${rs.length} of 5 rows")
    }
    // and every neighbor satisfies the predicate
    import spark.implicits._
    val label3 = Tables.embeddings(spark, sfDir).filter($"label" === 3)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(label3.contains(r.getAs[Long]("nid"))))
  }

  test("bucketed ANN only pairs vectors within the same sign-LSH cell") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", Similarity.bucket($"embedding").as("bkt"))
    val buckets = e.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    SparkEntry.queries("s02_ann_bucket")(spark, sfDir).collect().foreach { r =>
      assert(buckets(r.getAs[Long]("qid")) == buckets(r.getAs[Long]("nid")))
    }
  }

  test("signCode packs exactly the 63 component signs, low bit first") {
    import spark.implicits._
    // +,-,+,-,… alternating: bits 0,2,4,…,62 set → 0x5555… over 63 bits;
    // component 64 positive must NOT contribute (bit 63 stays clear).
    val alt = (1 to 64).map(i => if (i % 2 == 1) 1.0f else -1.0f).toArray
    val expected = (0 until 63 by 2).map(1L << _).sum
    val got = Seq(Tuple1(alt)).toDF("embedding")
      .select(Similarity.signCode($"embedding").as("code"))
      .head.getLong(0)
    assert(got == expected, f"code $got%x != $expected%x")
    assert(got >= 0, "codes must stay in the signed-positive range (ANSI-safe)")
  }

  test("hamming knn ranks by bit_count of code xor; rerank keeps top-5 of the shortlist") {
    import spark.implicits._
    val codes = Tables.embeddings(spark, sfDir)
      .select($"vec_id", Similarity.signCode($"embedding").as("code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s13 = SparkEntry.queries("s13_knn_hamming")(spark, sfDir).collect()
    s13.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.length == 5, s"probe $qid returned ${rs.length} of 5")
      // brute-force the true top-5 on the driver and compare
      val brute = codes.toSeq
        .map { case (nid, c) => (java.lang.Long.bitCount(codes(qid) ^ c), nid) }
        .sorted.take(5)
      val got = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Int]("hamming"), r.getAs[Long]("nid"))).toSeq
      assert(got == brute, s"probe $qid: $got != $brute")
    }
    // s14: every reranked neighbor must come from the probe's hamming-top-32
    val s14 = SparkEntry.queries("s14_hamming_rerank")(spark, sfDir).collect()
    s14.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.length == 5)
      val short = codes.toSeq
        .map { case (nid, c) => (java.lang.Long.bitCount(codes(qid) ^ c), nid) }
        .sorted.take(32).map(_._2).toSet
      rs.foreach(r => assert(short.contains(r.getAs[Long]("nid")),
        s"probe $qid reranked a neighbor outside its hamming shortlist"))
    }
  }

  test("s15/s16 index paths reproduce their in-query twins row-for-row") {
    // layout must not change rows: the partitioned index serves the exact
    // result of the in-query cell join (same cell function, same ranking,
    // bit-identical cosine via the shared expression)
    def rows(entry: String) =
      SparkEntry.queries(entry)(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(rows("s15_ann_indexed") == rows("s02_ann_bucket"),
      "s15 diverged from s02")
    assert(rows("s16_ann_indexed_multiprobe") == rows("s05_ann_multiprobe"),
      "s16 diverged from s05")
  }

  test("inverted-list routing prunes partitions: a one-cell probe scans one list") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE off for a statically traversable plan tree (the d18 idiom);
      // pruning itself is AQE-independent — it happens at file listing
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val table = Similarity.s15IndexTable(spark, sfDir)
      val nCells = spark.table(table).select($"cell").distinct().count()
      assert(nCells > 1, "corpus landed in one cell; pruning unprovable")
      // one probe → one routed cell → the scan must list ONLY that list's
      // files (partition pruning, not a post-scan filter)
      val probe = Tables.embeddings(spark, sfDir).filter($"vec_id" === 0)
        .select($"vec_id".as("qid"), $"embedding".as("qe"),
          Similarity.bucket($"embedding").as("cell"))
      val got = Similarity.indexedTopK(spark, table, probe, 3)
      got.collect()
      val scans = got.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.toString.contains(table) => f
      }
      assert(scans.nonEmpty, "index scan not found in the executed plan")
      val partsRead = scans.map(_.metrics("numPartitions").value).sum
      assert(partsRead == 1,
        s"one-cell probe read $partsRead of $nCells lists — routing is not pruning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("vector index append maintenance: appended vectors join the lists in place") {
    import spark.implicits._
    val table = "s15_append_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.writeVectorIndex(emb.filter(pmod($"vec_id", lit(2)) === 0), table)
    val probes = emb.filter($"vec_id" < 50)
      .select($"vec_id".as("qid"), $"embedding".as("qe"),
        Similarity.bucket($"embedding").as("cell"))
    val before = Similarity.indexedTopK(spark, table, probes, 3)
      .collect().map(_.toSeq).toSet
    Similarity.appendVectorIndex(spark, table, emb.filter(pmod($"vec_id", lit(2)) === 1))
    val after = Similarity.indexedTopK(spark, table, probes, 3)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    // post-append the index holds the whole corpus — the query must now
    // equal the in-query s02 result exactly (and differ from the half-index)
    val s02 = SparkEntry.queries("s02_ann_bucket")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(after == s02, "appended index diverged from the full-corpus result")
    assert(before != after.toSet || emb.filter(pmod($"vec_id", lit(2)) === 1).isEmpty,
      "append visibly changed nothing — refresh path broken?")
    // a mis-shaped append must be rejected, not silently re-layout the table
    intercept[IllegalArgumentException] {
      Similarity.appendVectorIndex(spark,
        { spark.range(1).selectExpr("id AS vec_id").write
            .format("parquet").mode("overwrite").saveAsTable(table + "_flat")
          spark.catalog.refreshTable(table + "_flat"); table + "_flat" },
        emb.limit(1))
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_flat")
  }

  test("sign-LSH append refuses a learned-quantizer index; pre-assigned append maintains it") {
    import spark.implicits._
    // a learned index's lists are keyed by an EXTERNAL cell function; a
    // sign-LSH append would file vectors into lists the probe routing
    // never reads — silent, permanent recall loss. The layout looks
    // identical (partitioned by `cell`), so the guard is the recorded
    // cell-function table property, not the partition scheme.
    val table = "s17_guard_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val emb = Tables.embeddings(spark, sfDir)
      // stand-in learned assignment: any deterministic non-sign-LSH cells
      val assigned = emb.select($"vec_id", $"embedding",
        pmod($"vec_id", lit(4)).cast("int").as("cell"))
      Similarity.writeAssignedIndex(assigned.filter($"vec_id" % 2 === 0), table)
      intercept[IllegalArgumentException] {
        Similarity.appendVectorIndex(spark, table, emb.filter($"vec_id" % 2 === 1))
      }
      Similarity.appendAssignedIndex(spark, table,
        assigned.filter($"vec_id" % 2 === 1))
      // the append landed in the CALLER-assigned lists: the table now
      // holds the full corpus under the same cell keying
      val got = spark.table(table)
        .select($"vec_id", $"cell".cast("int")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      val want = assigned.select($"vec_id", $"cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == want, "pre-assigned append must preserve the caller's cells")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("vector index compaction folds per-append files list-locally, rows unchanged") {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val table = "s15_compact_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val emb = Tables.embeddings(spark, sfDir)
      Similarity.writeVectorIndex(emb.filter(pmod($"vec_id", lit(3)) === 0), table)
      Similarity.appendVectorIndex(spark, table, emb.filter(pmod($"vec_id", lit(3)) === 1))
      Similarity.appendVectorIndex(spark, table, emb.filter(pmod($"vec_id", lit(3)) === 2))
      val probes = emb.filter($"vec_id" < 50)
        .select($"vec_id".as("qid"), $"embedding".as("qe"),
          Similarity.bucket($"embedding").as("cell"))
      val expect = Similarity.indexedTopK(spark, table, probes, 3)
        .collect().map(_.toSeq).toSet
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      val root = new Path(meta.location)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def listFiles(): Map[String, Int] = fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .map(d => d.getPath.getName -> fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))).toMap
      val filesBefore = listFiles()
      assert(filesBefore.values.exists(_ > 1),
        "fixture must leave multi-file lists to compact")
      val (b, a) = Similarity.compactVectorIndex(spark, table)
      assert(b == filesBefore.values.sum && a < b,
        s"compaction must reduce the file count (before=$b after=$a)")
      val filesAfter = listFiles()
      assert(filesAfter.keySet == filesBefore.keySet,
        "compaction must preserve the partition directories (pruning intact)")
      assert(filesAfter.values.forall(_ == 1),
        s"every touched list folds to one file at this size: $filesAfter")
      val after = Similarity.indexedTopK(spark, table, probes, 3)
        .collect().map(_.toSeq).toSet
      assert(after == expect, "compaction changed query results")
      // steady-state re-run is a no-op (every list below minFiles)
      val (b2, a2) = Similarity.compactVectorIndex(spark, table)
      assert(b2 == a2, "re-compacting a compacted index must be free")
      // crash recovery: a compaction that died between its two swap
      // renames leaves the list parked in `.cell=N.compact.bak` with the
      // original dir MISSING — queries silently lose the whole list. The
      // next compactVectorIndex must restore it before compacting.
      // Victim = probe 0's own cell, so its guaranteed rank-1 self-hit
      // disappears with the dir (a deterministic fixture — an arbitrary
      // cell might contribute nothing to the 50 probes' top-3).
      val cell0 = probes.filter($"qid" === 0).select($"cell").head.getInt(0)
      val victim = new Path(root, s"cell=$cell0")
      val bak = new Path(root, s".${victim.getName}.compact.bak")
      assert(fs.rename(victim, bak), "fixture: simulate the crash window")
      spark.catalog.refreshTable(table)
      val crashed = Similarity.indexedTopK(spark, table, probes, 3)
        .collect().map(_.toSeq).toSet
      assert(crashed != expect, "fixture must actually lose the list")
      Similarity.compactVectorIndex(spark, table)
      val recovered = Similarity.indexedTopK(spark, table, probes, 3)
        .collect().map(_.toSeq).toSet
      assert(recovered == expect,
        "compaction must recover a crashed swap before compacting")
      // APPEND must heal the same window: an append into the missing
      // dir would otherwise recreate it and permanently strand the bak
      assert(fs.rename(victim, bak), "fixture: crash window again")
      spark.catalog.refreshTable(table)
      Similarity.appendVectorIndex(spark, table,
        Tables.embeddings(spark, sfDir).limit(0)) // maintenance touch, no rows
      spark.catalog.refreshTable(table)
      val healedByAppend = Similarity.indexedTopK(spark, table, probes, 3)
        .collect().map(_.toSeq).toSet
      assert(healedByAppend == expect,
        "appendVectorIndex must recover a pending swap before writing")
      // post-swap-in crash (bak left behind, original present): the
      // stale full copy must be deleted, not retained forever
      val staleBak = new Path(root, s".cell=$cell0.compact.bak")
      fs.mkdirs(staleBak)
      Similarity.compactVectorIndex(spark, table)
      assert(!fs.exists(staleBak),
        "a completed swap's leftover bak must be cleaned up")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("s17 learned-quantizer index serves exactly s04's retrieval, gate green") {
    import spark.implicits._
    // the persistent layout must not change the retrieval: both paths
    // meet candidates on the rk=1 k-means assignment
    val indexed = Similarity.ivfIndexedTop3(spark, sfDir)
      .orderBy($"qid", $"rank").collect().map(_.toSeq).toSeq
    val inQuery = SparkEntry.queries("s04_ann_ivf")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(indexed == inQuery, "indexed IVF diverged from in-query s04")
    val gate = SparkEntry.queries("s17_ann_ivf_indexed")(spark, sfDir).collect()
    assert(gate.length == 1 && gate.head.getAs[Boolean]("recall_ok"),
      "indexed IVF recall fell below the s06 floor")
  }

  test("session table names are unique per build attempt (racing builders isolated)") {
    // SessionCache releases the losing racer's value; a deterministic
    // name would let that release DROP the winner's table. The nonce
    // guarantees every build attempt its own table.
    val a = graft.plans.Bucketing.sessionTableName("x", spark, sfDir)
    val b = graft.plans.Bucketing.sessionTableName("x", spark, sfDir)
    assert(a != b, s"two build attempts shared a table name: $a")
  }

  test("a real index-build race: one winner served to all, losers' tables dropped") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // a distinct cache key over the same data (path spelling) forces a
    // cold build; 4 threads enter getOrBuild together and each writes its
    // own nonce'd table — the cache must hand EVERY caller the winner and
    // the racer-release path must drop exactly the losers
    val dir = sfDir + "/."
    val pre = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("s15_vec_index")).toSet
    val names = Await.result(
      Future.sequence((1 to 4).map(_ => Future(Similarity.s15IndexTable(spark, dir)))),
      180.seconds)
    assert(names.distinct.size == 1, s"racers saw different winners: $names")
    val winner = names.head
    assert(spark.catalog.tableExists(winner), "winner's table must exist")
    assert(SparkEntry.queries("s15_ann_indexed")(spark, dir).count() > 0,
      "the raced index must serve queries")
    val post = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("s15_vec_index")).toSet
    assert(post -- pre == Set(winner),
      s"losing racers leaked tables: ${(post -- pre) - winner}")
  }

  test("s13/s14 per-probe top-k plans as WindowGroupLimit, never a full per-group sort") {
    // row_number <= k over Window.partitionBy(qid) must push per-group
    // limits into the shuffle (the t15 assertion pattern). Without this a
    // Spark regression would silently sort the whole corpus per probe
    // group on <=20 tasks — the exact failure mode the binary pipeline
    // exists to avoid at 100 TB.
    for (entry <- Seq("s13_knn_hamming", "s14_hamming_rerank")) {
      val plan = SparkEntry.queries(entry)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$entry: rank<=k window must plan per-partition group limits:\n${plan.take(2000)}")
    }
  }
}
