package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over `documents` and `embeddings` — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Hashing is md5-based throughout (not Spark's murmur `hash()`): md5 is
  * bit-identical across engines, which makes every op here verifiable
  * against the DuckDB oracle, and it is a Catalyst codegen'd expression so
  * the signature computation stays inside whole-stage codegen.
  *
  * Scale design (100 TB):
  *  - signature computation (minhash/simhash/fingerprints) is a narrow map —
  *    one scan, no shuffle, embarrassingly parallel;
  *  - candidate generation never compares all pairs: MinHash-LSH shuffles on
  *    (band index, band hash) so only same-bucket docs meet (the classic
  *    shingle→minhash→band→bucket-join pipeline); n-gram Jaccard shuffles on
  *    shingle (prefix filtering would cut candidates further);
  *  - the only O(n²) op is the *exact* embedding near-dup scan, kept as the
  *    correctness baseline; its scale path is Similarity's bucketed ANN.
  */
object Dedup {

  import TextAnalysis.{words, shingles}

  /** Bind word-3-gram shingles of `text` as a column named `sh`. Binding
    * (rather than inlining the expression) matters: interpreted lambda
    * bodies re-evaluate captured subexpressions per element, so shingling
    * over an unbound split() would re-run it O(words) times per row. */
  private[operators] def withSh3(docs: DataFrame): DataFrame =
    Tables.spread(docs)
      .withColumn("w", words(col("text")))
      .withColumn("sh", shingles(col("w"), 3))
      .drop("w")

  /** MinHash signature length and LSH banding: 16 hashes in 4 bands of 4
    * rows — band collision prob = 1-(1-J^4)^4, steep around J≈0.6. */
  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand: Int = NumHashes / NumBands

  /** d01 — exact dedup by content hash: group on md5(text), keep the lowest
    * doc_id (deterministic survivor), count copies. Hash-groupBy shuffles
    * 16-byte keys, not documents — at 100 TB the payload never moves. */
  private def d01Exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5($"text").as("content_hash"))
      .agg(min($"doc_id").as("kept_doc_id"), count(lit(1)).as("n_copies"))
      .select($"kept_doc_id", $"n_copies")
      .orderBy($"kept_doc_id")
  }

  private val d01Sql =
    """SELECT min(doc_id) AS kept_doc_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text)
      |ORDER BY kept_doc_id""".stripMargin

  /** MinHash signatures for any (doc_id, text) frame: doc_id + m00..m15
    * (48-bit BIGINT minhashes). Each stream is the classic pairwise-
    * independent `(a_k·v + b_k) mod 2^48` hash over a single md5-derived
    * key per shingle — see MinHashLcg (one digest per shingle, genuinely
    * independent stream orderings). A shuffle-free narrow map (one fused
    * hash loop per document), vs exploding shingles into a 16-aggregate
    * groupBy. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sig = graft.functions.MinHashLcg.column(col("sh"), NumHashes)
    val sigCols = (0 until NumHashes).map(k => element_at(col("sig"), k + 1).as(f"m$k%02d"))
    withSh3(docs)
      .withColumn("sig", sig)
      .select((col("doc_id") +: sigCols): _*)
  }

  /** d02 — minhash signatures: doc_id + 16 minhash columns. */
  private def d02MinhashSig(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** DuckDB shingle expression (1-based, end-inclusive list slices). */
  private[operators] def duckShingles(k: Int): String =
    s"""list_distinct(list_transform(
       |    generate_series(1, len(string_split(text, ' ')) - ${k - 1}),
       |    i -> array_to_string(string_split(text, ' ')[i:i+${k - 1}], ' ')))""".stripMargin

  import graft.functions.MinHashLcg

  /** DuckDB twin of the signature: shingles → 48-bit md5 keys (`vs`),
    * then per stream min of the LCG hash — same constant tables. */
  private def duckSigSelect: String = (0 until NumHashes)
    .map(k => f"list_aggregate(list_transform(vs, v -> ${MinHashLcg.duckStream(k, "v")}), 'min') AS m$k%02d")
    .mkString(",\n  ")

  private def duckKeysCte: String =
    s"""s AS (SELECT doc_id, ${duckShingles(3)} AS sh FROM documents),
       |vv AS (SELECT doc_id, list_transform(sh, x -> ${MinHashLcg.duckKey("x")}) AS vs FROM s)""".stripMargin

  private val d02Sql =
    s"""WITH $duckKeysCte
       |SELECT doc_id,
       |  $duckSigSelect
       |FROM vv ORDER BY doc_id""".stripMargin

  /** d03 — MinHash-LSH candidate pairs: band the signature, md5 each band,
    * and self-join on (band index, band hash). This is the scalable path:
    * the shuffle key is the bucket, so candidate generation is linear in
    * corpus size + bucket-local pairs. */
  /** In-bucket pair generation is quadratic in bucket size, so degenerate
    * buckets (one boilerplate string duplicated 10⁵ times hashes to one
    * band bucket, costing 10¹⁰/2 pairs) need a hard cap — the reference
    * bounds the analogous blowup by capping bloom-filter builds at 20M rows
    * (`fpdb-executor/include/fpdb/executor/physical/Globals.h:55`). Buckets
    * above the cap are dropped: a recall trade (pairs meeting ONLY in a
    * degenerate bucket are lost) for a hard per-bucket work bound. In a
    * dedup pipeline the trade is usually free — a bucket that hot is
    * near-identical boilerplate better handled by exact dedup (d01). */
  val MaxBucketSize = 10000

  private val obsId = new java.util.concurrent.atomic.AtomicLong()

  /** All ordered pairs (ids[i], ids[j]), i < j, from a frame holding a
    * sorted array column `ids` (any element type), emitted as (pa, pb) —
    * the in-bucket pair generator shared by the candidate queries. Two
    * chained generators (posexplode, then explode over a slice) keep the
    * whole expansion inside codegen; a lambda-based transform/flatten
    * would run interpreted per element.
    *
    * Buckets larger than `maxBucket` are dropped (see [[MaxBucketSize]]);
    * the dropped count and the largest bucket seen ride on the query as an
    * observed metric (`graft.lsh.cap*`), logged by the listener that
    * [[graft.GraftSession]] registers. */
  private def bucketPairs(buckets: DataFrame, maxBucket: Int = MaxBucketSize): DataFrame =
    buckets
      .observe(s"graft.lsh.cap${obsId.incrementAndGet()}",
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
        max(size(col("ids"))).as("max_bucket_size"))
      .filter(size(col("ids")) <= maxBucket)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "pa")))
      .select(col("pa"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("pb"))

  /** The LSH banding of a (doc_id, text) frame: one (doc_id, band_idx,
    * band_hash) row per band per doc. ':'-separated concat (plain concat,
    * so ANY null stream nulls the band — shingle-less docs must not all
    * collide on one bucket), then md5 — bit-identical in DuckDB with
    * ::VARCHAR casts. Shared by the self-join candidates (d03/d15) and
    * the incremental new-vs-seen join (d17). */
  def bandHashes(docs: DataFrame): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bandCols = (0 until NumBands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => col(f"m${b * RowsPerBand + r}%02d").cast("string"))
        .flatMap(c => Seq(c, lit(":"))).dropRight(1)
      md5(concat(parts: _*))
    }
    sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
      .filter(col("band_hash").isNotNull) // shingle-less docs can't collide
  }

  /** LSH candidate pairs for any (doc_id, text) frame.
    *
    * Shape: signature → band hashes → groupBy(bucket) → explode in-bucket
    * pairs. One shuffle keyed by (band, hash), signatures computed exactly
    * once (a self-join would recompute the 16-way md5 pipeline on both
    * sides). Degenerate buckets (a band hash shared by k docs) would cost
    * k²/2 pairs — the all-dups-identical worst case — and are dropped above
    * [[MaxBucketSize]] (see [[bucketPairs]]). */
  def minhashCandidates(docs: DataFrame, maxBucket: Int = MaxBucketSize): DataFrame = {
    val buckets = bandHashes(docs)
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    bucketPairs(buckets, maxBucket)
      .select(col("pa").as("doc_a"), col("pb").as("doc_b"))
      .distinct()
  }

  private def d03MinhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashCandidates(Tables.documents(s, dir)).orderBy(col("doc_a"), col("doc_b"))

  private def duckBands: String = (0 until NumBands).map { b =>
    val cat = (0 until RowsPerBand)
      .map(r => f"m${b * RowsPerBand + r}%02d::VARCHAR").mkString(" || ':' || ")
    s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_hash FROM sig"
  }.mkString("\n  UNION ALL ")

  private val d03Sql = {
    val bands = duckBands
    // the `ok` CTE mirrors the Spark side's MaxBucketSize degenerate-
    // bucket drop (bucketPairs) — d15 got this guard at round 6, this
    // oracle needs the SAME one or a >cap bucket diverges at scale-up
    s"""WITH $duckKeysCte,
       |sig AS (SELECT doc_id, $duckSigSelect FROM vv),
       |banded AS ($bands),
       |ok AS (SELECT band_idx, band_hash FROM banded
       |       GROUP BY 1, 2 HAVING count(*) <= $MaxBucketSize)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM banded a JOIN banded b
       |  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |  AND a.doc_id < b.doc_id
       |JOIN ok o ON o.band_idx = a.band_idx AND o.band_hash = a.band_hash
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** SimHash width: 32 bits taken from the first 8 hex chars of md5(word). */
  val SimhashBits = 32

  /** d04 — 32-bit SimHash fingerprints: per-word md5-derived 32-bit value,
    * per-bit frequency-weighted majority vote, reassembled as a BIGINT.
    * Computed by the native SimHash32 expression — a shuffle-free narrow
    * map (one fused hash loop per document), replacing the equivalent
    * explode + 32-aggregate groupBy(doc_id) whose (doc_id, word-hash)
    * shuffle was the stage's cost. */
  /** SimHash fingerprints for any (doc_id, text) frame; `bits` ∈ {32, 64}
    * (64 is the 100 TB width — see [[graft.functions.SimHash]]). */
  def simhashes(docs: DataFrame, bits: Int = SimhashBits): DataFrame =
    Tables.spread(docs)
      .select(col("doc_id"),
        graft.functions.SimHash.column(words(col("text")), bits).as("simhash"))

  private def d04Simhash(s: SparkSession, dir: String): DataFrame =
    simhashes(Tables.documents(s, dir)).orderBy(col("doc_id"))

  private def d04bSimhash64(s: SparkSession, dir: String): DataFrame =
    simhashes(Tables.documents(s, dir), bits = 64).orderBy(col("doc_id"))

  /** DuckDB: value of 8 hex chars of md5(word) starting at `startHex`
    * (1-based) as BIGINT (hex-char digits via strpos arithmetic — no
    * conv() in DuckDB). A 64-bit hash is carried as two 32-bit halves so
    * every intermediate stays positive BIGINT. */
  private def duckWordHash(startHex: Int): String =
    (0 until 8).map { c =>
      val scale = math.pow(16, 7 - c).toLong
      s"(strpos('0123456789abcdef', substr(md5(word), ${startHex + c}, 1)) - 1) * $scale"
    }.mkString(" + ")

  private def duckSimhashCte(bits: Int): String = {
    // native v = first bits/8 digest bytes big-endian, so the hi 32 bits
    // are hex chars 1-8 and (for 64-bit) the lo 32 bits are chars 9-16
    val hSelect =
      if (bits == 32) s"${duckWordHash(1)} AS v"
      else s"${duckWordHash(1)} AS vhi, ${duckWordHash(9)} AS vlo"
    def bitExpr(j: Int): String =
      if (bits == 32) s"(v >> $j) & 1"
      else if (j < 32) s"(vlo >> $j) & 1"
      else s"(vhi >> ${j - 32}) & 1"
    val bitSums = (0 until bits)
      .map(j => s"sum(CASE WHEN ${bitExpr(j)} = 1 THEN 1 ELSE -1 END) AS sb$j")
      .mkString(",\n    ")
    // the j=63 addend is Long.MinValue: every positive term precedes it in
    // the running sum, so no intermediate exceeds BIGINT range
    val fp = (0 until bits)
      .map(j => s"CASE WHEN sb$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |h AS (SELECT doc_id, $hSelect FROM w),
       |b AS (SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $fp AS simhash FROM b)""".stripMargin
  }

  private val d04Sql =
    s"""WITH ${duckSimhashCte(32)}
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  private val d04bSql =
    s"""WITH ${duckSimhashCte(64)}
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  /** d05 — SimHash near-dup pairs: hamming distance ≤ 3 over the 32-bit
    * fingerprints (tight: the corpus shares a small vocabulary, so
    * fingerprints are correlated and a loose radius floods). */
  /** SimHash near-dup pairs at a hamming radius, for any (doc_id, text).
    *
    * Banded candidate generation, not all-pairs: the fingerprint is split
    * into `maxHamming + 1` equal bit-chunks, and docs are bucketed on
    * (band index, chunk value). By pigeonhole, any pair within the radius
    * differs in at most `maxHamming` bits, so at least one of the
    * `maxHamming + 1` bands carries zero differing bits — the pair is
    * guaranteed to share a bucket, and the exact `bit_count(xor)` check on
    * in-bucket pairs loses nothing. Same LSH shape as d03: one shuffle
    * keyed by the bucket, pair work bounded by [[bucketPairs]]'s cap. A
    * pair may agree on several bands, hence the `distinct`.
    *
    * With 32-bit fingerprints and radius 3 a band is 8 bits → only 256
    * buckets per band, so per-bucket populations grow linearly with corpus
    * size; at 100 TB use `bits = 64` (16-bit bands → 65k buckets) — d05b
    * ships that width, oracle-checked. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
      maxBucket: Int = MaxBucketSize, bits: Int = SimhashBits): DataFrame = {
    val numBands = maxHamming + 1
    require(bits % numBands == 0,
      s"bits=$bits must divide into ${numBands} bands")
    val bitsPerBand = bits / numBands
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val bandCols = (0 until numBands).map(b =>
      shiftright(col("simhash"), b * bitsPerBand).bitwiseAND(lit(mask)))
    val buckets = simhashes(docs, bits)
      .select(struct(col("doc_id"), col("simhash")).as("d"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "chunk")))
      .groupBy(col("band_idx"), col("chunk"))
      .agg(sort_array(collect_list(col("d"))).as("ids")) // sorts by doc_id
      .filter(size(col("ids")) > 1)
    bucketPairs(buckets, maxBucket)
      .select(col("pa.doc_id").as("doc_a"), col("pa.simhash").as("fp_a"),
        col("pb.doc_id").as("doc_b"), col("pb.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  private def d05SimhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir), 3).orderBy(col("doc_a"), col("doc_b"))

  /** d05/d05b oracle: banded candidates with the SAME MaxBucketSize cap
    * as the Spark side, then the exact hamming check — NOT an uncapped
    * all-pairs scan, which would diverge the moment one (band, chunk)
    * bucket exceeds the cap (with 32-bit fingerprints a band has only
    * 256 buckets, so populations grow linearly with corpus size — the
    * exact degenerate case the cap exists for). Same guard discipline
    * as d03/d15's `ok` CTE. */
  private def duckSimhashPairsSql(bits: Int, maxHamming: Int): String = {
    val numBands = maxHamming + 1
    val bitsPerBand = bits / numBands
    val mask = (1L << bitsPerBand) - 1
    s"""WITH ${duckSimhashCte(bits)},
       |bands AS (
       |  SELECT doc_id, b AS band_idx,
       |    (simhash >> (b * $bitsPerBand)) & $mask AS chunk
       |  FROM sh, (SELECT unnest(generate_series(0, ${numBands - 1})) AS b)),
       |ok AS (SELECT band_idx, chunk FROM bands
       |       GROUP BY 1, 2 HAVING count(*) <= $MaxBucketSize),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.chunk = b.chunk
       |    AND a.doc_id < b.doc_id
       |  JOIN ok o ON o.band_idx = a.band_idx AND o.chunk = a.chunk)
       |SELECT c.doc_a, c.doc_b,
       |  bit_count(xor(x.simhash, y.simhash)) AS hamming
       |FROM cand c
       |JOIN sh x ON x.doc_id = c.doc_a
       |JOIN sh y ON y.doc_id = c.doc_b
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val d05Sql = duckSimhashPairsSql(bits = 32, maxHamming = 3)

  /** d05b — the 100 TB width: 64-bit fingerprints, radius 7 (the radius
    * scales with width — a one-word edit flips about twice as many of 64
    * bits as of 32), 8 bands of 8 bits by pigeonhole. */
  private def d05bSimhash64Pairs(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir), maxHamming = 7, bits = 64)
      .orderBy(col("doc_a"), col("doc_b"))

  private val d05bSql = duckSimhashPairsSql(bits = 64, maxHamming = 7)

  /** d06 — exact n-gram Jaccard over candidate pairs that share at least one
    * shingle: the shingle self-join IS the candidate generator (docs with
    * J>0 meet on some shingle; shuffle key = shingle). J = |A∩B| / |A∪B|. */
  /** Exact shingle-Jaccard pairs ≥ `minJ`, for any (doc_id, text) frame.
    *
    * Candidate generation groups by shingle (the docs sharing it form the
    * bucket) and explodes in-bucket pairs — docs with J>0 necessarily meet
    * on some shingle. Each doc's shingle-set size rides along the exploded
    * rows as a struct field, so the whole query is one scan + two shuffles
    * (bucket groupBy, pair groupBy) with no size joins at all. */
  def jaccardPairs(docs: DataFrame, minJ: Double): DataFrame = {
    val buckets = withSh3(docs)
      .select(struct(col("doc_id"), size(col("sh")).as("n_sh")).as("d"),
        explode(col("sh")).as("s"))
      .groupBy(col("s"))
      .agg(sort_array(collect_list(col("d"))).as("ids")) // sorts by doc_id
      .filter(size(col("ids")) > 1)
    // NO bucket cap here, deliberately: in d03/d05 a dropped bucket only
    // loses candidates (the exact check still runs on survivors), but here
    // the per-shingle buckets ARE the measurement — dropping one would
    // undercount n_inter for every surviving pair that shares the dropped
    // shingle, corrupting J rather than trading recall. The production
    // guard for stopword-shingles is document-frequency filtering applied
    // symmetrically to n_inter AND the n_sh sizes (not done here — the
    // oracle computes unfiltered J).
    bucketPairs(buckets, maxBucket = Int.MaxValue)
      .groupBy(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"),
        col("pa.n_sh").as("n_a"), col("pb.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private def d06JaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(Tables.documents(s, dir), 0.5).orderBy(col("doc_a"), col("doc_b"))

  private val d06Sql =
    s"""WITH ds AS (SELECT doc_id, unnest(${duckShingles(3)}) AS sh FROM documents),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Document-frequency–guarded Jaccard — the production variant of
    * [[jaccardPairs]] (round-2 verdict: exact d06 is the one unbounded
    * quadratic path — one stopword shingle shared by 10⁵ docs costs
    * 10¹⁰/2 pairs). Shingles with document frequency > `maxDf` are
    * removed SYMMETRICALLY: they contribute neither to the intersection
    * NOR to either document's shingle-set size, so the guarded J is the
    * exact Jaccard of the KEPT shingle sets — a well-defined measurement
    * (df-filtering is standard IDF-style noise removal), not a corrupted
    * approximation of the unguarded one. Work is bounded by construction:
    * every surviving bucket has ≤ maxDf members, so candidate generation
    * costs at most maxDf²/2 per shingle regardless of how templated the
    * corpus is. Sizes are re-derived from the kept buckets and joined
    * back doc-keyed (the sizes relation is one row per doc — a shuffle
    * join that scales; the unguarded variant's ride-along trick can't
    * work here because kept-set sizes aren't known until after the df
    * filter). */
  def jaccardPairsDfGuarded(docs: DataFrame, minJ: Double, maxDf: Int): DataFrame = {
    val buckets = withSh3(docs)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDf) // the df guard: bounded buckets
    val sizes = buckets.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = bucketPairs(buckets.filter(size(col("ids")) > 1), maxBucket = maxDf)
      .groupBy(col("pa").as("doc_a"), col("pb").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** d06b — df-guarded Jaccard over documents: maxDf = 50 (10% of the
    * sf0.01 corpus; at 100 TB the knob is an absolute count like 10⁴ —
    * anything that frequent is boilerplate, not signal). */
  private def d06bJaccardGuarded(s: SparkSession, dir: String): DataFrame =
    jaccardPairsDfGuarded(Tables.documents(s, dir), 0.5, 50)
      .orderBy(col("doc_a"), col("doc_b"))

  private val d06bSql =
    s"""WITH ds AS (SELECT doc_id, unnest(${duckShingles(3)}) AS sh FROM documents),
       |dfreq AS (SELECT sh, count(*) AS df FROM ds GROUP BY sh),
       |kept AS (SELECT ds.doc_id, ds.sh FROM ds JOIN dfreq USING (sh) WHERE df <= 50),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d07 — embedding-cosine near-dup: all pairs above cosine 0.4. Norms are
    * computed once per vector (O(n)), not per pair; the pair scan itself is
    * the exact O(n²) baseline — see Similarity for the bucketed scale path. */
  private def d07EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // the streamed (non-broadcast) side must be spread across cores — the
    // n² cosine loop runs in its scan stage
    val a = Tables.spread(emb.select($"vec_id".as("vec_a"), $"embedding".as("ea")))
    val b = emb.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.join(b, $"vec_a" < $"vec_b")
      .withColumn("cosine", graft.functions.CosineSimilarity.column($"ea", $"eb"))
      .filter($"cosine" > 0.4)
      .select($"vec_a", $"vec_b", $"cosine")
      .orderBy($"vec_a", $"vec_b")
  }

  private val d07Sql =
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.duckNorm} AS nrm FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${Similarity.duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE ${Similarity.duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) > 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Large-star: every neighbor of `u` strictly larger than `u` is
    * rewired to m(u) = min(Γ(u) ∪ {u}). Each undirected edge is processed
    * from both endpoints (symmetrized), so every edge contributes its
    * larger endpoint → smaller-side-minimum successor edge; output edges
    * always point strictly downward (dst < src). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"))
      .withColumnRenamed("src", "u")
    sym.join(mins, col("src") === col("u"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Small-star: with edges oriented larger→smaller, every node in
    * Γ(u) ∪ {u} is rewired to m(u) = min(Γ(u)) — the downward neighbors
    * of `u` collapse into a star around the smallest one. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val mins = or.groupBy(col("src")).agg(min(col("dst")).as("m"))
      .withColumnRenamed("src", "u")
    val j = or.join(mins, col("src") === col("u"))
    j.select(col("dst").as("v"), col("m"))
      .union(j.select(col("src").as("v"), col("m")))
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Connected components over a symmetric edge list by alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC '14): each round is two
    * group-by-min + join passes over the CURRENT edge set, and the edge
    * set converges to a star forest rooted at each component's minimum
    * node in O(log n) rounds — vs O(component diameter) for plain
    * min-label propagation (a chain-shaped duplicate cluster of length k
    * costs k propagation rounds but ~log k star rounds; at 100 TB the
    * diameter of a templated-boilerplate cluster is unbounded, the log
    * is not). Lineage is truncated every round with localCheckpoint and
    * the previous round's blocks are freed eagerly once the next round
    * is materialized, so the loop holds at most two edge-set snapshots.
    *
    * Convergence = the edge set reaches a fixpoint. A cheap checksum
    * (count + sum of per-edge hashes) detects change; the first
    * "unchanged" verdict is confirmed exactly with except() before the
    * loop exits, so a checksum collision can never return a non-fixpoint.
    * Throws if no fixpoint within `maxIters` — silently returning
    * unconverged labels would split duplicate groups. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val release = graft.util.SessionCache.releaseFrame _
    // checkpoint the (possibly expensive) edge-producing pipeline ONCE;
    // nodes and the symmetrized working set both derive from the
    // checkpointed frame — deriving each from `edges` directly would
    // re-execute the upstream candidate generation three times
    val base = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = base.select(col("src").as("node"))
      .union(base.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    // bit_xor, not sum: order-independent, and immune to the ANSI-mode
    // long-overflow a sum of full-range hashes trips
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var e = base.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint()
    release(base)
    var sum0 = checksum(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val sum1 = checksum(next)
      // exact confirm behind the checksum: except() over two star-sized
      // edge sets, run only on the (single) round that claims fixpoint
      converged = sum0 == sum1 && next.exceptAll(e).isEmpty
      release(e)
      e = next
      sum0 = sum1
      iter += 1
    }
    if (!converged) {
      release(e); release(nodes)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIters star rounds — raise maxIters")
    }
    System.err.println(s"[graft] connectedComponents: fixpoint after $iter star rounds")
    // star forest → labels: each non-root node holds exactly one edge
    // (node → component min); roots label themselves
    val labels = nodes.join(e, nodes("node") === e("src"), "left")
      .select(col("node"), coalesce(col("dst"), col("node")).as("label"))
      .localCheckpoint()
    release(e); release(nodes)
    labels
  }

  /** d08 — duplicate-group assignment: LSH candidate pairs (d03) become an
    * edge list; each document in a duplicate cluster gets the cluster's
    * minimum doc_id as its group — the canonical-survivor step that turns
    * pairwise candidates into a dedup decision.
    *
    * Like the IVF index, the assignment is an ingest-time artifact built
    * once per (session, dir) and materialized — d08 (groups) and d09
    * (survivor selection) share it instead of each re-running the LSH
    * pipeline and the label-propagation rounds. Bounded LRU retention
    * (see SessionCache for why weak keys can't work here). */
  private val groupCache = new graft.util.SessionCache[DataFrame](
    releaseValue = graft.util.SessionCache.releaseFrame, gcReclaimable = true)

  private def dupGroups(s: SparkSession, dir: String): DataFrame =
    groupCache.getOrBuild(s, dir)({
      val edges = minhashCandidates(Tables.documents(s, dir))
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      // connectedComponents already returns a checkpointed frame; the
      // rename on top is narrow, and keeping the inner LogicalRDD as the
      // plan's leaf lets the cache's releaseFrame reach its blocks
      connectedComponents(edges)
        .select(col("node").as("doc_id"), col("label").as("group_id"))
    })

  private def d08DupGroups(s: SparkSession, dir: String): DataFrame =
    dupGroups(s, dir).orderBy(col("doc_id"))

  /** Shared recursive-CTE body computing (doc_id, group_id) as `g` —
    * the oracle twin of `connectedComponents(minhashCandidates(...))`,
    * reused by d08 (groups) and d09 (survivor selection). */
  private def duckGroupsCte: String =
    s"""WITH RECURSIVE
       |$duckKeysCte,
       |sig AS (SELECT doc_id, $duckSigSelect FROM vv),
       |banded AS ($duckBands),
       |ok AS (SELECT band_idx, band_hash FROM banded
       |       GROUP BY 1, 2 HAVING count(*) <= $MaxBucketSize),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id
       |  JOIN ok o ON o.band_idx = a.band_idx AND o.band_hash = a.band_hash),
       |edges(a, b) AS (
       |  SELECT doc_a, doc_b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, t) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.t = e.a),
       |g AS (SELECT src AS doc_id, min(t) AS group_id
       |      FROM reach GROUP BY src)""".stripMargin

  private val d08Sql =
    s"""$duckGroupsCte
       |SELECT doc_id, group_id FROM g ORDER BY doc_id""".stripMargin

  /** d09 — canonical survivor selection: the last mile of a dedup
    * pipeline. Each duplicate group (d08) keeps its best member —
    * longest text, ties to the lowest doc_id — plus the member count,
    * so the decision "which rows survive, which are dropped" is explicit
    * and auditable. One window per group over the (small) grouped rows;
    * the oracle re-derives groups via the shared recursive CTE and picks
    * survivors with the same window. */
  private def d09Survivors(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).as("len"))
    val groups = dupGroups(s, dir)
    val pick = Window.partitionBy(col("group_id"))
      .orderBy(col("len").desc, col("doc_id"))
    val members = Window.partitionBy(col("group_id"))
    groups.join(docs, "doc_id")
      .withColumn("rn", row_number().over(pick))
      .withColumn("n_members", count(lit(1)).over(members))
      .filter(col("rn") === 1)
      .select(col("group_id"), col("doc_id").as("kept_doc_id"), col("n_members"))
      .orderBy(col("group_id"))
  }

  private val d09Sql =
    s"""$duckGroupsCte,
       |j AS (SELECT g.group_id, g.doc_id, length(d.text) AS len
       |      FROM g JOIN documents d USING (doc_id))
       |SELECT group_id, doc_id AS kept_doc_id, n_members FROM (
       |  SELECT group_id, doc_id, len,
       |    row_number() OVER (PARTITION BY group_id ORDER BY len DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY group_id) AS n_members
       |  FROM j) r
       |WHERE rn = 1 ORDER BY group_id""".stripMargin

  /** d22 — LEAKAGE-FREE train/holdout split: the composition that makes
    * d08 and t06 jointly useful. A naive per-document hash split leaks
    * evaluation data — near-duplicate pairs (one doc in train, its copy
    * in holdout) let the model "memorize the test set" — so the split
    * key must be the duplicate GROUP, not the document: every member of
    * a near-dup cluster (d08's connected components; singletons are
    * their own group) gets splitAssign(group_id) — t06's exact split
    * rule, applied one level up. The output audits the property: per
    * split, member and group counts plus n_rescued_docs — docs whose
    * naive per-doc split would have disagreed with their group's split,
    * i.e. exactly the leaks prevented.
    *
    * Scale shape: groups are the cached d08 session artifact (built once
    * per (session, dir), shared with d09); the docs↔groups join is the
    * only corpus-sized shuffle and carries (doc_id, group_id) pairs; the
    * split columns are narrow md5 maps and the audit is a 2-row
    * aggregate. */
  private def d22LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    groupwiseSplit(Tables.documents(s, dir).select($"doc_id"), dupGroups(s, dir))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"group_id").as("n_groups"),
        sum(when($"naive" =!= $"split", 1L).otherwise(0L)).as("n_rescued_docs"))
      .orderBy($"split")
  }

  /** Doc-level core of d22: (doc_id, group_id, split, naive), where
    * `split` is the group-keyed assignment (constant within a group by
    * construction — the spec pins it) and `naive` the per-doc one. */
  private[graft] def groupwiseSplit(docIds: DataFrame, groups: DataFrame): DataFrame = {
    val s = docIds.sparkSession
    import s.implicits._
    docIds.join(groups, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"group_id", $"doc_id").as("group_id"))
      .withColumn("split", TextAnalysis.splitAssign($"group_id"))
      .withColumn("naive", TextAnalysis.splitAssign($"doc_id"))
  }

  private val d22Sql = {
    val splitOnGroup = TextAnalysis.duckSplitAssignOn("group_id")
    val splitOnDoc = TextAnalysis.duckSplitAssignOn("doc_id")
    s"""$duckGroupsCte,
       |ag AS (SELECT d.doc_id, coalesce(g.group_id, d.doc_id) AS group_id
       |       FROM documents d LEFT JOIN g USING (doc_id)),
       |a AS (SELECT doc_id, group_id,
       |        $splitOnGroup AS split,
       |        $splitOnDoc AS naive
       |      FROM ag)
       |SELECT split, count(*) AS n_docs,
       |  count(DISTINCT group_id) AS n_groups,
       |  sum(CASE WHEN naive <> split THEN 1 ELSE 0 END)::BIGINT AS n_rescued_docs
       |FROM a GROUP BY split ORDER BY split""".stripMargin
  }

  /** d10 — the composed corpus-preparation pipeline, end to end in one
    * declarative plan: exact dedup (keep the lowest doc_id per content
    * hash, as a window — no self-join) → quality floor (≥ 20 words) →
    * deterministic train/holdout split (TextAnalysis.splitAssign, the
    * SAME definition t06 ships) → per-split stats. This is the user
    * story the individual operators exist for; the dedup window's
    * content-hash shuffle is the only wide stage over the corpus (the
    * split/filter are narrow maps, the final stats exchange carries two
    * rows). */
  private def d10Pipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val keepFirst = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(keepFirst))
      .filter($"rn" === 1)
      .withColumn("n_words", size(TextAnalysis.words($"text")))
      .filter($"n_words" >= 20)
      .withColumn("split", TextAnalysis.splitAssign($"doc_id"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), avg($"n_words").as("avg_words"))
      .orderBy($"split")
  }

  private val d10Sql =
    s"""WITH d AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_words
       |  FROM (SELECT doc_id, text,
       |          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |        FROM documents) r
       |  WHERE rn = 1 AND len(string_split(text, ' ')) >= 20)
       |SELECT ${TextAnalysis.duckSplitAssign} AS split,
       |  count(*) AS n_docs, avg(n_words) AS avg_words
       |FROM d GROUP BY 1 ORDER BY split""".stripMargin

  /** d11 — semantic dedup (SemDeDup-style): drop every embedding that has
    * a semantically-near neighbor with a SMALLER vec_id (cosine above
    * `SemDedupTau`), keep the rest. The keep/drop rule is pairwise-local
    * (dup ⇔ ∃ earlier neighbor), so no label propagation is needed —
    * unlike the text path (d03→d08→d09), where transitive LSH candidates
    * must be grouped before survivors can be picked.
    *
    * The pair stage here is d07's exact O(n²) scan — the correctness
    * baseline. At 100 TB the same anti-join consumes bucketed pairs
    * instead: s04's IVF cell assignment (train once, broadcast centroids,
    * narrow-map assign) keys the self-join by cell, which is this data's
    * only change — the survivors anti-join is already key-local either
    * way. Threshold 0.45 sits at this corpus's near-dup knee (global max
    * pairwise cosine ≈ 0.51, random-pair mass ends ≈ 0.4). */
  val SemDedupTau = 0.45

  /** Exact near-dup id set (vectors with an earlier neighbor above
    * [[SemDedupTau]]) — the one O(n²) scan of the semantic-dedup family,
    * computed once per (session, dir) and materialized: d11 anti-joins
    * it for survivors and d12 reuses it (d11b's recall gate runs on the
    * bounded sample instead — see [[SemDedupSampleK]]). Like the IVF
    * index and the dup-group artifact, recomputing it per query would
    * double the family's dominant cost for no semantic reason. */
  private val semDupCache = new graft.util.SessionCache[DataFrame](
    releaseValue = graft.util.SessionCache.releaseFrame, gcReclaimable = true)

  private def exactSemDups(s: SparkSession, dir: String): DataFrame =
    semDupCache.getOrBuild(s, dir)({
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val a = Tables.spread(emb.select($"vec_id".as("vec_a"), $"embedding".as("ea")))
      val b = emb.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
      a.join(b, $"vec_a" < $"vec_b")
        .filter(graft.functions.CosineSimilarity.column($"ea", $"eb") > SemDedupTau)
        .select($"vec_b".as("dup_id")).distinct()
        .localCheckpoint()
    })

  private def d11SemDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .join(exactSemDups(s, dir), $"vec_id" === $"dup_id", "left_anti")
      .select($"vec_id", $"label")
      .orderBy($"vec_id")
  }

  private val d11Sql =
    s"""WITH n AS (SELECT vec_id, embedding, ${Similarity.duckNorm} AS nrm FROM embeddings),
       |dups AS (
       |  SELECT DISTINCT b.vec_id AS dup_id
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id
       |  WHERE ${Similarity.duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) > $SemDedupTau)
       |SELECT e.vec_id, e.label FROM embeddings e
       |LEFT JOIN dups d ON e.vec_id = d.dup_id
       |WHERE d.dup_id IS NULL
       |ORDER BY vec_id""".stripMargin

  /** d11b — the 100 TB path for d11: candidate pairs meet on a shared IVF
    * cell instead of the exact O(n²) scan. Each vector carries its 3
    * nearest k-means cells (Similarity.ivfMultiAssigned — corpus-side
    * multi-assignment, the pair-generation analog of query-side
    * multi-probe; single-cell assignment catches only 14–50 % of this
    * corpus's near-dup pairs, top-3 catches 93–100 %). The emitted
    * contract is the measured recall of the bucketed dup set against a
    * SAMPLED exact ground truth ([[sampledSemDups]]): floor 0.7, measured
    * 0.93–1.0 across sf0.001–0.1 under the fixed quantizer seed, vs
    * ≈ 0.1 for a broken index. Precision needs no gate: in-cell
    * candidates are verified with the same exact cosine, so bucketed
    * dups are a subset of exact dups by construction. */
  val SemDedupRecallFloor = 0.7

  /** Probe-sample size for d11b's recall denominator. The ground truth is
    * exact dup-ness of [[SemDedupSampleK]] deterministically-sampled
    * vectors (smallest md5(vec_id) — partition-independent), each checked
    * against the FULL corpus with one broadcast join: O(K·n) work with K
    * fixed, so the gate itself runs at 100 TB — unlike a full O(n²)
    * denominator, which certifies a bucketed path with a scan the path
    * exists to avoid. Recall over the sample is an unbiased estimate of
    * corpus recall; at the shipped sf ≤ 0.01 corpora (500 vectors) the
    * sample IS the corpus, so the gate stays exhaustive there. */
  val SemDedupSampleK = 512

  /** The sampled exact ground truth: which of the K sampled vectors have
    * an earlier neighbor above [[SemDedupTau]] — broadcast the K probes,
    * stream the corpus once. */
  private[graft] def sampledSemDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val sample = emb
      .orderBy(md5($"vec_id".cast("string")), $"vec_id")
      .limit(SemDedupSampleK)
      .select($"vec_id".as("b"), $"embedding".as("eb"))
    val corpus = Tables.spread(emb.select($"vec_id".as("a"), $"embedding".as("ea")))
    corpus.join(broadcast(sample), $"a" < $"b")
      .filter(graft.functions.CosineSimilarity.column($"ea", $"eb") > SemDedupTau)
      .select($"b".as("dup_id")).distinct()
  }

  /** The IVF-bucketed dup set d11b gates (shared with
    * `tools/ProfileSemDedupRecall`, which must profile THIS pipeline,
    * not a copy that can drift from it). */
  private[graft] def ivfSemDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asg = Similarity.ivfMultiAssigned(s, dir)
    val ca = asg.select($"vec_id".as("a"), $"embedding".as("ea"), $"cell")
    val cb = asg.select($"vec_id".as("b"), $"embedding".as("eb"), $"cell".as("cellb"))
    ca.join(cb, $"cell" === $"cellb" && ($"a" < $"b"))
      .filter(graft.functions.CosineSimilarity.column($"ea", $"eb") > SemDedupTau)
      .select($"b".as("dup_id")).distinct()
  }

  private def d11bSemDedupIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ivfDups = ivfSemDups(s, dir)
    val exactDups = sampledSemDups(s, dir).select($"dup_id".as("xdup_id"))
    exactDups.join(ivfDups, $"xdup_id" === $"dup_id", "left")
      .agg((count($"dup_id").cast("double") / count(lit(1))).as("recall"))
      .select((coalesce($"recall", lit(1.0)) >= SemDedupRecallFloor).as("recall_ok"))
  }

  private val d11bSql = "SELECT true AS recall_ok"

  /** d12 — the composed embedding-curation pipeline (d10's twin for the
    * vector side, the embeddings user story end to end): semantic-dedup
    * survivors (the shared d11 artifact) → deterministic train/holdout
    * split (t06's md5 definition, on vec_id) → per-split corpus stats.
    * One declarative plan: anti-join + narrow split map + a two-row
    * aggregate — the dedup artifact's pair scan stays the only heavy
    * stage, shared with d11/d11b. */
  private def d12EmbedPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .join(exactSemDups(s, dir), $"vec_id" === $"dup_id", "left_anti")
      .withColumn("split", TextAnalysis.splitAssign($"vec_id"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct($"label").as("n_labels"),
        avg(Similarity.norm($"embedding")).as("avg_norm"))
      .orderBy($"split")
  }

  private val d12Sql =
    s"""WITH n AS (SELECT vec_id, embedding, label, ${Similarity.duckNorm} AS nrm
       |           FROM embeddings),
       |dups AS (
       |  SELECT DISTINCT b.vec_id AS dup_id
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id
       |  WHERE ${Similarity.duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) > $SemDedupTau)
       |SELECT ${TextAnalysis.duckSplitAssignOn("vec_id")} AS split,
       |  count(*) AS n_vecs, count(DISTINCT label) AS n_labels, avg(nrm) AS avg_norm
       |FROM n LEFT JOIN dups d ON n.vec_id = d.dup_id
       |WHERE d.dup_id IS NULL
       |GROUP BY 1 ORDER BY split""".stripMargin

  /** d13 — chunk-level exact substring dedup (the span-level counterpart
    * of d01's whole-document hash): documents are cut into fixed 20-word
    * chunks, each chunk keyed by md5, and every chunk that already
    * occurred earlier in corpus order (doc_id, then chunk position) is
    * flagged as a duplicate span. This is the operator that strips
    * repeated boilerplate/templated spans from a web corpus — repeated
    * license headers, navigation text, quoted passages — where
    * whole-document dedup (d01) and near-dup LSH (d03/d05) both miss
    * span-level repetition. Fixed word windows stand in for paragraph
    * boundaries (the synthetic corpus is single-line).
    *
    * Scale shape: explode is a narrow map bounded by total corpus words /
    * 20; the only shuffle carries (16-byte md5, doc_id, idx) triples —
    * never chunk text — and first-occurrence ranking is a window over
    * that hash key, the same partial-shuffle shape as d01. Chunk-hash
    * skew (one viral chunk) is a window skew, not a join blowup: the
    * per-hash group holds occurrence ids only. */
  private def d13ChunkDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ChunkWords = 20
    val chunks = Tables.spread(Tables.documents(s, dir))
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0),
        floor((size($"ws") - lit(1)) / lit(ChunkWords)).cast("int"))))
      .select($"doc_id", $"chunk_idx",
        md5(array_join(
          slice($"ws", $"chunk_idx" * ChunkWords + 1, lit(ChunkWords)), " "))
          .as("h"))
    val firstSeen = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id", $"chunk_idx")
    chunks
      .withColumn("rn", row_number().over(firstSeen))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"rn" > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .orderBy($"doc_id")
  }

  private val d13Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |           WHERE len(string_split(text, ' ')) > 0),
      |c AS (SELECT doc_id,
      |        unnest(generate_series(0, (len(ws) - 1) // 20)) AS chunk_idx, ws
      |      FROM w),
      |h AS (SELECT doc_id, chunk_idx,
      |        md5(array_to_string(ws[chunk_idx*20+1:chunk_idx*20+20], ' ')) AS h
      |      FROM c),
      |r AS (SELECT doc_id, chunk_idx,
      |        row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
      |      FROM h)
      |SELECT doc_id, count(*) AS n_chunks,
      |  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bottom-k sketch size for the containment candidate generator. */
  val BottomK = 8

  /** d14 — CONTAINMENT near-dup: pairs where the smaller document's
    * shingle set is mostly inside the larger's (|A∩B| / min(|A|,|B|)) —
    * the quotation/partial-copy relation that whole-set Jaccard (d06)
    * under-scores (a doc fully quoted inside a 10× larger one has
    * J ≈ 0.1 but containment 1.0) and chunk dedup (d13) only catches at
    * fixed alignments. Candidates come from a bottom-[[BottomK]] sketch
    * (the k smallest shingle md5s per doc — order statistics, so a
    * contained doc's sketch overlaps the container's): docs sharing ≥ 2
    * sketch hashes meet on an equi-join over 8 rows/doc, never all
    * pairs; the exact containment then runs only on candidates. The
    * oracle runs the SAME algorithm (sketch rule included), so the
    * measurement is well-defined — pairs below the sketch's reach are
    * excluded by definition, as with d03's banding. */
  private def d14Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // shingle once, reuse for sketch AND exact joins (the oracle's `sk`
    // CTE shape) — each reference below would otherwise re-run
    // WordShingles over every document
    val sketched = withSh3(Tables.documents(s, dir)).select($"doc_id", $"sh")
      .withColumn("bottom",
        slice(array_sort(transform($"sh", x => md5(x))), 1, BottomK))
      .localCheckpoint()
    val ex = sketched.select($"doc_id", explode($"bottom").as("h"))
    val cand = ex.select($"h", $"doc_id".as("doc_a"))
      .join(ex.select($"h".as("h2"), $"doc_id".as("doc_b")),
        $"h" === $"h2" && $"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= 2)
      .select($"doc_a", $"doc_b")
    cand
      .join(sketched.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(sketched.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      .withColumn("containment",
        size(array_intersect($"sh_a", $"sh_b")).cast("double")
          / least(size($"sh_a"), size($"sh_b")))
      .filter($"containment" >= 0.5)
      .select($"doc_a", $"doc_b", $"containment")
      .orderBy($"doc_a", $"doc_b")
  }

  private val d14Sql =
    s"""WITH sh AS (SELECT doc_id, ${duckShingles(3)} AS sh FROM documents),
       |sk AS (SELECT doc_id, sh,
       |         list_sort(list_transform(sh, x -> md5(x)))[1:$BottomK] AS bottom
       |       FROM sh),
       |ex AS (SELECT doc_id, unnest(bottom) AS h FROM sk),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT doc_a, doc_b,
       |  len(list_intersect(ha.sh, hb.sh))::DOUBLE
       |    / least(len(ha.sh), len(hb.sh)) AS containment
       |FROM cand
       |JOIN sk ha ON ha.doc_id = doc_a
       |JOIN sk hb ON hb.doc_id = doc_b
       |WHERE len(list_intersect(ha.sh, hb.sh))::DOUBLE
       |    / least(len(ha.sh), len(hb.sh)) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d15 — the MinHash signatures AS AN ESTIMATOR, measured: for every
    * LSH candidate pair, the 16-stream match-fraction estimate of J next
    * to the exact shingle-set J and the absolute error — the
    * collision-probability identity E[est] = J made visible (and
    * hash-checked: both engines compute both numbers per pair, so a
    * broken stream constant or band wiring shows up as a value diff, not
    * just a weaker recall). The exact side joins shingle sets only for
    * candidate pairs — the estimator's whole point is that the full
    * corpus never pays the exact-J cost.
    *
    * Candidate generation is the Spark-side [[minhashCandidates]] with
    * its [[MaxBucketSize]] degenerate-bucket cap, and the oracle's pairs
    * CTE applies the SAME cap (`ok` CTE: buckets kept only while
    * `count(*) <= cap`) — so the two sides agree by construction at any
    * corpus scale, including one with a degenerate >cap band bucket
    * (round-6 verdict item 3; the same `ok` guard is applied to every
    * capped-candidate oracle in the matrix — d03, d05/d05b, the
    * d08/d09/d22 groups CTE, d17/d18 — not only here). */
  private def d15MinhashEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val pairs = minhashCandidates(docs)
    // ONE per-doc frame carrying BOTH comparison inputs — the 16
    // signature streams AND the exact shingle set (r18, guide §1.2/§2.3:
    // don't compute things twice, and fewer joins shuffle fewer rows).
    // The previous form built FOUR independent broadcast subtrees
    // (sig a/b + sh a/b), each recomputing shingles from the scan; the
    // combined frame pays the shingle+signature map twice (once per
    // broadcast side) and joins twice instead of four times. Join
    // semantics are unchanged: sig and sh both had exactly one row per
    // doc_id, so fusing them into one inner join per side yields the
    // identical row set. Deliberately NO merge hints: the hinted SMJ
    // form shares the compute once via ReusedExchange but trades the
    // broadcasts for an exchange+sort chain — measured WORSE (A/B at
    // sf0.1: hinted 1.40 s, base 0.96 s, this form 0.70 s); per-doc
    // signature compute is a parallel narrow map, cheap at every scale,
    // while the sort chain grows with the corpus.
    val sigCols = (0 until NumHashes)
      .map(k => element_at(col("sig"), k + 1).as(f"m$k%02d"))
    val per = withSh3(docs)
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

  private val d15Sql = {
    val est = (0 until NumHashes)
      .map(k => f"CASE WHEN sa.m$k%02d = sb.m$k%02d THEN 1 ELSE 0 END")
      .mkString("(", " + ", s")::DOUBLE / $NumHashes")
    s"""WITH $duckKeysCte,
       |sig AS (SELECT doc_id, $duckSigSelect FROM vv),
       |banded AS ($duckBands),
       |ok AS (SELECT band_idx, band_hash FROM banded
       |       GROUP BY 1, 2 HAVING count(*) <= $MaxBucketSize),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id
       |  JOIN ok o ON o.band_idx = a.band_idx AND o.band_hash = a.band_hash),
       |est AS (
       |  SELECT p.doc_a, p.doc_b, $est AS est_j
       |  FROM pairs p
       |  JOIN sig sa ON sa.doc_id = p.doc_a
       |  JOIN sig sb ON sb.doc_id = p.doc_b)
       |SELECT e.doc_a, e.doc_b, e.est_j,
       |  len(list_intersect(x.sh, y.sh))::DOUBLE
       |    / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS exact_j,
       |  abs(e.est_j - len(list_intersect(x.sh, y.sh))::DOUBLE
       |    / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))) AS abs_err
       |FROM est e
       |JOIN s x ON x.doc_id = e.doc_a
       |JOIN s y ON y.doc_id = e.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** The deterministic "already ingested" corpus for the incremental
    * entries (d16/d17): even-id documents plus synthetic cross-posts of
    * the id%4==1 half of the batch (the m04 device — natural cross-split
    * duplicates only exist at sf0.1, and an incremental-dedup entry whose
    * duplicate set is empty at the oracle SF would never exercise the
    * match path). The batch is the odd-id half; its id%4==1 docs are
    * known duplicates, its id%4==3 docs are genuinely new. */
  private def seenHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    docs.filter(pmod($"doc_id", lit(2)) === 0).select(md5($"text").as("h"))
      .union(docs.filter(pmod($"doc_id", lit(4)) === 1).select(md5($"text").as("h")))
      .distinct()
  }

  private def batchDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).filter(pmod($"doc_id", lit(2)) === 1)
  }

  /** d16 — incremental exact dedup, bloom-gated: which documents of an
    * incoming batch are NEW against an already-ingested corpus. The
    * 100 TB shape: the seen corpus is answered by a BLOOM SIDECAR (one
    * `BloomFilterAggregate` pass, the z02 machinery on the content-hash
    * domain), so the batch never joins the full corpus — a bloom NO is
    * definitely-new (no false negatives) and passes through with zero
    * join work; only the bloom's YES slice (true duplicates + the ~fpp
    * false positives) pays the exact anti-join that removes false
    * positives. Per batch the corpus-sized work is one stationary sketch
    * probe per row; the join's left side is duplicate-sized, not
    * batch-sized. Exactness does NOT depend on the sketch: the result is
    * identical to the plain anti-join by construction (bloom-negative ∪
    * exactly-verified positive), which is what the oracle checks — any
    * false negative in the sketch path would surface as a missing row.
    *
    * The sketch travels as a literal into a codegen'd probe — the q58
    * CMS device; `xxhash64` keys the bloom (collisions only ever ADD
    * false positives, which the verify join removes). */
  /** The bloom-gated anti-join core: rows of `batch` (doc_id, h) whose
    * `h` is absent from `seen` (h) — result identical to a plain
    * anti-join; the sketch only bounds how much of the batch pays the
    * join. Exposed for the spec's equivalence proof on crafted data. */
  /** Build the seen-corpus bloom sidecar: one distributed pass, one
    * driver-held sketch (the z02/q58 pattern — sketches are artifacts,
    * not data paths). Returns null when `seen` contributed zero non-null
    * hashes (BloomFilterAggregate's empty-input result). */
  def bloomSidecar(seen: DataFrame, expectedItems: Long): Array[Byte] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val s = seen.sparkSession
    val n = math.max(1L, expectedItems)
    // BloomFilterAggregate silently CLAMPS to the session's runtime-filter
    // caps (4M items / 67M bits by default) — the construction-time size
    // would quietly saturate again at corpus scale, the exact failure the
    // corpus-derived capacity exists to prevent. Raise the caps to cover
    // n before building (measured ~7.3 bits/item ≈ 0.9 bytes/item in the
    // driver-held sketch — past the single filter's 2^31-bit ceiling or
    // driver memory, use [[bloomSidecarSliced]]: the hash domain
    // partitions into independent per-slice filters).
    withSketchCaps(s, n) {
      seen.agg(GraftBridge.column(
          new BloomFilterAggregate(GraftBridge.expression(xxhash64(col("h"))), n)
            .toAggregateExpression()).as("bf"))
        .head.getAs[Array[Byte]](0)
    }
  }

  /** Run `body` (which must EXECUTE its sketch build, not just plan it)
    * with the runtime bloom-filter caps raised to fit `n` items, then
    * RESTORE the previous caps: the caps are session-global and also
    * clamp the optimizer's own injected runtime filters — leaving them
    * raised after one corpus-sized sidecar build would let any later
    * unrelated join build a multi-GB filter the defaults exist to
    * prevent. (A concurrent unrelated query can still plan inside the
    * bracket's window — bounded and transient, unlike the permanent
    * raise this replaces; the same session-conf caveat as ModeExec's
    * bracket.) */
  // Brackets SERIALIZE per session: without the monitor, bracket A's
  // restore could land between bracket B's skip-raise check (caps look
  // sufficient) and B's job submission, silently clamping B's sketch to
  // the defaults — an undersized filter raises the false-positive rate
  // and wrongly drops unseen docs. Sketch builds are rare, seconds-long
  // operations; serializing them is the honest cost (the ModeExec
  // mode-bracket discipline).
  private val sketchCapLocks =
    new java.util.WeakHashMap[SparkSession, Object]
  private def sketchCapLock(s: SparkSession): Object =
    sketchCapLocks.synchronized {
      var l = sketchCapLocks.get(s)
      if (l == null) { l = new Object; sketchCapLocks.put(s, l) }
      l
    }

  private def withSketchCaps[T](s: SparkSession, n: Long)(body: => T): T =
    sketchCapLock(s).synchronized {
      val needBits = math.min(n * 10, Int.MaxValue.toLong - 8)
      val itemsCap = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val bitsCap = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val prevItems = s.conf.get(itemsCap)
      val prevBits = s.conf.get(bitsCap)
      if (prevItems.toLong >= n && prevBits.toLong >= needBits) body
      else try {
        if (prevItems.toLong < n) s.conf.set(itemsCap, n.toString)
        if (prevBits.toLong < needBits) s.conf.set(bitsCap, needBits.toString)
        body
      } finally {
        s.conf.set(itemsCap, prevItems)
        s.conf.set(bitsCap, prevBits)
      }
    }

  /** Hash-domain-partitioned sidecar — the scale path past the single
    * filter's ceilings, which are REAL at corpus scale: one
    * BloomFilterAggregate tops out at 2³¹−8 bits (≈214 M items at ~10
    * bits/item — a 100 TB corpus is orders of magnitude past it, where
    * [[bloomSidecar]]'s fpp silently decays), and its merge path funnels
    * every partial through one final task. Here the domain splits into
    * `slices` by `pmod(xxhash64(h), slices)`: each slice is an
    * independent filter sized for its share, built in ONE distributed
    * groupBy (each reduce task builds its own slice — the build
    * parallelizes instead of funneling), and the probe consults exactly
    * the one filter its key routes to, so per-pair fpp equals the
    * equally-sized single-filter case while total capacity scales
    * linearly with `slices`. A slice with no seen rows stays null and
    * probes definitely-absent. Element order inside a slice never
    * affects the resulting bit set, so the distributed build is
    * deterministic. */
  def bloomSidecarSliced(seen: DataFrame, expectedItems: Long,
      slices: Int): Seq[Array[Byte]] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(slices >= 1, s"slices=$slices")
    val s = seen.sparkSession
    val perSlice = math.max(1L, math.max(1L, expectedItems) / slices)
    val rows = withSketchCaps(s, perSlice) {
      seen
        .groupBy(pmod(xxhash64(col("h")), lit(slices)).as("slice"))
        .agg(GraftBridge.column(
          new BloomFilterAggregate(GraftBridge.expression(xxhash64(col("h"))), perSlice)
            .toAggregateExpression()).as("bf"))
        .collect()
    }
    val out = new Array[Array[Byte]](slices)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getAs[Array[Byte]](1))
    out.toSeq
  }

  /** Membership probe against a sliced sidecar: route by the SAME
    * `pmod(xxhash64(c), slices)` the build used, consult only that
    * slice's filter (null slice → definitely absent). Same contract as
    * [[bloomMight]]: false positives only, removed by the verify join. */
  def bloomMightSliced(sketches: Seq[Array[Byte]], c: Column): Column = {
    val slice = pmod(xxhash64(c), lit(sketches.length))
    sketches.zipWithIndex.foldRight(lit(false): Column) { case ((bytes, i), acc) =>
      when(slice === i,
        if (bytes == null) lit(false) else bloomMight(bytes, c)).otherwise(acc)
    }
  }

  /** [[bloomNew]] over the sliced sidecar: identical result (the specs
    * pin it against the plain anti-join on the bloomNew property
    * fixtures), single-filter ceilings removed. */
  def bloomNewSliced(seen: DataFrame, batch: DataFrame, expectedItems: Long,
      slices: Int): DataFrame = {
    if (expectedItems <= 0) return batch.join(seen, Seq("h"), "left_anti")
    val might = bloomMightSliced(
      bloomSidecarSliced(seen, expectedItems, slices), col("h"))
    batch.filter(!might)
      .unionByName(batch.filter(might).join(seen, Seq("h"), "left_anti"))
  }

  /** Sketch membership probe as a codegen'd Column (xxhash64-keyed —
    * collisions only ever ADD false positives, which the verify join
    * removes). */
  def bloomMight(bloomBytes: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    GraftBridge.column(new BloomFilterMightContain(
      GraftBridge.expression(lit(bloomBytes)),
      GraftBridge.expression(xxhash64(c))))
  }

  def bloomNew(seen: DataFrame, batch: DataFrame,
      expectedItems: Option[Long] = None): DataFrame = {
    // Size the sketch from the seen side (a maintained corpus stat in
    // production; one count agg here) — a fixed capacity would saturate
    // as the corpus grows, fpp→1, and the gate would silently degrade to
    // the full anti-join it exists to avoid.
    val n = expectedItems.getOrElse(seen.count())
    gatedNew(seen, batch, if (n == 0) null else bloomSidecar(seen, n))
  }

  /** The gate with a CALLER-HELD sketch — the streaming path
    * ([[ingestExactStream]]) maintains one sketch across batches
    * instead of re-scanning the corpus to rebuild it per batch. A null
    * sketch means "no gate": every row pays the verify join (empty
    * corpus ⇒ BloomFilterAggregate yields NULL, and a NULL probe would
    * three-valued-logic away EVERY batch row; with no sketch the
    * anti-join alone is the correct answer). The sketch NEVER affects
    * the result — only which fraction of the batch takes the join. */
  private def gatedNew(seen: DataFrame, batch: DataFrame,
      bloomBytes: Array[Byte]): DataFrame = {
    if (bloomBytes == null) return batch.join(seen, Seq("h"), "left_anti")
    def might(c: Column): Column = bloomMight(bloomBytes, c)
    val definitelyNew = batch.filter(!might(col("h")))
    val verifiedNew = batch.filter(might(col("h")))
      .join(seen, Seq("h"), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }

  private def d16BloomIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batch = batchDocs(s, dir).select($"doc_id", md5($"text").as("h"))
    // capacity: the corpus row count is a parquet-metadata-only agg and a
    // guaranteed upper bound on the seen-hash cardinality — overprovision
    // (lower fpp) rather than re-derive the distinct seen set for a count
    val cap = Tables.documents(s, dir).count()
    bloomNew(seenHashes(s, dir), batch, expectedItems = Some(cap))
      .select($"doc_id", $"h".as("content_hash"))
      .orderBy($"doc_id")
  }

  private val d16Sql =
    """WITH seen AS (
      |  SELECT DISTINCT md5(text) AS h FROM documents
      |  WHERE doc_id % 2 = 0 OR doc_id % 4 = 1)
      |SELECT doc_id, md5(text) AS content_hash
      |FROM documents b
      |WHERE doc_id % 2 = 1
      |  AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.h = md5(b.text))
      |ORDER BY doc_id""".stripMargin

  // ---- persistent exact-dedup corpus (d19 — the d18 symmetry for d16) --

  /** Persist the seen content-hash corpus as a parquet table BUCKETED by
    * `h` — the cross-run state of exact ingestion dedup, exactly as the
    * band index (d18) is for near-dup (d17). The verify anti-join keys
    * on `h` alone, so bucketing on `h` lets the bloom-positive slice of
    * each batch join the corpus with ZERO corpus-side shuffle: only the
    * (duplicate-sized) batch slice moves, into the corpus's on-disk
    * partitioning. Maintenance is append-shaped — a processed batch's
    * NEW hashes (bloomNew's own output) append into the same bucket
    * scheme — and [[compactBandIndex]] folds the per-batch files (its
    * bucket-spec handling is layout-generic). */
  /** Corpus rows carry `src` — the micro-batch id that introduced the
    * hash (−1 for a bulk load). Replay-exactness for the streaming loop
    * hangs on it: a crash-replayed batch filters its OWN prior append
    * out of the seen side (`src != batchId`) and reproduces its first
    * attempt's output bit-for-bit. Batch callers never see the column. */
  def writeHashCorpus(seen: DataFrame, table: String, buckets: Int): Unit =
    graft.plans.Bucketing.writeBucketedMulti(
      seen.select(col("h")).distinct().withColumn("src", lit(-1L)),
      table, buckets, Seq("h"))

  /** The rows of `batch` (doc_id, h) whose `h` is absent from the
    * persistent corpus: [[bloomNew]] semantics with the seen side read
    * from the bucketed table. `expectedItems` sizes the sketch (pass a
    * maintained corpus stat; defaults to one count over the corpus
    * table — metadata-cheap on parquet). */
  def corpusNew(s: SparkSession, corpusTable: String, batch: DataFrame,
      expectedItems: Option[Long] = None): DataFrame = {
    val seen = s.table(corpusTable)
    bloomNew(seen, batch, Some(expectedItems.getOrElse(seen.count())))
  }

  /** Append a processed batch's genuinely-new hashes into the corpus
    * (bucket spec mirrored from the catalog; relation cache refreshed
    * for the calling session — the [[appendBandIndex]] discipline).
    * Append the NEW rows only ([[corpusNew]]'s output): appending the
    * whole batch would duplicate already-seen hashes forever. */
  def appendHashCorpus(s: SparkSession, table: String, newRows: DataFrame,
      src: Long = -1L): Unit = {
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table has no bucket spec — not a hash corpus table"))
    newRows.select(col("h")).distinct().withColumn("src", lit(src)).write
      .format("parquet").mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
      .sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
      .saveAsTable(table)
    s.catalog.refreshTable(table)
    graft.cache.HybridScan.invalidateListings(meta.location.toString)
  }

  /** Union two [[bloomSidecar]] sketches built with the SAME capacity
    * (bloom filters OR together losslessly when their bit geometry
    * matches — same numBits, same hash count, which equal capacities
    * guarantee). */
  def mergeSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    fa.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }

  /** The exact-dedup ingestion loop as a STREAM — [[ingestStream]]'s
    * sibling for content-hash identity. Per micro-batch of (doc_id,
    * text): gate the batch through the maintained sketch, verify the
    * positives against the persistent corpus, hand the genuinely-new
    * rows to the caller's sink, append them (tagged with the batch id),
    * and fold their delta sketch into the gate.
    *
    * Two 100 TB disciplines, both measured needs, not ornament:
    *  - the SKETCH IS STREAM STATE: built once from the corpus at open
    *    and extended per batch by merging a batch-sized delta
    *    ([[mergeSketches]]) — rebuilding it per batch would re-scan the
    *    whole corpus at every trigger, corpus-sized work the sidecar
    *    exists to avoid. `capacity` must be provisioned for corpus
    *    GROWTH over the stream's lifetime (deltas merge only into
    *    same-geometry filters); when the corpus outgrows it, fpp decays
    *    gracefully — correctness never depends on the sketch PROVIDED
    *    the stream is the corpus table's ONLY writer. The maintained
    *    sketch only learns this stream's own appends: an out-of-band
    *    [[appendHashCorpus]] (or a second stream on the same table)
    *    adds hashes the sketch reports definitely-absent, and those
    *    rows would bypass the verify join as false "new"s. Single
    *    writer per corpus table is the precondition, as everywhere in
    *    the maintenance surface.
    *  - replay is EXACT, not merely tolerated: new-ness is judged
    *    against `src != batchId`, so a crash-replayed batch excludes
    *    its own committed append and reproduces its first attempt's
    *    rows; the sketch (which may already contain them) only routes
    *    those rows through the verify join. In-batch duplicate hashes
    *    are out of scope by the [[ingestStream]] convention — run d01's
    *    dropDuplicates on the batch first when wanted.
    * `onNew` must CONSUME its frame within the call: the micro-batch's
    * checkpoint blocks are released when the trigger ends (truncated
    * lineage — a deferred evaluation would find them gone). */
  def ingestExactStream(s: SparkSession, corpusTable: String, docStream: DataFrame,
      onNew: (DataFrame, Long) => Unit,
      capacityHint: Option[Long] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val (capacity, sketch0) = openSketch(s, corpusTable, capacityHint)
    var sketch = sketch0
    docStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val hashed = batch.select(col("doc_id"), md5(col("text")).as("h"))
      val seen = s.table(corpusTable).filter(col("src") =!= lit(batchId))
      sketch = appendNewAndExtend(
        s, corpusTable, seen, hashed, sketch, batchId, capacity, onNew)
    }
  }

  /** Sketch-at-open for a streamed ingestion loop: the capacity
    * (provisioned for corpus growth — deltas merge only into
    * same-geometry filters) and the initial sketch, null for an empty
    * corpus. */
  private def openSketch(s: SparkSession, corpusTable: String,
      capacityHint: Option[Long]): (Long, Array[Byte]) = {
    val corpus0 = s.table(corpusTable)
    val capacity = capacityHint.getOrElse(math.max(1000000L, corpus0.count() * 4))
    (capacity, if (corpus0.isEmpty) null else bloomSidecar(corpus0, capacity))
  }

  /** The per-batch maintenance tail shared by [[ingestExactStream]] and
    * [[ingestSpanStream]] — ONE copy of the gate/append/delta-merge
    * sequence so the replay and sketch semantics can never diverge
    * between the loops: judge `hashed` against `seen` through the
    * maintained sketch, hand the genuinely-new rows to `onNew`, append
    * them tagged with the batch id, and return the sketch extended by
    * their delta. The localCheckpoint pins ONE evaluation for the three
    * consumers (sink, append, delta) — and keeps the append from
    * re-running the gate against a corpus it is itself mutating. An
    * empty new set (idle trigger, all-duplicate input) skips the whole
    * maintenance half: catalog read, distinct shuffle, zero-row
    * bucketed write commit, relation-cache refresh — per trigger, that
    * overhead is the ingestion loop's steady state. */
  private def appendNewAndExtend(s: SparkSession, corpusTable: String,
      seen: DataFrame, hashed: DataFrame, sketch: Array[Byte],
      batchId: Long, capacity: Long,
      onNew: (DataFrame, Long) => Unit = (_, _) => ()): Array[Byte] = {
    val newRows = gatedNew(seen, hashed, sketch).localCheckpoint()
    try {
      onNew(newRows, batchId)
      if (!newRows.isEmpty) {
        appendHashCorpus(s, corpusTable, newRows, batchId)
        val delta = bloomSidecar(newRows, capacity)
        if (sketch == null) delta else mergeSketches(sketch, delta)
      } else sketch
    } finally graft.util.SessionCache.releaseFrame(newRows)
  }

  private val hashCorpusCache = new graft.util.SessionCache[(SparkSession, String)](
    releaseValue = graft.plans.Bucketing.dropTable)

  private def d19CorpusTable(s: SparkSession, dir: String): String =
    hashCorpusCache.getOrBuild(s, s"$dir#d19corpus") {
      graft.plans.Bucketing.buildArtifactTable(s, "d19_hash_corpus", dir)(
        writeHashCorpus(seenHashes(s, dir), _,
          math.max(4, s.sparkContext.defaultParallelism)))
    }._2

  /** d19 — d16 against the PERSISTENT bucketed hash corpus: identical
    * rows (same oracle), but the seen side is a cross-run catalog table
    * whose layout already matches the verify join. */
  private def d19PersistentExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batch = batchDocs(s, dir).select($"doc_id", md5($"text").as("h"))
    val cap = Tables.documents(s, dir).count()
    corpusNew(s, d19CorpusTable(s, dir), batch, expectedItems = Some(cap))
      .select($"doc_id", $"h".as("content_hash"))
      .orderBy($"doc_id")
  }

  /** d17 — incremental LSH near-dup: candidate (new, seen) pairs of an
    * incoming batch against the already-ingested corpus's band index.
    * The production ingestion shape for MinHash dedup: the seen side's
    * (band_idx, band_hash, doc_id) index is a STATIONARY artifact
    * maintained across batches (here derived in-query; in production a
    * bucketed table partitioned by band hash); per batch only the new
    * documents' signatures are computed (a narrow map) and the join
    * shuffles batch-sized bands into the index's partitioning — the
    * corpus is never re-banded, never self-joined. Same degenerate-
    * bucket economics as d03: a seen bucket above [[MaxBucketSize]] is
    * excluded (boilerplate that hot belongs to exact dedup), and the
    * oracle applies the identical cap in its `ok` CTE (the d15 parity
    * convention), so both sides agree at any corpus scale. */
  /** The incremental candidate core: (new_doc, seen_doc) pairs whose
    * bands collide, with the seen-side bucket cap applied BEFORE the
    * batch join. Exposed for the spec's cap-behavior test. */
  def incrementalLshPairs(seenDocs: DataFrame, newDocs: DataFrame,
      maxBucket: Int = MaxBucketSize): DataFrame =
    // Sharing the seen-side band compute between the join core's two
    // consumers (cap aggregate + semi probe) via an explicit
    // `repartition(band_idx, band_hash)` was TRIED and REVERTED (r18):
    // PushDownLeftSemiAntiJoin pushes the semi join BELOW a user
    // repartition, so the semi side recomputed the bands anyway and the
    // repartition survived as one extra full exchange above the semi —
    // A/B 1.28 → 1.62 s. The duplicate band compute is a parallel narrow
    // map (cheap at any SF); the SCALE path for a corpus-sized seen side
    // is d18's bucketed index, whose on-disk layout already serves both
    // consumers exchange-free.
    pairsAgainstIndex(bandHashes(seenDocs), bandHashes(newDocs), maxBucket)

  /** The join core shared by the in-query (d17) and persistent-index
    * (d18) incremental variants: `seenB` is a (doc_id, band_idx,
    * band_hash) band index, `newB` the batch's bands. */
  private def pairsAgainstIndex(seenB: DataFrame, newB: DataFrame,
      maxBucket: Int): DataFrame = {
    // DISTINCT docs, not rows: a crash-replayed append duplicates index
    // rows, and a row count would push a legitimate bucket over the cap
    // and silently drop all its candidates — breaking the documented
    // replay tolerance ("duplicate bands only make duplicate candidates,
    // distinct removes those"). countDistinct prices the bucket at its
    // true population; the oracle counts one row per doc already.
    val okBuckets = seenB.groupBy(col("band_idx"), col("band_hash"))
      .agg(countDistinct(col("doc_id")).as("n")).filter(col("n") <= maxBucket)
      .select(col("band_idx"), col("band_hash"))
    // cap applied to the INDEX side before the batch join — a degenerate
    // bucket never expands, matching bucketPairs' drop-then-pair order
    val seenOk = seenB.join(okBuckets, Seq("band_idx", "band_hash"), "left_semi")
    newB.join(seenOk.select(col("band_idx"), col("band_hash"), col("doc_id").as("seen_doc")),
        Seq("band_idx", "band_hash"))
      .select(col("doc_id").as("new_doc"), col("seen_doc"))
      .distinct()
  }

  /** Persist a corpus's band index as a parquet table BUCKETED by the
    * full clustering key (band_idx, band_hash) — the cross-run form of
    * d17's "stationary index" claim. Bucketing pins
    * HashPartitioning(band_idx, band_hash) into the table layout, which
    * is exactly the clustering of every downstream operator, so the
    * ENTIRE index side of an incremental batch plans with zero
    * Exchange: the cap aggregation, the semi-join, and the batch join
    * all reuse the on-disk partitioning, and only the (small) batch
    * shuffles — into the index's partitioning. (Both keys, not just
    * band_hash: Spark's co-partition check requires the bucket keys to
    * cover the join's full clustering set.) At 100 TB the index is the
    * corpus-sized side; never moving it is the whole economics of
    * ingestion-time dedup. Maintenance is append-shaped: a processed
    * batch's bands append into the same bucket scheme. */
  def writeBandIndex(seenDocs: DataFrame, table: String, buckets: Int): Unit =
    graft.plans.Bucketing.writeBucketedMulti(bandHashes(seenDocs), table, buckets,
      Seq("band_idx", "band_hash"))

  /** Incremental LSH pairs against a [[writeBandIndex]] table. Same
    * result as [[incrementalLshPairs]] on the same corpus split, by
    * construction — the spec asserts the plan property (index side
    * shuffle-free), the oracle pins the rows. */
  def indexedLshPairs(s: SparkSession, indexTable: String, newDocs: DataFrame,
      maxBucket: Int = MaxBucketSize): DataFrame =
    pairsAgainstIndex(s.table(indexTable), bandHashes(newDocs), maxBucket)

  /** The maintenance half of the ingestion loop: once a batch is
    * processed (its near-dups resolved), its bands APPEND into the same
    * bucket scheme so the next batch sees it as corpus — no rebuild, no
    * re-banding of anything already indexed. The bucket spec is read
    * back from the catalog and mirrored, so an append can never silently
    * change the table's partitioning (Spark validates the layouts
    * match); each append adds one file per touched bucket, and the scan
    * stays bucketed (compaction folds small files per plain
    * [[graft.sources.Sink]] economics, outside this operator). */
  def appendBandIndex(s: SparkSession, table: String, processedDocs: DataFrame): Unit = {
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table has no bucket spec — not a band index table"))
    bandHashes(processedDocs).write
      .format("parquet").mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
      .sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
      .saveAsTable(table)
    // the write invalidates the WRITING session's relation cache only —
    // when `processedDocs` belongs to another session (a foreachBatch
    // micro-batch clone, [[ingestStream]]), `s`'s cached file listing
    // would silently keep serving the pre-append index
    s.catalog.refreshTable(table)
    graft.cache.HybridScan.invalidateListings(meta.location.toString)
  }

  private def d17IncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    incrementalLshPairs(
      docs.filter(pmod($"doc_id", lit(2)) === 0),
      docs.filter(pmod($"doc_id", lit(2)) === 1))
      .orderBy($"new_doc", $"seen_doc")
  }

  /** The full ingestion loop as a STREAM: each arriving micro-batch of
    * documents is (1) banded — a narrow per-row map, stream-compatible —
    * and joined against the persistent index for its corpus-side
    * near-dup candidates, then (2) its own bands are appended into the
    * index, so the NEXT batch sees it as corpus. Candidates are computed
    * strictly before the append: a document must never match itself
    * through its own just-written bands. In-batch pairs are deliberately
    * out of scope here (two near-dups arriving in one batch pair with
    * the corpus, not each other) — run [[minhashCandidates]] on the
    * batch inside `onCandidates` when in-batch detection is wanted;
    * batch-vs-corpus is this operator's contract, and it is exactly
    * [[incrementalLshPairs]]' semantics applied per micro-batch (the
    * spec pins stream output == d17's batch result on the same split).
    * foreachBatch rather than a stream-static join in the plan: the
    * maintenance append is a table write, and per-batch batch-semantics
    * processing + explicit sink callback is the Structured Streaming
    * idiom for exactly that (the ev17 CDC-merge shape).
    *
    * Replay safety is STRUCTURAL, not sequencing-dependent: the
    * candidate frame anti-joins the batch's own doc_ids out of the
    * index side, so even when the index already contains this batch's
    * bands — a crash-replayed micro-batch re-running after its append
    * committed, or a lazy `onCandidates` that evaluates the frame after
    * the append — no document can match itself or a same-batch
    * neighbor. (Sequencing alone was the first design; the review
    * killed it: a replay after a committed append, or any callback that
    * defers evaluation, would have emitted self-pairs the first attempt
    * never produced.) A replayed append itself is tolerated: duplicate
    * index bands only make duplicate candidates for FUTURE batches, and
    * the join core's `distinct` removes those. */
  def ingestStream(s: SparkSession, indexTable: String, docStream: DataFrame,
      onCandidates: (DataFrame, Long) => Unit,
      maxBucket: Int = MaxBucketSize): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onCandidates(batchCandidates(s, indexTable, batch, maxBucket), batchId)
      appendBandIndex(s, indexTable, batch)
    }

  /** One micro-batch's corpus-side candidates: index pairs with the
    * batch's OWN doc_ids excluded from the seen side (the replay-safety
    * core of [[ingestStream]] — correct whether or not the batch's
    * bands already reached the index, and whenever the frame is
    * evaluated). The exclusion is a broadcast anti-join against the
    * batch's ids — batch-sized, never corpus-sized. */
  def batchCandidates(s: SparkSession, indexTable: String, batch: DataFrame,
      maxBucket: Int = MaxBucketSize): DataFrame =
    pairsAgainstIndex(s.table(indexTable), bandHashes(batch), maxBucket)
      .join(broadcast(batch.select(col("doc_id").as("seen_doc"))),
        Seq("seen_doc"), "left_anti")
      // the equi-join key moves to column 0 — restore the (new, seen)
      // contract shared with incrementalLshPairs
      .select(col("new_doc"), col("seen_doc"))

  /** Fold an appended index's per-batch files back to one file per
    * bucket: every [[appendBandIndex]] adds a file to each touched
    * bucket, and at ingestion cadence the scan's file count (and its
    * open/footer overhead) grows linearly with batch count while the
    * bucket LAYOUT stays correct. Compaction is a self-rewrite under
    * the same bucket spec via the rename ladder (the Sink.compact
    * discipline, on catalog tables): write the compacted copy to a tmp
    * table, move the original aside, promote, drop the backup — a crash
    * between the renames leaves the backup table intact for manual
    * recovery, never a half-written index serving queries. */
  def compactBandIndex(s: SparkSession, table: String): Unit = {
    val tmp = table + "_compact_tmp"
    val bak = table + "_compact_bak"
    // recover a compaction that died between its two renames: the index
    // parked under the bak name, nothing at the queried name — swap it
    // back (the Sink.recoverSwap discipline for catalog tables); then
    // clear a COMPLETED swap's leftover bak, which would otherwise make
    // the promote rename below fail with TABLE_ALREADY_EXISTS forever
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(bak))
      s.sql(s"ALTER TABLE $bak RENAME TO $table")
    s.sql(s"DROP TABLE IF EXISTS $bak")
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table has no bucket spec — not a band index table"))
    s.sql(s"DROP TABLE IF EXISTS $tmp")
    // bucketed writes emit one file per (task, bucket), so the read
    // tasks must align with buckets or the "compacted" table still
    // carries read-parallelism × buckets files. The trap (measured): a
    // repartition on the bucket columns is ELIDED by the optimizer as
    // redundant against the table's bucketing, while the planner
    // separately disables the bucketed scan (autoBucketedScan: nothing
    // left downstream requires the distribution) — leaving plain,
    // unaligned file splits and 7 files for 4 buckets. Forcing the
    // bucketed scan for this one write makes the SCAN the alignment:
    // one task per bucket reading that bucket's files, zero shuffle —
    // the compaction plan you want at 100 TB, where moving the index
    // to compact it would defeat the point. The repartition stays as
    // defense in depth: against a bucketed scan it is a no-op, and if
    // a future planner drops the bucketed read it re-aligns explicitly
    // (AQE off so its shuffle-read rewrite cannot break the placement).
    val scanConf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val aqeConf = "spark.sql.adaptive.enabled"
    val prevScan = s.conf.get(scanConf)
    val prevAqe = s.conf.get(aqeConf)
    try {
      s.conf.set(scanConf, "false")
      s.conf.set(aqeConf, "false")
      graft.plans.Bucketing.writeBucketedMulti(
        s.table(table).repartition(spec.numBuckets, spec.bucketColumnNames.map(col): _*),
        tmp, spec.numBuckets, spec.bucketColumnNames,
        // mirror the SORT spec too: defaulting sort to the bucket keys
        // would silently rewrite a layout whose sort differs
        sortKeys = spec.sortColumnNames)
    } finally {
      s.conf.set(scanConf, prevScan)
      s.conf.set(aqeConf, prevAqe)
    }
    s.sql(s"ALTER TABLE $table RENAME TO $bak")
    // restore on a failed promote — never leave the index missing (the
    // Sink.compact contract; queries would otherwise die
    // TABLE_OR_VIEW_NOT_FOUND with the data parked under the bak name)
    try s.sql(s"ALTER TABLE $tmp RENAME TO $table")
    catch { case e: Throwable =>
      try s.sql(s"ALTER TABLE $bak RENAME TO $table")
      catch { case _: Throwable => () } // bak stays for compactBandIndex's own recovery
      throw e
    }
    s.sql(s"DROP TABLE $bak")
    s.catalog.refreshTable(table)
  }

  /** The d18 index table is a catalog object, so its lifecycle rides the
    * SessionCache like every other artifact — built once per (session,
    * dir), DROPped at release points. Naming via
    * [[graft.plans.Bucketing.sessionTableName]]: catalog tables are
    * shared across sessions of one SparkContext, and two sessions (or
    * two RACING builders — the per-attempt nonce) must never write to,
    * or release, each other's index. */
  private val bandIndexCache = new graft.util.SessionCache[(SparkSession, String)](
    releaseValue = graft.plans.Bucketing.dropTable)

  private def d18IndexTable(s: SparkSession, dir: String): String =
    bandIndexCache.getOrBuild(s, s"$dir#d18index") {
      graft.plans.Bucketing.buildArtifactTable(s, "d18_band_index", dir)(
        writeBandIndex(
          Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(2)) === 0),
          _, math.max(4, s.sparkContext.defaultParallelism)))
    }._2

  /** d18 — d17 against the PERSISTENT bucketed band index: identical
    * pairs (same oracle), but the seen side is a cross-run catalog table
    * whose layout already matches the join — the measured form of the
    * "stationary index" design. */
  private def d18IndexedLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    indexedLshPairs(s, d18IndexTable(s, dir),
      Tables.documents(s, dir).filter(pmod($"doc_id", lit(2)) === 1))
      .orderBy($"new_doc", $"seen_doc")
  }

  private val d17Sql =
    s"""WITH $duckKeysCte,
       |sig AS (SELECT doc_id, $duckSigSelect FROM vv),
       |banded AS ($duckBands),
       |sb AS (SELECT * FROM banded WHERE doc_id % 2 = 0),
       |nb AS (SELECT * FROM banded WHERE doc_id % 2 = 1),
       |ok AS (SELECT band_idx, band_hash FROM sb
       |       GROUP BY 1, 2 HAVING count(*) <= $MaxBucketSize)
       |SELECT DISTINCT n.doc_id AS new_doc, s.doc_id AS seen_doc
       |FROM nb n
       |JOIN sb s ON n.band_idx = s.band_idx AND n.band_hash = s.band_hash
       |JOIN ok o ON o.band_idx = s.band_idx AND o.band_hash = s.band_hash
       |ORDER BY new_doc, seen_doc""".stripMargin

  /** Window width (in words) for substring-span dedup — the granularity at
    * which a repeated passage counts as duplicated, the d13 chunk width. */
  val SpanWindow = 20

  /** d20 — maximal duplicated SUBSTRING spans at stride 1 (the
    * train-data-dedup shape from "Deduplicating Training Data Makes
    * Language Models Better": any `SpanWindow`-word passage occurring ≥2
    * times in the corpus — any document, any offset — marks its tokens
    * duplicated; overlapping/contiguous duplicated windows merge into
    * maximal per-document spans). This is the alignment-free completion of
    * d13: fixed chunking only sees offsets 0, k, 2k, … and misses a copied
    * paragraph shifted by one word; here every offset is a window, so a
    * shared passage is found wherever it sits, and the output names the
    * exact repeated region (span_start…span_end, 1-based word positions)
    * instead of a per-chunk count.
    *
    * Scale shape: window hashing is a narrow map via the native
    * [[graft.functions.RollingWindowHash]] — each token digested once,
    * O(1) per additional window, so stride 1 costs what d13's stride k
    * costs instead of k× it. The explode emits (h, doc_id, pos) triples
    * (20 bytes — never window text). Multiplicity goes through
    * groupBy(h).count, NOT a count-over-window: partial aggregation
    * collapses a viral boilerplate hash map-side before the shuffle,
    * where a window function would buffer the whole hot bucket in one
    * task. The c≥2 hash list joins back on h (AQE may broadcast it when
    * duplication is rare), and span assembly shuffles (doc_id, pos) pairs
    * once for the per-document island merge — gaps-and-islands with
    * lag(): same-width sorted intervals merge iff the next start is
    * within prev_start + k (token-contiguous duplication). Every shuffle
    * carries hashes and integer ids over corpus-words-sized data — never
    * text — and there is no all-pairs stage anywhere. */
  private def d20SubstringSpans(s: SparkSession, dir: String): DataFrame =
    substringSpans(Tables.spread(Tables.documents(s, dir)), SpanWindow)()
      .orderBy(col("doc_id"), col("span_start"))

  /** (doc_id, pos, h) for every stride-1 k-word window; pos is the
    * 1-based start word index. */
  private def slidingWindows(docs: DataFrame, k: Int,
      windowHash: Column => Column): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= k)
      .select($"doc_id", posexplode(windowHash($"ws")))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"), $"col".as("h"))
  }

  /** Gaps-and-islands merge of same-width k-windows into maximal
    * per-document intervals (s, e): sorted same-width windows merge iff
    * the next start is within prev_start + k — token-contiguous
    * duplication — so an island's extent equals its covered word count. */
  private def mergeIslands(wins: DataFrame, k: Int): DataFrame = {
    val s = wins.sparkSession
    import s.implicits._
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    wins
      .withColumn("new_span",
        when($"pos" > coalesce(lag($"pos", 1).over(byDoc) + k, lit(Long.MinValue)), 1)
          .otherwise(0))
      .withColumn("span_id", sum($"new_span").over(byDoc))
      .groupBy($"doc_id", $"span_id")
      .agg(min($"pos").as("s"), (max($"pos") + lit(k - 1)).as("e"))
      .select($"doc_id", $"s", $"e")
  }

  private def defaultWindowHash(k: Int): Column => Column =
    ws => graft.functions.RollingWindowHash.column(ws, k)

  /** The d20 core over an arbitrary (doc_id, text) frame: maximal
    * per-document spans of words covered by some k-word window whose
    * content occurs ≥2 times in the corpus. `windowHash` swaps the
    * discriminator (rolling vs full-md5) so the spec can pin their
    * agreement; positions are 1-based word indices. */
  private[graft] def substringSpans(docs: DataFrame, k: Int)(
      windowHash: Column => Column = defaultWindowHash(k)): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val wins = slidingWindows(docs, k, windowHash)
    // multiplicity as a count-over-window on h — the d13/d21
    // canonicalization shape: ONE evaluation of the windowing (a
    // groupBy + join-back would re-run the scan and every digest for
    // the second branch) and one shuffle by h. A viral boilerplate
    // hash buffers its (doc_id, pos) occurrence list in one task —
    // WindowExec spills, and the rows are 20 bytes; the alternative
    // (map-side-combined groupBy + join) trades that buffer for a
    // full second windowing pass, the wrong trade while the hash
    // stage dominates.
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy($"h")
    mergeIslands(
      wins.withColumn("c", count(lit(1)).over(byHash)).filter($"c" >= 2)
        .select($"doc_id", $"pos"), k)
      .select($"doc_id", $"s".as("span_start"), $"e".as("span_end"),
        ($"e" - $"s" + 1).as("span_words"))
  }

  /** d21 — the REMOVAL half of substring dedup (d20 reports, d21 cuts):
    * for every duplicated window the corpus-order-first occurrence
    * (min doc_id, then position — the d13 rn=1 convention) is canonical
    * and stays; every later occurrence marks its k words for removal.
    * Per document, removed windows merge into disjoint covered intervals
    * (d20's island rule: same-width sorted windows merge iff the next
    * start is within prev_start+k, so an island's extent IS its covered
    * word count), and the cleaned text is the uncovered words rejoined in
    * order. Output: affected docs only — doc_id, n_words, n_cut,
    * text_clean ('' when a doc is a whole-document duplicate and loses
    * everything).
    *
    * Scale shape: windows/canonicalization shuffle hashes only (the d20
    * economics plus one row_number window over h — per-group state is
    * occurrence ids, never text); the merged cut-list per affected doc is
    * a few (start, end) structs, so reconstruction is a narrow map over
    * the docs scan — `filter(ws, (w, i) => …)` against the per-row
    * interval list, no word-level shuffle anywhere. The cuts side joins
    * on doc_id (AQE broadcasts it when duplication is rare). */
  private def d21SpanRemoval(s: SparkSession, dir: String): DataFrame =
    spanRemoval(Tables.spread(Tables.documents(s, dir)), SpanWindow)
      .orderBy(col("doc_id"))

  /** The d21 core over an arbitrary (doc_id, text) frame — see the entry
    * doc above for semantics and scale shape. */
  private[graft] def spanRemoval(docsRaw: DataFrame, k: Int): DataFrame = {
    val s = docsRaw.sparkSession
    import s.implicits._
    val docs = docsRaw.select($"doc_id", split($"text", " ").as("ws"))
    val wins = slidingWindows(docsRaw, k, defaultWindowHash(k))
    val firstSeen = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id", $"pos")
    val cutWins = wins.withColumn("rn", row_number().over(firstSeen))
      .filter($"rn" > 1).select($"doc_id", $"pos")
    val cuts = mergeIslands(cutWins, k)
      .groupBy($"doc_id")
      .agg(collect_list(struct($"s", $"e")).as("spans"),
        sum($"e" - $"s" + 1).as("n_cut"))
    docs.join(cuts, "doc_id")
      .select($"doc_id", size($"ws").cast("long").as("n_words"), $"n_cut",
        concat_ws(" ", filter($"ws", (w, i) =>
          !exists($"spans", c =>
            (i + 1).cast("long") >= c("s") && (i + 1).cast("long") <= c("e"))))
          .as("text_clean"))
  }

  private val d21Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |c AS (SELECT doc_id,
       |        unnest(generate_series(1, len(ws) - ${SpanWindow - 1})) AS pos, ws
       |      FROM w WHERE len(ws) >= $SpanWindow),
       |g AS (SELECT doc_id, pos,
       |        md5(array_to_string(ws[pos:pos+${SpanWindow - 1}], ' ')) AS h
       |      FROM c),
       |r AS (SELECT doc_id, pos,
       |        row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |      FROM g),
       |x AS (SELECT doc_id, pos FROM r WHERE rn > 1),
       |m AS (SELECT doc_id, pos,
       |        CASE WHEN pos > coalesce(
       |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                 + $SpanWindow, -9223372036854775808)
       |             THEN 1 ELSE 0 END AS new_span
       |      FROM x),
       |sp AS (SELECT doc_id, pos,
       |         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |       FROM m),
       |iv AS (SELECT doc_id, min(pos) AS s, max(pos) + ${SpanWindow - 1} AS e
       |       FROM sp GROUP BY doc_id, span_id),
       |cut AS (SELECT doc_id, sum(e - s + 1)::BIGINT AS n_cut
       |        FROM iv GROUP BY doc_id),
       |pos AS (SELECT w.doc_id, unnest(generate_series(1, len(ws))) AS i, ws
       |        FROM w JOIN cut USING (doc_id)),
       |keep AS (SELECT doc_id, i, ws[i] AS word FROM pos p
       |         WHERE NOT EXISTS (SELECT 1 FROM iv
       |                           WHERE iv.doc_id = p.doc_id
       |                             AND p.i BETWEEN iv.s AND iv.e)),
       |clean AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text_clean
       |          FROM keep GROUP BY doc_id)
       |SELECT w.doc_id, len(w.ws)::BIGINT AS n_words, cut.n_cut,
       |  coalesce(clean.text_clean, '') AS text_clean
       |FROM w JOIN cut ON w.doc_id = cut.doc_id
       |LEFT JOIN clean ON w.doc_id = clean.doc_id
       |ORDER BY w.doc_id""".stripMargin

  // The oracle hashes each window's full text with md5 (content equality
  // exactly); the Spark side discriminates with the 64-bit rolling hash.
  // Outputs agree unless unequal windows collide at 64 bits (~2⁻⁶⁴/pair;
  // the spec also pins the rolling path against an md5-window path).
  private val d20Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |           WHERE len(string_split(text, ' ')) >= $SpanWindow),
       |c AS (SELECT doc_id,
       |        unnest(generate_series(1, len(ws) - ${SpanWindow - 1})) AS pos, ws
       |      FROM w),
       |g AS (SELECT doc_id, pos,
       |        md5(array_to_string(ws[pos:pos+${SpanWindow - 1}], ' ')) AS h
       |      FROM c),
       |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
       |x AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (h)),
       |m AS (SELECT doc_id, pos,
       |        CASE WHEN pos > coalesce(
       |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                 + $SpanWindow, -9223372036854775808)
       |             THEN 1 ELSE 0 END AS new_span
       |      FROM x),
       |sp AS (SELECT doc_id, pos,
       |         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |       FROM m)
       |SELECT doc_id, min(pos) AS span_start,
       |  max(pos) + ${SpanWindow - 1} AS span_end,
       |  max(pos) + ${SpanWindow - 1} - min(pos) + 1 AS span_words
       |FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_start""".stripMargin

  /** Rows of `batch` whose `h` IS present in the persistent corpus table
    * — the membership dual of [[corpusNew]], same economics: the
    * corpus-sized sketch drops definite-negatives (for substring dedup,
    * almost every window of a typical batch) BEFORE any shuffle, and the
    * left-semi verify against the h-bucketed table removes the sketch's
    * false positives with the corpus side planning shuffle-free. When
    * the expected count is 0 (empty corpus — or a stale maintained
    * stat) the gate degrades to the ungated semi-join, the bloomNew
    * fail-safe direction: the economics change, never the answer. */
  def corpusHits(s: SparkSession, corpusTable: String, batch: DataFrame,
      expectedItems: Option[Long] = None): DataFrame = {
    val seen = s.table(corpusTable).select(col("h"))
    val n = expectedItems.getOrElse(seen.count())
    if (n == 0) return batch.join(seen, Seq("h"), "left_semi")
    batch.filter(bloomMight(bloomSidecar(seen, n), col("h")))
      .join(seen, Seq("h"), "left_semi")
  }

  /** The d23 core: maximal spans of `batch` documents covered by k-word
    * windows whose content already exists in the persistent window-hash
    * index (d20's span semantics, with "duplicated" meaning "present in
    * the ingested corpus" instead of "occurs twice in this frame"). */
  def spansAgainstIndex(s: SparkSession, indexTable: String,
      batch: DataFrame, k: Int = SpanWindow): DataFrame = {
    import s.implicits._
    val wins = slidingWindows(batch, k, defaultWindowHash(k))
    mergeIslands(corpusHits(s, indexTable, wins).select($"doc_id", $"pos"), k)
      .select($"doc_id", $"s".as("span_start"), $"e".as("span_end"),
        ($"e" - $"s" + 1).as("span_words"))
  }

  /** Persist a corpus's stride-1 window hashes as the h-bucketed table
    * [[corpusHits]] verifies against — [[writeHashCorpus]] with windows
    * instead of whole-document hashes. */
  def writeWindowIndex(seenDocs: DataFrame, table: String, buckets: Int,
      k: Int = SpanWindow): Unit =
    writeHashCorpus(slidingWindows(seenDocs, k, defaultWindowHash(k)),
      table, buckets)

  /** Append a processed batch's windows into the index —
    * [[appendHashCorpus]] over the batch's GENUINELY-NEW window hashes
    * (gated through [[corpusNew]]: a batch quoting a corpus-known
    * passage — the very thing d23 detects — must not re-append every
    * already-indexed window, or the index grows with total ingested
    * windows instead of distinct ones; appendHashCorpus's distinct is
    * per-append only). The window index IS a hash-corpus table, so
    * bucket-spec mirroring, relation-cache refresh, and compaction all
    * apply unchanged. Retrieval for a batch must run strictly BEFORE
    * its append, the d18/d19 loop discipline. */
  def appendWindowIndex(s: SparkSession, table: String, procDocs: DataFrame,
      k: Int = SpanWindow, src: Long = -1L): Unit =
    appendHashCorpus(s, table,
      corpusNew(s, table, slidingWindows(procDocs, k, defaultWindowHash(k))),
      src)

  /** The substring-dedup ingestion loop as a STREAM —
    * [[ingestExactStream]]'s sibling at window granularity. Per
    * micro-batch of (doc_id, text): window the batch once
    * (localCheckpoint — the hit and new halves must see ONE evaluation
    * of the explode), report which spans the corpus has already seen
    * (retrieval strictly BEFORE the append, so a document never matches
    * its own windows), hand them to the caller's sink, then append the
    * genuinely-new window hashes tagged with the batch id and fold
    * their delta into the maintained sketch.
    *
    * The d19 disciplines carry over verbatim: the sketch is STREAM
    * STATE (built once at open, extended by batch-sized deltas, never
    * rebuilt from the corpus — single writer per index table is the
    * precondition); new-ness and hits are both judged against
    * `src != batchId`, so a crash-replayed batch excludes its own
    * committed append and reproduces its first attempt's spans
    * bit-for-bit. `onSpans` must consume its frame within the call
    * (micro-batch lineage is truncated when the trigger ends). */
  def ingestSpanStream(s: SparkSession, indexTable: String, docStream: DataFrame,
      onSpans: (DataFrame, Long) => Unit,
      k: Int = SpanWindow,
      capacityHint: Option[Long] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val (capacity, sketch0) = openSketch(s, indexTable, capacityHint)
    var sketch = sketch0
    docStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // localCheckpoint: the hit and new halves must see ONE evaluation
      // of the windowing explode
      val wins = slidingWindows(batch, k, defaultWindowHash(k)).localCheckpoint()
      try {
        val seen = s.table(indexTable)
          .filter(col("src") =!= lit(batchId)).select(col("h"))
        // an all-null sketch means the corpus was empty at open and this
        // stream has appended nothing yet — no window can be a hit
        val hits =
          if (sketch == null) wins.filter(lit(false))
          else wins.filter(bloomMight(sketch, col("h")))
            .join(seen, Seq("h"), "left_semi")
        onSpans(mergeIslands(hits.select(col("doc_id"), col("pos")), k)
          .select(col("doc_id"), col("s").as("span_start"), col("e").as("span_end"),
            (col("e") - col("s") + 1).as("span_words")), batchId)
        sketch = appendNewAndExtend(
          s, indexTable, seen, wins, sketch, batchId, capacity)
      } finally graft.util.SessionCache.releaseFrame(wins)
    }
  }

  private val windowIndexCache = new graft.util.SessionCache[(SparkSession, String)](
    releaseValue = graft.plans.Bucketing.dropTable)

  private def d23IndexTable(s: SparkSession, dir: String): String =
    windowIndexCache.getOrBuild(s, s"$dir#d23index") {
      graft.plans.Bucketing.buildArtifactTable(s, "d23_window_index", dir)(
        writeWindowIndex(
          Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(2)) === 0),
          _, math.max(4, s.sparkContext.defaultParallelism)))
    }._2

  /** d23 — substring spans against the PERSISTENT window index: the
    * ingestion-time form of d20, completing the incremental trilogy
    * (exact d19, LSH d18, substring d23). The seen half of the corpus
    * (even doc_ids, the d18 convention) is ingested once as a bucketed
    * window-hash table; the batch (odd doc_ids) reports which of its
    * spans already exist in the corpus — without the corpus being
    * re-hashed, re-shuffled, or self-joined. Batch-internal repeats are
    * deliberately NOT reported (they are d20's in-frame job); the index
    * answers only "seen before". */
  private def d23IndexedSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    spansAgainstIndex(s, d23IndexTable(s, dir),
      Tables.spread(
        Tables.documents(s, dir).filter(pmod($"doc_id", lit(2)) === 1)))
      .orderBy($"doc_id", $"span_start")
  }

  private val d23Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |           WHERE len(string_split(text, ' ')) >= $SpanWindow),
       |c AS (SELECT doc_id,
       |        unnest(generate_series(1, len(ws) - ${SpanWindow - 1})) AS pos, ws
       |      FROM w),
       |g AS (SELECT doc_id, pos,
       |        md5(array_to_string(ws[pos:pos+${SpanWindow - 1}], ' ')) AS h
       |      FROM c),
       |sh AS (SELECT DISTINCT h FROM g WHERE doc_id % 2 = 0),
       |x AS (SELECT g.doc_id, g.pos FROM g JOIN sh USING (h)
       |      WHERE g.doc_id % 2 = 1),
       |m AS (SELECT doc_id, pos,
       |        CASE WHEN pos > coalesce(
       |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                 + $SpanWindow, -9223372036854775808)
       |             THEN 1 ELSE 0 END AS new_span
       |      FROM x),
       |sp AS (SELECT doc_id, pos,
       |         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |       FROM m)
       |SELECT doc_id, min(pos) AS span_start,
       |  max(pos) + ${SpanWindow - 1} AS span_end,
       |  max(pos) + ${SpanWindow - 1} - min(pos) + 1 AS span_words
       |FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_exact_dedup"   -> d01Exact _,
    "d02_minhash_sig"   -> d02MinhashSig _,
    "d03_minhash_pairs" -> d03MinhashPairs _,
    "d04_simhash"       -> d04Simhash _,
    "d04b_simhash64"    -> d04bSimhash64 _,
    "d05_simhash_pairs" -> d05SimhashPairs _,
    "d05b_simhash64_pairs" -> d05bSimhash64Pairs _,
    "d06_jaccard_pairs" -> d06JaccardPairs _,
    "d06b_jaccard_guarded" -> d06bJaccardGuarded _,
    "d07_embed_neardup" -> d07EmbedNearDup _,
    "d08_dup_groups"    -> d08DupGroups _,
    "d09_survivors"     -> d09Survivors _,
    "d10_pipeline"      -> d10Pipeline _,
    "d11_semdedup"      -> d11SemDedup _,
    "d11b_semdedup_ivf" -> d11bSemDedupIvf _,
    "d12_embed_pipeline" -> d12EmbedPipeline _,
    "d13_chunk_dedup"   -> d13ChunkDedup _,
    "d14_containment"   -> d14Containment _,
    "d15_minhash_estimate" -> d15MinhashEstimate _,
    "d16_bloom_incremental" -> d16BloomIncremental _,
    "d17_incremental_lsh" -> d17IncrementalLsh _,
    "d18_indexed_lsh"   -> d18IndexedLsh _,
    "d19_persistent_exact" -> d19PersistentExact _,
    "d20_substring_spans" -> d20SubstringSpans _,
    "d21_span_removal"  -> d21SpanRemoval _,
    "d22_leakage_split" -> d22LeakageSplit _,
    "d23_indexed_spans" -> d23IndexedSpans _,
  )

  val oracleSql: Map[String, String] = Map(
    "d01_exact_dedup"   -> d01Sql,
    "d02_minhash_sig"   -> d02Sql,
    "d03_minhash_pairs" -> d03Sql,
    "d04_simhash"       -> d04Sql,
    "d04b_simhash64"    -> d04bSql,
    "d05_simhash_pairs" -> d05Sql,
    "d05b_simhash64_pairs" -> d05bSql,
    "d06_jaccard_pairs" -> d06Sql,
    "d06b_jaccard_guarded" -> d06bSql,
    "d07_embed_neardup" -> d07Sql,
    "d08_dup_groups"    -> d08Sql,
    "d09_survivors"     -> d09Sql,
    "d10_pipeline"      -> d10Sql,
    "d11_semdedup"      -> d11Sql,
    "d11b_semdedup_ivf" -> d11bSql,
    "d12_embed_pipeline" -> d12Sql,
    "d13_chunk_dedup"   -> d13Sql,
    "d14_containment"   -> d14Sql,
    "d15_minhash_estimate" -> d15Sql,
    "d16_bloom_incremental" -> d16Sql,
    "d17_incremental_lsh" -> d17Sql,
    "d18_indexed_lsh"   -> d17Sql, // identical pairs, persistent-index path
    "d19_persistent_exact" -> d16Sql, // identical rows, persistent-corpus path
    "d20_substring_spans" -> d20Sql,
    "d21_span_removal"  -> d21Sql,
    "d22_leakage_split" -> d22Sql,
    "d23_indexed_spans" -> d23Sql,
  )
}
