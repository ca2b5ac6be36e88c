package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Event, EventStream}

/** Structured Streaming: the shared transforms produce identical results in
  * batch and incremental execution. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val sample = Seq(
    Event(1L, ts(5), 10L, "click", 1.0, "{}"),
    Event(2L, ts(20), 10L, "click", 2.0, "{}"),
    Event(3L, ts(65), 11L, "view", 3.0, "{}"),
    Event(4L, ts(70), 10L, "click", 4.0, "{}"),
    Event(5L, ts(130), 11L, "view", 5.0, "{}"))

  test("streamingHourlyStats over a memory stream equals batch hourlyStats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStream.streamingHourlyStats(input.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("hourly_test")
      .select($"hour", $"event_type", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventStream.hourlyStats(sample.toDF())
      .select($"hour", $"event_type", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streamingHourlyStats finalizes hours in Append mode once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the point of the window(ts) grouping: event-time metadata reaches
    // the aggregate, so Append mode is ACCEPTED and hour groups finalize
    // (state evicts) when the 2h watermark passes. Under the previous
    // date_trunc grouping this query was rejected at analysis — and in
    // Update mode its state grew without bound.
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStream.streamingHourlyStats(input.toDF())
      .writeStream.format("memory").queryName("hourly_append_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(Event(90L, ts(700), 99L, "view", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(91L, ts(1400), 99L, "view", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    // every sampled hour (00..02) is far behind the advanced watermark,
    // so Append must have emitted it — identical to the batch twin
    val streamed = spark.table("hourly_append_test")
      .filter($"hour" < "2024-01-01 03:00:00")
      .select($"hour", $"event_type", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventStream.hourlyStats(sample.toDF())
      .select($"hour", $"event_type", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"append-mode hours diverged: $streamed vs $batch")
  }

  test("sessionize splits sessions on EVENT-time gaps, emitting closed sessions only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // deliver in TWO micro-batches split mid-session: boundaries must
    // come from the events' timestamps, not micro-batch cadence (the
    // replay/backfill property — a batch twin of ev03's gap rule)
    input.addData(sample.take(2): _*)
    val q = EventStream.sessionize(input.toDS(), withTimeout = false)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(sample.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sessions_test").as[graft.streaming.SessionSummary]
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    // user 10: ts 5,20 | gap 50 min | 70 → one CLOSED session (2 events,
    // 7200 value... values 1+2=3.0); user 11: ts 65 | gap 65 min | 130 →
    // one closed session (1 event, 3.0). The trailing open sessions
    // ({70} and {130}) are state, not output — no partials ever emitted.
    assert(out == Set((10L, 2L, 3.0), (11L, 1L, 3.0)), s"got $out")
  }

  test("sessionize closes idle sessions by event-time timeout when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStream.sessionize(input.toDS(), withTimeout = true)
      .writeStream.format("memory").queryName("sessions_timeout_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // advance the watermark (2h delay) far past every open session's
      // last event + gap: the flush user's own session stays open, every
      // sampled session must close — gap-split AND timeout-closed alike
      input.addData(Event(90L, ts(700), 99L, "view", 0.0, "{}"))
      q.processAllAvailable()
      input.addData(Event(91L, ts(1400), 99L, "view", 0.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sessions_timeout_test")
      .as[graft.streaming.SessionSummary]
      .collect().filter(_.user_id != 99L)
      .map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(out == Set((10L, 2L, 3.0), (10L, 1L, 4.0),
      (11L, 1L, 3.0), (11L, 1L, 5.0)), s"got $out")
  }

  test("streaming dedup drops replayed events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    input.addData(sample.take(3): _*) // replay (at-least-once delivery)
    val q = EventStream.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable()
    finally q.stop()
    val ids = spark.table("dedup_test").select($"event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"got ${ids.toSeq}")
    // the batch execution of the SAME definition (ev19's dedup) must
    // collapse the replayed delivery to the identical survivor set
    val batch = EventStream.dedupStream((sample ++ sample.take(3)).toDF())
      .select($"event_id").collect().map(_.getLong(0)).sorted
    assert(batch.toSeq == ids.toSeq,
      s"batch twin diverged from streaming dedup: got ${batch.toSeq}")
  }

  test("stream-stream interval join matches its batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      Event(1L, ts(0), 1L, "click", 0, "{}"),
      Event(2L, ts(5), 1L, "error", 0, "{}"),   // within 10 min of click 1
      Event(3L, ts(20), 1L, "error", 0, "{}"),  // outside
      Event(4L, ts(30), 2L, "click", 0, "{}"),
      Event(5L, ts(31), 2L, "error", 0, "{}"))  // within, other user
    val input = MemoryStream[Event]
    input.addData(data: _*)
    val q = EventStream.clickErrorCorrelation(input.toDF())
      .writeStream.format("memory").queryName("corr_test")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("corr_test")
      .select($"c_id", $"e_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStream.clickErrorCorrelation(data.toDF())
      .select($"c_id", $"e_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((1L, 2L), (4L, 5L)))
    assert(streamed == batch)
  }

  test("stream-stream LEFT OUTER join emits null rows after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      Event(1L, ts(0), 1L, "click", 0, "{}"),   // matched by event 2
      Event(2L, ts(5), 1L, "error", 0, "{}"),
      Event(3L, ts(20), 2L, "click", 0, "{}"),  // no error in window -> null row
      Event(4L, ts(40), 1L, "error", 0, "{}"))  // outside click 1's window
    val input = MemoryStream[Event]
    input.addData(data: _*)
    val q = EventStream.clickErrorLeftOuter(input.toDF())
      .writeStream.format("memory").queryName("outer_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // an unmatched click is only emittable once the combined watermark
      // proves no partner can arrive: push both sides' event time far past
      // click 3's window + the 1h delay with flush events (user 99, which
      // joins with nothing in the comparison set)
      input.addData(
        Event(90L, ts(600), 99L, "click", 0, "{}"),
        Event(91L, ts(600), 99L, "error", 0, "{}"))
      q.processAllAvailable()
      input.addData(
        Event(92L, ts(1200), 99L, "click", 0, "{}"),
        Event(93L, ts(1200), 99L, "error", 0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .filter($"c_user" < 99L)
      .select($"c_id", $"e_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    val streamed = pairs(spark.table("outer_test"))
    val batch = pairs(EventStream.clickErrorLeftOuter(data.toDF()))
    assert(batch == Set((1L, Some(2L)), (3L, None)))
    assert(streamed == batch,
      s"streaming outer join must emit the unmatched click: $streamed")
  }

  test("CDC stream keeps a parquet table current via per-batch merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toFile.getAbsolutePath
    val table = s"$dir/users"
    val input = MemoryStream[Event]
    val q = EventStream.cdcUpsertStream(
      input.toDF().select($"user_id", $"value", $"event_id"),
      table, "user_id", "event_id", s"$dir/ckpt")
    try {
      input.addData(
        Event(1L, ts(0), 1L, "u", 10.0, "{}"),
        Event(2L, ts(1), 2L, "u", 20.0, "{}"),
        Event(3L, ts(2), 3L, "u", 30.0, "{}"))
      q.processAllAvailable()
      assert(spark.read.parquet(table).count() == 3)
      // second batch: two updates for user 2 in ONE batch (intra-batch
      // last-writer-wins by event_id) plus a brand-new key
      input.addData(
        Event(4L, ts(3), 2L, "u", 21.0, "{}"),
        Event(6L, ts(4), 2L, "u", 22.0, "{}"),
        Event(5L, ts(5), 4L, "u", 40.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(table)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(rows == Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0, 4L -> 40.0),
      s"merged table drifted: $rows")
    // replaying the same batch must not change the table (idempotence)
    graft.sources.Sink.mergeInto(spark, table,
      Seq((2L, 21.0, 4L), (2L, 22.0, 6L), (4L, 40.0, 5L))
        .toDF("user_id", "value", "event_id"),
      "user_id", "event_id")
    val replayed = spark.read.parquet(table)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(replayed == rows, "replaying a CDC batch must be a no-op")
  }

  test("asofJoin picks the latest right row at or before each left row") {
    import spark.implicits._
    def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val nul = null.asInstanceOf[java.lang.Long]
    val left = Seq(
      (L(1L), 10L, "a"), (L(1L), 4L, "b"), (L(2L), 3L, "c"), (L(3L), 9L, "d"),
      (nul, 9L, "e")) // NULL key: must match nothing (NULL = NULL is not a match)
      .toDF("k", "t", "tag")
    val right = Seq(
      (L(1L), 5L, L(50L)),
      (L(1L), 10L, L(99L)),
      (L(1L), 11L, L(70L)),
      (L(3L), 2L, L(7L)),
      (L(3L), 8L, nul), // true match with NULL payload
      (nul, 2L, L(41L))) // NULL-key right row: matchable by nobody
      .toDF("k", "t", "p")
    val got = EventStream.asofJoin(left, right, "k", "t", "p")
      .collect().map(r => r.getAs[String]("tag")
        -> Option(r.getAs[java.lang.Long]("p")).map(_.toLong)).toMap
    assert(got == Map(
      "a" -> Some(99L), // inclusive: right row at the exact same ts wins
      "b" -> None,      // earliest right for k=1 is at t=5 > 4
      "c" -> None,      // no right rows for k=2 at all
      "d" -> None,      // latest match (t=8) carries NULL — must NOT fall back to t=2
      "e" -> None))     // NULL join keys never match, even against NULL-key rights
  }

  test("event-time normalizes to TimestampType for all three physical encodings") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // The testdata's events.ts has shipped as TIMESTAMP(NANOS) (raw-nanos
    // LongType under the legacy conf), timestamp[us]/NTZ, and UTC TIMESTAMP
    // across generations; a re-encode must never re-break withWatermark.
    val base = "/tmp/graft-ts-encodings"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val wallclock = "2024-03-01 12:34:56"
    // build the instant from an explicit UTC offset — Timestamp.valueOf
    // would read the string in the JVM default zone, and this test must
    // pass on hosts where user.timezone is not UTC
    val instant = java.time.LocalDateTime.parse(wallclock.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val micros = instant.getEpochSecond * 1000000L
    Seq((1L, micros * 1000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/nanos_long/events.parquet")
    val typed = Seq((1L, java.sql.Timestamp.from(instant), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    typed.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.parquet(s"$base/micros_ntz/events.parquet")
    typed.write.parquet(s"$base/micros_tz/events.parquet")
    for (enc <- Seq("nanos_long", "micros_ntz", "micros_tz")) {
      val dir = s"$base/$enc"
      val batch = graft.sources.Tables.events(spark, dir)
      assert(batch.schema("ts").dataType == TimestampType, s"$enc batch type")
      assert(batch.select($"ts".cast("string")).head.getString(0) == wallclock,
        s"$enc: normalization must preserve the wall-clock instant (UTC session)")
      val stream = EventStream.readEventStream(spark, dir)
      assert(stream.isStreaming && stream.schema("ts").dataType == TimestampType,
        s"$enc stream type")
      // analysis succeeding proves withWatermark accepts the normalized column
      val agg = EventStream.streamingHourlyStats(stream)
      assert(agg.schema.fieldNames.contains("n_events"), s"$enc watermark plan")
    }
  }

  test("parquet-backed readStream plans incrementally with a watermark") {
    val stream = EventStream.readEventStream(spark, sfDir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "ts must surface as a timestamp after the nanos conversion")
    val agg = EventStream.streamingHourlyStats(stream)
    // analysis succeeds => watermark + windowed agg are streaming-compatible
    assert(agg.schema.fieldNames.contains("n_events"))
  }

  test("sliding event-time windows aggregate on a stream as in batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Seq(
      Event(1L, java.sql.Timestamp.valueOf("2001-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      Event(2L, java.sql.Timestamp.valueOf("2001-01-01 10:20:00"), 1L, "click", 2.0, "{}"),
      Event(3L, java.sql.Timestamp.valueOf("2001-01-01 10:50:00"), 2L, "click", 3.0, "{}"))
    def slide(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "30 minutes", "15 minutes"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val ms = MemoryStream[Event]
    ms.addData(events: _*)
    val q = slide(ms.toDF.withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("slide_test")
      .outputMode(OutputMode.Complete()).start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("slide_test")
      .select($"window.start".cast("string"), $"n", $"v").collect().toSet
    val batch = slide(events.toDF())
      .select($"window.start".cast("string"), $"n", $"v").collect().toSet
    assert(streamed == batch && batch.nonEmpty,
      "overlapping sliding windows must agree between stream and batch")
  }

  test("streaming file sink appends exactly-once parquet under a checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val out = "/tmp/graft-stream-sink/out"
    val ckpt = "/tmp/graft-stream-sink/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/graft-stream-sink"))
    def runOnce(): Unit = {
      val q = EventStream.dedupStream(EventStream.readEventStream(spark, sfDir))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }
    runOnce()
    val once = spark.read.parquet(out).count()
    assert(once > 0)
    // replaying with the same checkpoint must add nothing (exactly-once)
    runOnce()
    assert(spark.read.parquet(out).count() == once,
      "a replayed AvailableNow run with the same checkpoint must be a no-op")
  }

  test("stream-static enrichment join matches its batch twin") {
    import org.apache.spark.sql.streaming.Trigger
    val dim = graft.sources.Tables.customer(spark, sfDir)
    val q = EventStream.enrichedSegmentStats(
        EventStream.readEventStream(spark, sfDir), dim)
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("enrich_test").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    val batch = EventStream.enrichedSegmentStats(
        graft.sources.Tables.events(spark, sfDir), dim).collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(streamed == batch,
      "stream-static enrichment over AvailableNow must equal the batch join")
  }

  test("parquet-backed stream executes a real micro-batch matching batch counts") {
    import org.apache.spark.sql.streaming.Trigger
    val q = EventStream.readEventStream(spark, sfDir)
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("ev_mb_test")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("ev_mb_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "one AvailableNow pass must equal the batch result")
  }

  test("native session_window aggregates a stream identically to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStream.sessionWindowStats(
        input.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("sw_test")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable()
    finally q.stop()
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"user_id", $"sw.start", $"sw.end", $"n_events", $"total_value")
        .collect().map(_.toSeq).toSet
    val streamed = norm(spark.table("sw_test"))
    val batch = norm(EventStream.sessionWindowStats(sample.toDF()))
    assert(streamed == batch,
      "streaming session_window must merge the same sessions as batch")
    // the fixture's 60-minute gap splits user 10's events at minute 5/20
    // from the one at minute 70 — 2 sessions for user 10, 2 for user 11
    assert(batch.count(_.head == 10L) == 2 && batch.count(_.head == 11L) == 2)
  }

  test("streaming ingestion dedup: batch candidates against the persistent index, then append") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Dedup
    import graft.sources.Tables
    spark.sql("DROP TABLE IF EXISTS ingest_idx")
    val ckptRoot = "/tmp/graft-ingest-stream"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    try {
      val docs = Tables.documents(spark, sfDir)
      val evens = docs.filter(pmod($"doc_id", lit(2)) === 0)
      val odds = docs.filter(pmod($"doc_id", lit(2)) === 1)
      Dedup.writeBandIndex(evens, "ingest_idx", 4)
      val stream = spark.readStream.schema(docs.schema)
        .option("basePath", sfDir).parquet(s"$sfDir/documents*.parquet")
        .filter(pmod($"doc_id", lit(2)) === 1)
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = Dedup.ingestStream(spark, "ingest_idx", stream,
          (pairs, _) => got.synchronized {
            got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1))) })
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$ckptRoot/ckpt")
        .start()
      try q.awaitTermination(120000) finally q.stop()
      // the streamed candidates are exactly d17's batch semantics
      val expect = Dedup.incrementalLshPairs(evens, odds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.toSet == expect,
        s"streamed candidates ${got.toSet} must equal the batch twin $expect")
      // maintenance: the processed batch IS corpus now — the same
      // document queried again matches itself through the index
      val probe = odds.limit(1)
      val probeId = probe.select($"doc_id").as[Long].head
      val self = Dedup.indexedLshPairs(spark, "ingest_idx", probe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(self.contains((probeId, probeId)),
        s"appended batch must be visible as corpus (got $self for doc $probeId)")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ingest_idx")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    }
  }

  test("streaming span ingest: corpus-known spans before append, full coverage after") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Dedup
    import graft.sources.Tables
    spark.sql("DROP TABLE IF EXISTS ingest_win_idx")
    val ckptRoot = "/tmp/graft-ingest-span"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    try {
      val docs = Tables.documents(spark, sfDir)
      val evens = docs.filter(pmod($"doc_id", lit(2)) === 0)
      val odds = docs.filter(pmod($"doc_id", lit(2)) === 1)
      Dedup.writeWindowIndex(evens, "ingest_win_idx", 4)
      // the batch twin (d23 semantics), computed BEFORE any append
      val expect = Dedup.spansAgainstIndex(spark, "ingest_win_idx", odds)
        .collect().map(_.toSeq).toSet
      assert(expect.nonEmpty, "fixture must contain cross-half spans")
      val stream = spark.readStream.schema(docs.schema)
        .option("basePath", sfDir).parquet(s"$sfDir/documents*.parquet")
        .filter(pmod($"doc_id", lit(2)) === 1)
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      val q = Dedup.ingestSpanStream(spark, "ingest_win_idx", stream,
          (spans, _) => got.synchronized { got ++= spans.collect().map(_.toSeq) })
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$ckptRoot/ckpt")
        .start()
      try q.awaitTermination(120000) finally q.stop()
      assert(got.toSet == expect,
        s"streamed spans (${got.size}) must equal the batch twin (${expect.size})")
      // maintenance: after the append every window of every odd doc is
      // corpus — each ≥k-word odd doc now reports ONE full-extent span
      val after = Dedup.spansAgainstIndex(spark, "ingest_win_idx", odds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val nOdd = odds
        .filter(size(split($"text", " ")) >= Dedup.SpanWindow).count()
      assert(after.size == nOdd && after.forall(_._2 == 1L),
        s"appended windows must cover every odd doc end-to-end (${after.size} spans, $nOdd docs)")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ingest_win_idx")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    }
  }

  test("streaming exact-dedup ingest: gated new rows, corpus append, replay-exact via src") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Dedup
    import graft.sources.Tables
    spark.sql("DROP TABLE IF EXISTS ingest_hash_corpus")
    val ckptRoot = "/tmp/graft-ingest-exact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    try {
      val docs = Tables.documents(spark, sfDir)
      val evens = docs.filter(pmod($"doc_id", lit(2)) === 0)
      val odds = docs.filter(pmod($"doc_id", lit(2)) === 1)
      Dedup.writeHashCorpus(evens.select(md5($"text").as("h")), "ingest_hash_corpus", 4)
      val stream = spark.readStream.schema(docs.schema)
        .option("basePath", sfDir).parquet(s"$sfDir/documents*.parquet")
        .filter(pmod($"doc_id", lit(2)) === 1)
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = Dedup.ingestExactStream(spark, "ingest_hash_corpus", stream,
          (rows, _) => got.synchronized {
            got ++= rows.select($"doc_id").as[Long].collect() })
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$ckptRoot/ckpt")
        .start()
      try q.awaitTermination(120000) finally q.stop()
      val hashedOdds = odds.select($"doc_id", md5($"text").as("h"))
      val expect = hashedOdds
        .join(evens.select(md5($"text").as("h")), Seq("h"), "left_anti")
        .select($"doc_id").as[Long].collect().toSet
      assert(got.toSet == expect,
        s"streamed new-rows must equal the batch anti-join (got ${got.size}, want ${expect.size})")
      assert(expect.nonEmpty, "fixture must exercise the new path")
      // maintenance: the appended batch is fully seen on a future check
      assert(Dedup.corpusNew(spark, "ingest_hash_corpus", hashedOdds).count() == 0,
        "an appended batch must be fully seen afterwards")
      // replay-exactness: excluding the batch's own src reproduces the
      // first attempt bit-for-bit, even though the corpus now holds it
      val seenMinus = spark.table("ingest_hash_corpus").filter($"src" =!= 0L)
      val replay = hashedOdds.join(seenMinus, Seq("h"), "left_anti")
        .select($"doc_id").as[Long].collect().toSet
      assert(replay == expect, "src-filtered judgment must reproduce the original batch output")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ingest_hash_corpus")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    }
  }

  test("streaming vector ingest: pruned top-k before append, replay-safe after") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Similarity
    import graft.sources.Tables
    spark.sql("DROP TABLE IF EXISTS ingest_vec_index")
    val ckptRoot = "/tmp/graft-ingest-vec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    try {
      val emb = Tables.embeddings(spark, sfDir)
      val evens = emb.filter(pmod($"vec_id", lit(2)) === 0)
      val odds = emb.filter(pmod($"vec_id", lit(2)) === 1)
      Similarity.writeVectorIndex(evens, "ingest_vec_index")
      // the batch twin, computed BEFORE any append touches the index
      val expect = Similarity.batchTopK(spark, "ingest_vec_index", odds, 3)
        .collect().map(_.toSeq).toSet
      assert(expect.nonEmpty, "fixture must retrieve corpus-side neighbors")
      val stream = spark.readStream.schema(emb.schema)
        .option("basePath", sfDir).parquet(s"$sfDir/embeddings*.parquet")
        .filter(pmod($"vec_id", lit(2)) === 1)
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      val q = Similarity.ingestVectorStream(spark, "ingest_vec_index", stream,
          (topk, _) => got.synchronized { got ++= topk.collect().map(_.toSeq) })
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$ckptRoot/ckpt")
        .start()
      try q.awaitTermination(120000) finally q.stop()
      assert(got.toSet == expect,
        s"streamed top-k (${got.size} rows) must equal the batch twin (${expect.size} rows)")
      // maintenance: the appended batch IS corpus now — an odd probe
      // retrieves itself at rank 1, cosine ~1
      val probe = odds.limit(1)
      val probeId = probe.select($"vec_id").as[Long].head
      val self = Similarity.indexedTopK(spark, "ingest_vec_index",
        probe.select($"vec_id".as("qid"), $"embedding".as("qe"),
          Similarity.bucket($"embedding").as("cell")), 1).collect()
      assert(self.length == 1 && self.head.getAs[Long]("nid") == probeId
        && math.abs(self.head.getAs[Double]("cosine") - 1.0) < 1e-9,
        s"appended vector must be retrievable as corpus (got ${self.toSeq})")
      // replay safety is STRUCTURAL: re-running the batch computation
      // against a polluted index reproduces the first attempt exactly.
      // Self-exclusion already erases the batch's own (possibly
      // duplicated) rows; duplicating the EVEN side is the hard case —
      // those duplicates are real candidates, and without candidate
      // dedup each would fill two top-k slots and displace a neighbor.
      Similarity.appendVectorIndex(spark, "ingest_vec_index", evens)
      val replay = Similarity.batchTopK(spark, "ingest_vec_index", odds, 3)
        .collect().map(_.toSeq).toSet
      assert(replay == expect,
        "batch top-k against the duplicate-polluted index must reproduce the first attempt")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ingest_vec_index")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckptRoot))
    }
  }

  test("ev16 precondition: events.value is never NULL (segment-form row-identity)") {
    import org.apache.spark.sql.functions.col
    // The ev16 segment rewrite (one lead() window + explode(sequence))
    // is row-identical to the windowed/calendar oracle form iff every
    // observed (user, hour) group is a real anchor — avg(value) never
    // NULL. A group exists only with >= 1 row, so the precondition
    // reduces to: `value` has no NULL rows. Pinned here (r17 verdict
    // item 7 / ADVICE): a future testdata generation that introduces
    // NULL values must either restore the windowed form or teach the
    // segment form to skip NULL anchors — this spec is the tripwire.
    val nulls = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNull).count()
    assert(nulls == 0, s"events.value has $nulls NULL row(s) — ev16's " +
      "segment form requires non-NULL anchors (see EventStream.ev16Interpolate)")
  }

  test("ev11 interval overlap join is a banded equi-join, never a theta join") {
    // the whole point of the hour-bucket expansion: candidates must meet
    // on an EQUI key (hash/sort-merge join), not via the quadratic
    // BroadcastNestedLoopJoin a raw `a.start <= b.end AND ...` would plan
    val plan = SparkEntry.queries("ev11_session_overlap")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join fell back to a nested loop:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"),
      s"overlap join fell back to a cartesian product:\n${plan.take(2000)}")
  }
}
