package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Streaming/batch consistency oracle (SURVEY.md §5 item 5): the events
  * fixture replayed through a MemoryStream must produce the same
  * windowed aggregates as the identical transformation run in batch.
  */
class EventStreamsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def streamOf(events: Seq[Event]): MemoryStream[Event] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    ms.addData(events)
    ms
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val fixture: Seq[Event] = {
    import spark.implicits._
    EventStreams.batchEvents(spark, dir).orderBy(col("ts")).collect().toSeq
  }

  test("tumbling window: streaming == batch") {
    val ms = streamOf(fixture)
    val q = EventStreams.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("tumbling_out"))
      val batch = sortedRows(EventStreams.tumblingCounts(
        EventStreams.batchEvents(spark, dir).toDF()))
      assert(streaming == batch)
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("sliding window: streaming == batch") {
    val ms = streamOf(fixture)
    val q = EventStreams.slidingCounts(ms.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("sliding_out"))
      val batch = sortedRows(EventStreams.slidingCounts(
        EventStreams.batchEvents(spark, dir).toDF()))
      assert(streaming == batch)
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("session window: streaming == batch") {
    val ms = streamOf(fixture)
    val q = EventStreams.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("session_out"))
      val batch = sortedRows(EventStreams.sessionCounts(
        EventStreams.batchEvents(spark, dir).toDF()))
      assert(streaming == batch)
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped (append mode)") {
    import java.sql.Timestamp
    def ev(id: Long, t: String, v: Double) =
      Event(id, Timestamp.valueOf(t), user_id = 1L, event_type = "click", v, "{}")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // batch 1: three events in the 10:00 window
      ms.addData(Seq(ev(1, "2024-01-01 10:01:00", 1), ev(2, "2024-01-01 10:02:00", 1),
        ev(3, "2024-01-01 10:03:00", 1)))
      q.processAllAvailable()
      // batch 2: event at 12:00 advances the watermark to 11:50 —
      // the 10:00 window closes and is emitted
      ms.addData(Seq(ev(4, "2024-01-01 12:00:00", 1)))
      q.processAllAvailable()
      ms.addData(Seq(ev(5, "2024-01-01 12:00:01", 1))) // extra trigger to flush
      q.processAllAvailable()
      val emitted = spark.table("late_out")
        .filter(col("window_start") === "2024-01-01 10:00:00")
        .select(col("n_events")).collect()
      assert(emitted.map(_.getLong(0)).toSeq == Seq(3))
      // batch 3: LATE event for the closed 10:00 window — must be dropped
      ms.addData(Seq(ev(6, "2024-01-01 10:04:00", 99)))
      q.processAllAvailable()
      val after = spark.table("late_out")
        .filter(col("window_start") === "2024-01-01 10:00:00")
        .select(col("n_events")).collect()
      assert(after.map(_.getLong(0)).toSeq == Seq(3),
        "late event re-opened or re-emitted a closed window")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops in-watermark duplicates") {
    val base = fixture.take(20)
    val dups = base.map(e => e.copy(event_id = e.event_id + 100000)) // same (user, type)
    val ms = streamOf(base ++ dups)
    val q = EventStreams.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").count()
      val distinctKeys = base.map(e => (e.user_id, e.event_type)).distinct.size
      assert(got == distinctKeys)
    } finally q.stop()
  }

  test("file-based streaming source (readStream.parquet) == batch") {
    // nanos timestamps forbid direct streaming parquet read; replay the
    // converted events as a file stream from a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("events_stream").toString
    val batch = EventStreams.batchEvents(spark, dir).toDF()
    batch.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("file_stream_out"))
      val expected = sortedRows(EventStreams.tumblingCounts(batch))
      assert(streaming == expected && streaming.nonEmpty)
    } finally q.stop()
  }

  test("checkpoint restart: closed windows emitted exactly once across stop/restart") {
    import java.sql.Timestamp
    import spark.implicits._
    def ev(id: Long, t: String) =
      Event(id, Timestamp.valueOf(t), user_id = 1L, event_type = "click", 1.0, "{}")
    val srcDir = java.nio.file.Files.createTempDirectory("restart_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("restart_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("restart_ck").toString
    val schema = spark.emptyDataset[Event].toDF().schema
    def runToCompletion(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .transform(EventStreams.tumblingCounts)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: two events in the 10:00 window; stop before it closes
    Seq(ev(1, "2024-01-01 10:01:00"), ev(2, "2024-01-01 10:02:00"))
      .toDF().write.mode("append").parquet(srcDir)
    runToCompletion()
    // phase 2 (restart from checkpoint): 12:00 events advance the
    // watermark past the 10:00 window → it closes and emits
    Seq(ev(3, "2024-01-01 12:00:00"), ev(4, "2024-01-01 12:05:00"))
      .toDF().write.mode("append").parquet(srcDir)
    runToCompletion()
    // phase 3 (second restart): close the 12:00 window too
    Seq(ev(5, "2024-01-01 15:00:00")).toDF().write.mode("append").parquet(srcDir)
    runToCompletion()
    val out = spark.read.parquet(outDir)
      .select(col("window_start").cast("string"), col("n_events")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // exactly-once across two restart boundaries: each closed window
    // appears once, with counts spanning the pre/post-restart events
    assert(out.count(_._1 == "2024-01-01 10:00:00") == 1)
    assert(out.find(_._1 == "2024-01-01 10:00:00").get._2 == 2L)
    assert(out.count(_._1 == "2024-01-01 12:00:00") == 1)
    assert(out.find(_._1 == "2024-01-01 12:00:00").get._2 == 2L)
  }

  test("stream-stream interval join == batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(fixture)
    purchases.addData(fixture)
    val q = EventStreams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("ss_join_out"))
      val batch = EventStreams.batchEvents(spark, dir).toDF()
      val expected = sortedRows(EventStreams.clickPurchaseJoin(batch, batch))
      assert(streaming == expected && streaming.nonEmpty)
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals match batch groupBy") {
    import spark.implicits._
    val ms = streamOf(fixture)
    val q = EventStreams.runningUserTotals(ms.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // last update per user == batch aggregate
      val streaming = spark.table("state_out")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = EventStreams.batchEvents(spark, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streaming == batch)
    } finally q.stop()
  }

  test("transformWithState running totals == flatMapGroupsWithState == batch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the stateful-v2 operator requires the RocksDB state store
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // 3 micro-batches so per-user state genuinely carries across
      // batch boundaries (a single batch never reads back state)
      val batches = fixture.grouped((fixture.size + 2) / 3).toSeq
      assert(batches.size == 3)
      val ms = MemoryStream[Event]
      val q = EventStreams.runningUserTotalsV2(ms.toDS())
        .writeStream.format("memory").queryName("state_v2_out")
        .outputMode("update").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        // final state per user (max running count == the last update)
        val v2 = spark.table("state_v2_out")
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val batch = EventStreams.batchEvents(spark, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(v2 == batch && v2.nonEmpty)
      } finally q.stop()
      // and the v1 operator over the same 3-batch feed agrees (the
      // migration-equality check, not just both-match-batch)
      val ms1 = MemoryStream[Event]
      val q1 = EventStreams.runningUserTotals(ms1.toDS())
        .writeStream.format("memory").queryName("state_v1_out")
        .outputMode("update").start()
      try {
        batches.foreach { b => ms1.addData(b); q1.processAllAvailable() }
        val v1 = spark.table("state_v1_out")
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val v2 = spark.table("state_v2_out")
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(v1 == v2)
      } finally q1.stop()
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("hot-key monitor: streaming == batch, only crossing keys emitted") {
    val ms = streamOf(fixture)
    val q = EventStreams.hotKeyMonitor(ms.toDF())
      .writeStream.format("memory").queryName("hotkey_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("hotkey_out"))
      val batch = sortedRows(EventStreams.hotKeyMonitor(
        EventStreams.batchEvents(spark, dir).toDF()))
      assert(streaming == batch)
      assert(streaming.nonEmpty)
      // the thresholds actually filter: some (window, key) pairs are cold
      val all = EventStreams.batchEvents(spark, dir).toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count()
      assert(streaming.size < all)
    } finally q.stop()
  }

  test("streaming ingest gate: dedup + quality + repetition gates == batch twin") {
    import java.sql.Timestamp
    import spark.implicits._
    import graft.operators.LlmOps
    def doc(id: Long, t: String, text: String) =
      StreamDoc(id, Timestamp.valueOf(t), text, "en", text.length.toLong)
    val good = "the and of to in is that for quick brown lazy dog wolf bird fish stone"
    val docs = Seq(
      doc(1, "2024-01-01 10:00:00", good),
      doc(2, "2024-01-01 10:01:00", good), // in-watermark duplicate
      doc(3, "2024-01-01 10:02:00", "x!! y?? z,, w.. v!! u??"), // low quality
      doc(4, "2024-01-01 10:03:00", "spam spam spam spam spam spam spam spam")) // repetitive
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[StreamDoc]
    ms.addData(docs)
    val q = EventStreams.streamingIngestGate(ms.toDF())
      .writeStream.format("memory").queryName("ingest_gate_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streaming = sortedRows(spark.table("ingest_gate_out"))
      val batchDf = docs.toDF()
      val batch = sortedRows(
        LlmOps.withQualityScore(LlmOps.withRepetitionSignals(
            batchDf
              .withColumn("tok", expr(LlmOps.toksS))
              .withColumn("n_tokens", size(col("tok")).cast("long"))
              .filter(col("n_tokens") >= 3)))
          .withColumn("content_hash", md5(col("text").cast("binary")))
          .dropDuplicates("content_hash")
          .filter(col("quality") >= 0.6 && col("repetitive") === 0)
          .select(col("content_hash"), col("n_tokens"),
            round(col("quality"), 6).as("quality")))
      assert(streaming == batch)
      // exactly the good document survives, once
      assert(streaming.size == 1)
    } finally q.stop()
  }
}

/** Document arriving on a stream (ingest-gate twin input). */
case class StreamDoc(doc_id: Long, ts: java.sql.Timestamp, text: String,
    lang: String, n_chars: Long)
