package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface over the events fixture (SURVEY.md §2B
  * "Streaming"). Every transformation is written against a plain
  * DataFrame, so the identical code runs in batch (where `withWatermark`
  * is a no-op) and under a streaming source — the batch run IS the
  * correctness oracle (see EventStreamsSpec).
  *
  * Scale notes: event-time windows + watermarks bound state size (late
  * data beyond the watermark is dropped, closed windows are evicted);
  * session windows and the custom flatMapGroupsWithState state are keyed
  * by user_id, so state shards across executors with the shuffle.
  */
object EventStreams {

  /** Typed event row (ts in micros precision). */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Per-user running state for the custom stateful op. */
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling 1-hour window counts per event type, 10-min watermark.
    * The value sum rides DECIMAL (order-independent) — the state-store
    * accumulation order differs from the batch hash aggregate's, so a
    * float sum could diverge in the last bit and break the
    * streaming==batch equality this operator is verified by.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Session windows with a 30-minute gap, per user (the streaming twin
    * of Relational.q30Sessionize).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Watermarked streaming dedup on (user_id, event_type) — late
    * duplicates beyond the watermark may reappear, duplicates within it
    * are dropped (dropDuplicatesWithinWatermark semantics).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Custom stateful operator: running per-user totals via
    * flatMapGroupsWithState (Update mode) — emits the refreshed
    * aggregate on every input batch.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { e => n += 1; total += e.value }
          val next = UserAgg(userId, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** The same running-totals contract on the transformWithState
    * (stateful v2) operator — Spark 4's successor API to
    * flatMapGroupsWithState: state is DECLARED through a typed handle
    * (`getValueState` with its own encoder + per-state TTL) instead of
    * living implicitly in the function's closure type, timers replace
    * GroupStateTimeout, and the operator requires the RocksDB state
    * store (state scales to disk, not executor heap — the 100 TB
    * answer to keyed-state growth; the v1 HDFS-backed store keeps
    * every key's state in memory). EventStreamsSpec runs BOTH
    * implementations over the same micro-batched input and pins
    * v1 == v2 == batch groupBy — the migration path a production
    * pipeline takes, verified by equality.
    */
  class RunningTotalsProcessor extends StatefulProcessor[Long, Event, UserAgg] {
    @transient private var agg: ValueState[UserAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[UserAgg]("agg",
        Encoders.product[UserAgg], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserAgg] = {
      val prev = if (agg.exists()) agg.get() else UserAgg(key, 0L, 0.0)
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      val next = UserAgg(key, n, total)
      agg.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningUserTotals]] on the stateful-v2 operator. */
  def runningUserTotalsV2(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update)
  }

  /** Stream-stream INTERVAL JOIN: each click matched to the same user's
    * purchases in the preceding hour. Both sides carry watermarks, so
    * Spark derives a bounded state-retention window from the join's
    * time bounds (purchases older than watermark + 1h are evicted) —
    * the state never grows with stream length. Works identically on two
    * batch DataFrames (see the equivalence spec), which is the
    * cross-check that the streaming semantics are the relational ones.
    */
  def clickPurchaseJoin(clicksIn: DataFrame, purchasesIn: DataFrame): DataFrame = {
    val clicks = clicksIn
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = purchasesIn
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
  }

  /** Hot-key thresholds for [[hotKeyMonitor]] (defaults sit ~2.5× the
    * fixture's mean per-(hour, type) rate at sf0.001, so typical
    * buckets stay quiet and the busiest fire; production deployments
    * set these from the q100 skew report's mean_cnt).
    */
  val HotKeyMinEvents = 3L
  val HotKeyMinUsers = 3L

  /** Streaming hot-key monitor — the STREAMING twin of the q100 skew
    * report: per tumbling hour and key (event_type), the event count
    * and approximate distinct actors; emit only keys crossing either
    * threshold. The alert that fires BEFORE tomorrow's batch job
    * discovers the skew.
    *
    * One windowed aggregation (streaming forbids chained aggs, so the
    * share-of-window form is out by construction): count is map-side
    * combinable, distinct actors ride an HLL sketch
    * (approx_count_distinct — insertion-idempotent and
    * order-independent, so streaming == batch exactly; an exact
    * count(DISTINCT) is not available under incremental execution).
    * Watermark bounds state to open windows.
    */
  def hotKeyMonitor(events: DataFrame,
      minEvents: Long = HotKeyMinEvents,
      minUsers: Long = HotKeyMinUsers): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users"))
      .filter(col("n_events") >= minEvents ||
        col("n_users") >= minUsers)
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_users"))

  /** Events fixture as a typed Dataset (batch side). */
  def batchEvents(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    graft.Engine.table(s, dir, "events").as[Event]
  }

  /** Streaming twin of the q73 ingest gate, for documents arriving on
    * a stream (columns ts, doc_id, text, lang, n_chars): exact dedup by
    * content hash within the watermark (the ONLY stateful piece — state
    * is bounded by the watermark horizon, not the corpus), then the
    * same quality and repetition gates as batch, reused from LlmOps so
    * the expressions are identical kernel projections (narrow,
    * stateless, codegen'd). Emits content-derived columns only, so the
    * output is invariant to which duplicate the dedup keeps.
    */
  def streamingIngestGate(docs: DataFrame): DataFrame = {
    val base = graft.operators.LlmOps.withQualityScore(
      graft.operators.LlmOps.withRepetitionSignals(
        docs
          .withColumn("tok", expr(graft.operators.LlmOps.toksS))
          .withColumn("n_tokens", size(col("tok")).cast("long"))
          .filter(col("n_tokens") >= 3)))
      .withColumn("content_hash", md5(col("text").cast("binary")))
    base
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
      .filter(col("quality") >= 0.6 && col("repetitive") === 0)
      // content-derived columns ONLY: identical-text duplicates can
      // carry different lang/doc_id, and the dedup keeps an arbitrary
      // one — emitting a non-content column would make the output
      // depend on which duplicate survived
      .select(col("content_hash"), col("n_tokens"),
        round(col("quality"), 6).as("quality"))
  }
}
