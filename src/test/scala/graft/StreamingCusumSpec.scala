package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsOps

/** Streaming twin of the q174 CUSUM ingest monitor — the statistic is
  * BORN streaming (a crawl monitor watches arrival volume
  * continuously), so its state-maintenance shape matters: each
  * micro-batch appends its per-day partial counts as one segment
  * (the LSM discipline of the q160/q145 twins — appends, never
  * rewrites), a reader sums segments per day, and the CUSUM path is
  * recomputed over that span-bounded daily table.
  *
  * Asserted after EVERY micro-batch: the CUSUM path from the
  * stream-maintained state equals the path recomputed from scratch
  * over all events fed so far — the monitor never drifts from its
  * definition, including mid-shift where the running mean itself is
  * still moving. After the final batch the level shift must be
  * alarmed (same corpus shape as StatsOpsSpec's batch test).
  */
object StreamingCusumSpec {
  /** Top-level so the Encoder doesn't capture the suite instance. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp)
}

class StreamingCusumSpec extends AnyFunSuite {
  import StreamingCusumSpec.Ev

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def dailyOf(df: DataFrame): DataFrame =
    df.select(to_date(col("ts")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))

  test("stream-maintained daily state reproduces the from-scratch CUSUM at every batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 20 days x 100, then 10 days x 200 — arriving in day order, the
    // shift entirely inside the last batch
    val evs = for {
      d <- 0 until 30
      i <- 0 until (if (d < 20) 100 else 200)
    } yield Ev(d.toLong * 1000 + i,
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"))
    val batches = Seq(evs.filter(_.event_id < 10000),
      evs.filter(e => e.event_id >= 10000 && e.event_id < 20000),
      evs.filter(_.event_id >= 20000))
    assert(batches.map(_.size) == Seq(10 * 100, 10 * 100, 10 * 200))

    val stateDir =
      java.nio.file.Files.createTempDirectory("cusum_state").toString
    var first = true
    val ms = MemoryStream[Ev]
    val query = ms.toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dailyOf(batch).write
          .mode(if (first) "overwrite" else "append")
          .parquet(s"$stateDir/daily")
        first = false
        ()
      }
      .start()
    try {
      var fed = Seq.empty[Ev]
      batches.foreach { b =>
        ms.addData(b)
        query.processAllAvailable()
        fed = fed ++ b
        val fromState = StatsOps.cusumOf(
          spark.read.parquet(s"$stateDir/daily")
            .groupBy(col("day")).agg(sum(col("x")).cast("long").as("x")))
          .collect().map(_.toString).toSeq
        val fromScratch = StatsOps.cusumOf(dailyOf(fed.toDF()))
          .collect().map(_.toString).toSeq
        assert(fromState == fromScratch && fromState.nonEmpty,
          s"monitor state drifted after ${fed.size} events")
      }
      // append-only state: one stored partial per (batch, day) — days
      // are batch-disjoint here, so 30 partials over 30 distinct days
      val state = spark.read.parquet(s"$stateDir/daily")
      assert(state.count() == 30 &&
        state.select(col("day")).distinct().count() == 30)
      // …and the shift is alarmed in the final state
      val finalPath = StatsOps.cusumOf(
        spark.read.parquet(s"$stateDir/daily")
          .groupBy(col("day")).agg(sum(col("x")).cast("long").as("x")))
        .collect()
      val alarms = finalPath.filter(_.getLong(4) == 1L)
        .map(_.getDate(0).toString).sorted.toSeq
      assert(alarms.nonEmpty && alarms.forall(_ >= "2024-01-21"), alarms)
    } finally query.stop()
  }
}
