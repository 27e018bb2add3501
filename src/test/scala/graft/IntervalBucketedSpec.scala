package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Relational

/** q183 — the time-bucketed interval join.
  *
  * Three layers of proof:
  *   1. equivalence — q183 must reproduce q63 (plain equi-key + range
  *      residual) row-for-row on the fixtures, and both share one
  *      DuckDB oracle in the gate;
  *   2. boundary semantics on hand-built frames — the inclusive ends of
  *      the [click_ts - 1h, click_ts] window, the cross-bucket match (a
  *      purchase in the hour-bucket BEFORE the click's), and the
  *      exclusive just-outside cases;
  *   3. the scale claim — on a hot key the (user, bucket) keying's
  *      candidate-pair count is a small fraction of user-only keying's
  *      O(m²), and the physical join stays an equi join on BOTH keys
  *      (no nested-loop fallback).
  */
class IntervalBucketedSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** events-shaped frame: (event_id, user_id, ts, event_type, value). */
  private def events(rows: (Long, String, String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, u, t, ty, v) => (id, u, ts(t), ty, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("click_id"), col("purchase_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q183 == q63 row-for-row on the fixture events") {
    val a = Relational.q183IntervalBucketed(spark, dir).collect().toSeq
    val b = Relational.q63IntervalJoin(spark, dir).collect().toSeq
    assert(a.nonEmpty, "fixture interval join returned no rows")
    assert(a == b)
  }

  test("window ends are inclusive; outside-by-a-second and later-than-click are excluded") {
    // click at 12:00:00; purchases at the exact window ends, just
    // outside, and strictly after the click
    val e = events(
      (1L, "u1", "2024-03-05 12:00:00", "click", 0.0),
      (10L, "u1", "2024-03-05 12:00:00", "purchase", 1.0), // == click_ts: in
      (11L, "u1", "2024-03-05 11:00:00", "purchase", 2.0), // == click_ts - 1h: in
      (12L, "u1", "2024-03-05 10:59:59", "purchase", 3.0), // 1h+1s before: out
      (13L, "u1", "2024-03-05 12:00:01", "purchase", 4.0), // after click: out
      (14L, "u2", "2024-03-05 11:30:00", "purchase", 5.0)) // other user: out
    assert(collectPairs(Relational.intervalBucketedJoin(e)) == Set(1L -> 10L, 1L -> 11L))
  }

  test("a purchase in the bucket BEFORE the click's still matches (the pb+1 replica)") {
    // click at 13:10 (bucket B); purchase at 12:50 (bucket B-1), 20 min
    // earlier — only reachable through the purchase's second replica
    val e = events(
      (1L, "u1", "2024-03-05 13:10:00", "click", 0.0),
      (10L, "u1", "2024-03-05 12:50:00", "purchase", 1.0))
    assert(collectPairs(Relational.intervalBucketedJoin(e)) == Set(1L -> 10L))
  }

  test("replica duplication never duplicates an output pair") {
    // click and purchase in the SAME bucket: the purchase's pb replica
    // matches and its pb+1 replica must not produce a second row
    val e = events(
      (1L, "u1", "2024-03-05 13:40:00", "click", 0.0),
      (10L, "u1", "2024-03-05 13:05:00", "purchase", 1.0))
    val out = Relational.intervalBucketedJoin(e).collect()
    assert(out.length == 1)
  }

  test("hot key: bucketing equals brute force and bounds the candidate blow-up") {
    // one user, 24 hours, a click and a purchase every 10 minutes —
    // 144 clicks x 144 purchases = 20736 user-keyed candidates
    val rows = (0 until 144).flatMap { i =>
      val t = new Timestamp(Timestamp.valueOf("2024-03-05 00:00:00").getTime + i * 600000L)
      Seq((i.toLong, "hot", t, "click", 0.0),
        (1000L + i, "hot", t, "purchase", i.toDouble))
    }
    import spark.implicits._
    val e = rows.toDF("event_id", "user_id", "ts", "event_type", "value")

    val bucketed = Relational.intervalBucketedJoin(e)
    val brute = graft.streaming.EventStreams.clickPurchaseJoin(e, e)
    assert(collectPairs(bucketed) == collectPairs(brute))

    // candidate pairs BEFORE the range filter: user-only keying
    // shuffles all m_click x m_purchase pairs into one task; the
    // (user, bucket) keying caps candidates at 2x per-hour products
    val clicks = e.filter(col("event_type") === "click").select(
      col("user_id"), col("ts").as("cts"),
      expr("cast(ts as bigint) div 3600").as("cb"))
    val purch = e.filter(col("event_type") === "purchase").select(
      col("user_id").as("pu"), expr("cast(ts as bigint) div 3600").as("pb"))
      .withColumn("jb", explode(array(col("pb"), col("pb") + 1)))
    val bucketedCand = clicks.join(purch,
      col("user_id") === col("pu") && col("cb") === col("jb")).count()
    val userOnlyCand = 144L * 144L
    // 24 buckets x (6 clicks x ~12 replicated purchases) ~ 1716 << 20736
    assert(bucketedCand < userOnlyCand / 10,
      s"bucketed candidates $bucketedCand not << $userOnlyCand")
    // and the real join's output is the correct 12-per-hour lattice
    assert(bucketedCand >= brute.count())
  }

  test("physical plan: equi join on (user, bucket), no nested-loop/cartesian fallback") {
    val plan = Relational.q183IntervalBucketed(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a non-equi plan:\n$plan")
    assert(plan.contains("bucket"), "join keys lost the bucket column")
  }
}
