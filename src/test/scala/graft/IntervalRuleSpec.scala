package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.plans.BucketIntervalJoin

/** The BucketIntervalJoin optimizer rule (plan-structure rewrite).
  *
  * Proof layers:
  *   1. the rewrite itself — rewritten plan computes exactly the plain
  *      join's rows, on fixtures and on boundary frames (and q184 runs
  *      the rewrite through the DuckDB gate);
  *   2. plan shape — the rewritten join's keys include the reserved
  *      __graft_bucket columns, an Explode generator appears on the
  *      replicated side, and the output schema is unchanged;
  *   3. guards — disabled-by-default (conf off ⇒ optimized plan
  *      untouched), conf-gated firing through the injected-rule path,
  *      idempotence under re-application, and non-matching shapes
  *      (strict bounds, month intervals) left alone.
  */
class IntervalRuleSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, u, t, ty, v) => (id, u, ts(t), ty, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  private def plainJoin(e: DataFrame): DataFrame =
    graft.streaming.EventStreams.clickPurchaseJoin(e, e)

  private def rewriteOf(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      BucketIntervalJoin.rewrite(df.queryExecution.optimizedPlan))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.orderBy(col("click_id"), col("purchase_id")).collect().map(_.toString).toSeq

  test("rewritten fixture join == plain join, schema unchanged") {
    val e = Engine.table(spark, dir, "events")
    val plain = plainJoin(e)
    val rew = rewriteOf(plain)
    assert(rew.schema == plain.schema, "rewrite changed the output schema")
    assert(sortedRows(rew) == sortedRows(plain))
  }

  test("rewritten plan carries the bucket keys and the explode generator") {
    val e = Engine.table(spark, dir, "events")
    val plan = BucketIntervalJoin.rewrite(
      plainJoin(e).queryExecution.optimizedPlan)
    val txt = plan.treeString
    assert(txt.contains(s"${BucketIntervalJoin.BucketPrefix}_c"))
    assert(txt.contains(s"${BucketIntervalJoin.BucketPrefix}_p"))
    assert(txt.contains("Generate explode"), s"no explode generator in:\n$txt")
  }

  test("rewrite preserves boundary semantics (inclusive ends, cross-bucket match)") {
    val e = events(
      (1L, "u1", "2024-03-05 12:00:00", "click", 0.0),
      (2L, "u1", "2024-03-05 13:10:00", "click", 0.0),
      (10L, "u1", "2024-03-05 12:00:00", "purchase", 1.0), // == click1: in
      (11L, "u1", "2024-03-05 11:00:00", "purchase", 2.0), // == click1 - 1h: in
      (12L, "u1", "2024-03-05 10:59:59", "purchase", 3.0), // out
      (13L, "u1", "2024-03-05 12:50:00", "purchase", 4.0)) // prior bucket of click2: in
    val plain = plainJoin(e)
    assert(sortedRows(rewriteOf(plain)) == sortedRows(plain))
    assert(plain.count() == 3) // (1,10) (1,11) (2,13); 12:00 is 70 min before 13:10 -> out
  }

  private def leftOuterJoin(e: DataFrame): DataFrame = {
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
  }

  test("left-outer rewrites when the preserved side is the anchor; unmatched rows survive once") {
    val e = events(
      (1L, "u1", "2024-03-05 12:00:00", "click", 0.0),   // matched
      (2L, "u1", "2024-03-05 20:00:00", "click", 0.0),   // UNMATCHED (no purchase near)
      (3L, "u2", "2024-03-05 12:00:00", "click", 0.0),   // UNMATCHED (user has none)
      (10L, "u1", "2024-03-05 11:30:00", "purchase", 1.0),
      (11L, "u1", "2024-03-05 23:00:00", "purchase", 2.0)) // outside both windows
    val plain = leftOuterJoin(e)
    val rew = rewriteOf(plain)
    // the rewrite FIRED (left-outer is no longer the skewed fallback)
    val txt = BucketIntervalJoin.rewrite(plain.queryExecution.optimizedPlan).treeString
    assert(txt.contains(BucketIntervalJoin.BucketPrefix),
      s"left-outer anchor-preserving shape must rewrite:\n$txt")
    assert(rew.schema == plain.schema)
    assert(sortedRows(rew) == sortedRows(plain))
    // and the unmatched clicks appear exactly once, null-extended
    assert(plain.count() == 3)
    assert(plain.filter(col("purchase_id").isNull).count() == 2)
    // fixture-scale equivalence too
    val ef = Engine.table(spark, dir, "events")
    assert(sortedRows(rewriteOf(leftOuterJoin(ef))) == sortedRows(leftOuterJoin(ef)))
  }

  test("outer joins re-anchor onto the preserved side; sub-second preserved anchoring refuses") {
    // the bounds written "backwards" (click bounded in the purchase's
    // window) still rewrite as LEFT outer: every two-sided window
    // reads in both anchorings, and the rule picks the one whose
    // anchor is the preserved click side
    val e = Engine.table(spark, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val flipped = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
    val fPlan = BucketIntervalJoin.rewrite(flipped.queryExecution.optimizedPlan)
    assert(fPlan.treeString.contains(BucketIntervalJoin.BucketPrefix),
      "re-anchorable left outer must rewrite")
    // the chosen anchor is the PRESERVED side: no explode above clicks
    val fRows = org.apache.spark.sql.graft.Bridge.ofRows(spark, fPlan)
      .collect().map(_.toString).sorted.toSeq
    assert(fRows == flipped.collect().map(_.toString).sorted.toSeq)
    assert(fRows.nonEmpty)
    // RIGHT outer of the same shape anchors on purchases and rewrites too
    val rightOuter = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "right_outer")
    val roPlan = BucketIntervalJoin.rewrite(rightOuter.queryExecution.optimizedPlan)
    assert(roPlan.treeString.contains(BucketIntervalJoin.BucketPrefix))
    assert(org.apache.spark.sql.graft.Bridge.ofRows(spark, roPlan)
      .collect().map(_.toString).sorted.toSeq ==
      rightOuter.collect().map(_.toString).sorted.toSeq)
    // the GENUINE refusal: a sub-second bound that survives re-reading
    // only in the anchoring the outer type cannot use. click ∈
    // [p − 1h, p + 0.5s] re-anchors to purchase ∈ [click − 0.5s, ...]
    // — a sub-second LOWER offset on the preserved-click anchoring —
    // so LEFT outer refuses, while INNER (free to anchor on the
    // purchase side) still rewrites.
    val subSecond = (jt: String) => clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") + expr("INTERVAL 0.5 SECOND") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"), jt)
    val loBefore = subSecond("left_outer").queryExecution.optimizedPlan
    assert(BucketIntervalJoin.rewrite(loBefore).treeString == loBefore.treeString,
      "sub-second preserved-side anchoring must refuse under left outer")
    val inBefore = subSecond("inner").queryExecution.optimizedPlan
    assert(BucketIntervalJoin.rewrite(inBefore).treeString
      .contains(BucketIntervalJoin.BucketPrefix),
      "the same window under INNER may anchor on the purchase side")
  }

  private def fullOuterJoin(e: DataFrame): DataFrame = {
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
      "full_outer")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
  }

  test("full outer decomposes into bucketed left-outer ∪ anti-recovered right tail; rows identical") {
    val e = events(
      (1L, "u1", "2024-03-05 12:00:00", "click", 0.0),   // matched with 10
      (2L, "u1", "2024-03-05 20:00:00", "click", 0.0),   // UNMATCHED click
      (3L, "u2", "2024-03-05 12:00:00", "click", 0.0),   // UNMATCHED click
      (10L, "u1", "2024-03-05 11:30:00", "purchase", 1.0),
      (11L, "u1", "2024-03-05 23:00:00", "purchase", 2.0), // UNMATCHED purchase
      (12L, "u3", "2024-03-05 12:00:00", "purchase", 3.0)) // UNMATCHED purchase
    val plain = fullOuterJoin(e)
    val rewrittenPlan = BucketIntervalJoin.rewrite(
      plain.queryExecution.optimizedPlan)
    // shape: the two-part decomposition — bucket keys present AND a
    // Union root stitching the left-outer part to the anti tail
    assert(rewrittenPlan.treeString.contains(BucketIntervalJoin.BucketPrefix),
      s"full outer must rewrite:\n${rewrittenPlan.treeString}")
    assert(rewrittenPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Union]),
      "full outer must decompose through a Union")
    val rew = org.apache.spark.sql.graft.Bridge.ofRows(spark, rewrittenPlan)
    assert(rew.schema.fieldNames.toSeq == plain.schema.fieldNames.toSeq)
    def all(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(all(rew) == all(plain))
    // both unmatched tails surface exactly once each
    assert(plain.count() == 5)
    assert(plain.filter(col("purchase_id").isNull).count() == 2)
    assert(plain.filter(col("click_id").isNull).count() == 2)
    // fixture-scale equivalence
    val ef = Engine.table(spark, dir, "events")
    assert(all(rewriteOf(fullOuterJoin(ef))) == all(fullOuterJoin(ef)))
  }

  test("full outer refuses whole when one anchoring needs a sub-second lower offset") {
    val e = events(
      (1L, "u1", "2024-03-05 12:00:00", "click", 0.0),
      (10L, "u1", "2024-03-05 11:30:00", "purchase", 1.0))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    // purchase_ts ∈ [click − 1h, click − 0.5s]: the click-anchored
    // reading still buckets (sub-second UPPER bounds ceil up), so the
    // LEFT-OUTER half could rewrite — but the anti half needs the
    // purchase-anchored reading, whose LOWER offset is +0.5s
    // (sub-second ⇒ unbucketable). The decomposition is all-or-
    // nothing: the FULL OUTER stays untouched rather than splitting
    // its semantics across strategies
    val j = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") - expr("INTERVAL 0.5 SECONDS") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
      "full_outer")
    val out = BucketIntervalJoin.rewrite(j.queryExecution.optimizedPlan)
    assert(!out.treeString.contains(BucketIntervalJoin.BucketPrefix),
      "a sub-second-offset full outer must refuse the rewrite")
  }

  test("idempotent: re-applying the rewrite adds no second bucketing layer") {
    val e = Engine.table(spark, dir, "events")
    val once = BucketIntervalJoin.rewrite(
      plainJoin(e).queryExecution.optimizedPlan)
    val twice = BucketIntervalJoin.rewrite(once)
    assert(once.treeString == twice.treeString)
  }

  test("forward strict-bound windows (q09's shape) rewrite and agree with the plain join") {
    val e = Engine.table(spark, dir, "events")
    val e1 = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val e2 = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val strict = e1.join(e2,
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 60 SECONDS"))
    val rew = org.apache.spark.sql.graft.Bridge.ofRows(spark,
      BucketIntervalJoin.rewrite(strict.queryExecution.optimizedPlan))
    assert(rew.queryExecution.optimizedPlan.treeString
      .contains(BucketIntervalJoin.BucketPrefix), "forward window did not rewrite")
    def rows(df: DataFrame): Seq[String] =
      df.orderBy(col("a_id"), col("b_id")).collect().map(_.toString).toSeq
    assert(rows(rew) == rows(strict) && strict.count() > 0)
  }

  test("shifted sub-second upper bounds still rewrite; sub-second LOWER offsets do not") {
    val e = events(
      (1L, "u1", "2024-03-05 12:00:00", "click", 0.0),
      (10L, "u1", "2024-03-05 11:59:30", "purchase", 1.0))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    // upper offset +0.5s (sub-second): allowed — only the LOWER edge
    // must sit on a whole second for the epoch-floored bucket math
    val subUpper = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 0.5 SECONDS") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 MINUTE"))
    val optU = subUpper.queryExecution.optimizedPlan
    val rewU = BucketIntervalJoin.rewrite(optU)
    assert(rewU.treeString.contains(BucketIntervalJoin.BucketPrefix))
    assert(org.apache.spark.sql.graft.Bridge.ofRows(spark, rewU).count() == subUpper.count())
    // a one-sided sub-second LOWER edge still rewrites: the dual
    // reading flips the window onto the other attribute, where the
    // lower edge is whole-second (p >= c - 0.5s  ==  c <= p + 0.5s)
    val subLower = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 0.5 SECONDS"))
    val optL = subLower.queryExecution.optimizedPlan
    val rewL = BucketIntervalJoin.rewrite(optL)
    assert(rewL.treeString.contains(BucketIntervalJoin.BucketPrefix))
    assert(org.apache.spark.sql.graft.Bridge.ofRows(spark, rewL).count() == subLower.count())
    // BOTH edges sub-second: refused in either orientation (a floored
    // epoch can miss a fractional window start)
    val bothSub = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 0.5 SECONDS") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 0.5 SECONDS"))
    val optB = bothSub.queryExecution.optimizedPlan
    assert(BucketIntervalJoin.rewrite(optB).treeString == optB.treeString)
  }

  test("month intervals are NOT rewritten (variable bucket width)") {
    val e = Engine.table(spark, dir, "events")
    // rebuild the same shape with a 1 MONTH window
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    val monthly = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 MONTH"))
    val opt = monthly.queryExecution.optimizedPlan
    assert(BucketIntervalJoin.rewrite(opt).treeString == opt.treeString)
  }

  test("conf-gated: rule fires through the session optimizer only when enabled") {
    val e = Engine.table(spark, dir, "events")
    val key = BucketIntervalJoin.EnabledKey
    assert(!plainJoin(e).queryExecution.optimizedPlan.treeString
      .contains(BucketIntervalJoin.BucketPrefix), "rule fired while disabled")
    spark.conf.set(key, "true")
    try {
      val opt = plainJoin(e).queryExecution.optimizedPlan.treeString
      assert(opt.contains(s"${BucketIntervalJoin.BucketPrefix}_c"), s"rule did not fire:\n$opt")
      // and the enabled path still computes the right answer
      val enabled = sortedRows(plainJoin(e))
      spark.conf.unset(key)
      assert(enabled == sortedRows(plainJoin(e)))
    } finally spark.conf.unset(key)
  }

  test("q184 (rule-rewritten) == q63 (plain) == q183 (hand-bucketed) on the fixture") {
    val a = operators.Relational.q184IntervalRule(spark, dir).collect().toSeq
    val b = operators.Relational.q63IntervalJoin(spark, dir).collect().toSeq
    val c = operators.Relational.q183IntervalBucketed(spark, dir).collect().toSeq
    assert(a.nonEmpty && a == b && a == c)
  }
}
