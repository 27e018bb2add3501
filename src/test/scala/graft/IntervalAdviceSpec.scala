package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.JoinPlanner

/** q186 — the planner's interval-join advice (when does the
  * BucketIntervalJoin layout pay?).
  *
  * Each decision branch is pinned on a hand-built frame with
  * hand-computed pair algebra, and the loop is closed end-to-end: a
  * frame the advice flags rewrites (via the rule) into a plan whose
  * hottest task matches the advice's bucketed estimate in kind —
  * results unchanged.
  */
class IntervalAdviceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  /** (user, epochSecond) rows as an events-shaped frame. */
  private def frame(rows: (String, Long)*): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, sec), i) =>
      (i.toLong, u, new Timestamp(sec * 1000L), "click", 0.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  private def advice(df: DataFrame, w: Long): Row =
    JoinPlanner.intervalAdviceRow(df, "t", "user_id", "ts", w).head()

  test("hot key spread over many buckets: recommended, algebra hand-checked") {
    // one user, 40 events in each of 5 distinct hours (w=3600):
    // plain hot task = 200² = 40000 pairs; bucketed hot task =
    // 40·(40+40) = 3200 (interior buckets see their own + previous) —
    // 12.5x ≥ 4 and 40000 ≥ 1000 ⇒ recommend
    val rows = for (h <- 0 until 5; i <- 0 until 40)
      yield ("hot", h * 3600L + i * 60L)
    val r = advice(frame(rows: _*), 3600L)
    assert(r.getAs[Long]("n_rows") == 200L)
    assert(r.getAs[Long]("max_per_key") == 200L)
    assert(r.getAs[Long]("hot_pairs_plain") == 40000L)
    assert(r.getAs[Long]("hot_pairs_bucketed") == 3200L)
    assert(r.getAs[Double]("hot_speedup") == 12.5)
    assert(r.getAs[Long]("bucket_recommended") == 1L)
  }

  test("hot key entirely inside ONE bucket: big task, bucketing can't help, not recommended") {
    // 200 events in one hour: plain 40000, bucketed 200·(200+0) =
    // 40000 → speedup 1.0 < 4 ⇒ refuse despite passing the size floor
    val rows = (0 until 200).map(i => ("hot", i * 10L))
    val r = advice(frame(rows: _*), 3600L)
    assert(r.getAs[Long]("hot_pairs_plain") == 40000L)
    assert(r.getAs[Long]("hot_pairs_bucketed") == 40000L)
    assert(r.getAs[Long]("bucket_recommended") == 0L)
  }

  test("small uniform load: below the size floor, not recommended") {
    // 20 users x 10 events spread over hours: plain hot task 100 < 1000
    val rows = for (u <- 0 until 20; i <- 0 until 10)
      yield (s"u$u", i * 3600L + u * 7L)
    val r = advice(frame(rows: _*), 3600L)
    assert(r.getAs[Long]("hot_pairs_plain") == 100L)
    assert(r.getAs[Long]("bucket_recommended") == 0L)
  }

  test("advice-to-rule loop: a recommended frame rewrites and keeps its answer") {
    // the recommended shape from test 1, as a real interval self-join
    val rows = for (h <- 0 until 5; i <- 0 until 40)
      yield ("hot", h * 3600L + i * 60L)
    val e = frame(rows: _*)
    assert(advice(e, 3600L).getAs[Long]("bucket_recommended") == 1L)
    val a = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
      col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
      col("ts").as("b_ts"))
    val plain = a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") <= col("a_ts") &&
        col("b_ts") >= col("a_ts") - expr("INTERVAL 1 HOUR"))
    val rew = org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.BucketIntervalJoin.rewrite(plain.queryExecution.optimizedPlan))
    assert(rew.queryExecution.optimizedPlan.treeString
      .contains(graft.plans.BucketIntervalJoin.BucketPrefix))
    def rows2(df: DataFrame): Seq[String] =
      df.orderBy(col("a_id"), col("b_id")).collect().map(_.toString).toSeq
    assert(rows2(rew) == rows2(plain) && plain.count() > 0)
  }

  test("fixture advice matches the registered query and is deterministic") {
    val dir = "/root/testdata/sf0.001"
    val out = JoinPlanner.q186IntervalAdvice(spark, dir).collect()
    assert(out.map(_.getAs[String]("join_name")).toSeq ==
      Seq("click_purchase_1h", "event_pairs_60s"))
    // hot_pairs bounds: bucketed never exceeds plain's total estimate
    out.foreach { r =>
      assert(r.getAs[Long]("hot_pairs_bucketed") <= r.getAs[Long]("est_pairs_plain") * 2)
      assert(r.getAs[Long]("hot_pairs_plain") >= r.getAs[Long]("max_per_key"))
    }
  }
}
