package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JoinPlanner

/** q179's physical loop closure (VERDICT r10 item 1's "done" bar):
  * the planner's decisions are not a report — applying one via
  * [[JoinPlanner.plannedJoin]] provably CHANGES the executed plan, and
  * the salted variant is driven by the COMPUTED factor, not a
  * constant. autoBroadcastJoinThreshold is forced to -1 throughout so
  * any BroadcastHashJoin in a plan is OUR decision, never Spark's own
  * size estimate.
  */
class JoinPlannerSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private lazy val decisions = JoinPlanner.decisions(spark, dir)

  private def nodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case other => Seq(other)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  private def withNoAutoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("sf0.001 decision table covers all three strategies") {
    // the catalog is designed so every branch fires even at the
    // smallest fixture: dims broadcast, the l_orderkey self-join
    // salts (TPC-H order sizes 1..7 => skew ~3), l_partkey shuffles
    assert(decisions("li_supplier")._1 == "broadcast")
    assert(decisions("li_self_orderkey")._1 == "salt")
    assert(decisions("li_self_partkey")._1 == "shuffle")
    // the computed salt factor is ceil(measured skew), not a constant
    assert(decisions("li_self_orderkey")._3 >= 2L)
  }

  test("broadcast decision flips the plan from merge join to broadcast join") {
    withNoAutoBroadcast {
      val li = Engine.table(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"))
      val sup = Engine.table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      val (strategy, build, factor) = decisions("li_supplier")
      val planned = JoinPlanner.plannedJoin(li, sup, "l_suppkey", "s_suppkey",
        strategy, build, factor, Nil)
      assert(nodes(planned).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "planner's broadcast decision must produce a BroadcastHashJoin")
      // the UNplanned join under the same conf does NOT broadcast —
      // the decision, not the session, changed the plan
      val unplanned = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      assert(!nodes(unplanned).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "baseline should not broadcast with autoBroadcastJoinThreshold=-1")
      assert(planned.count() == unplanned.count())
    }
  }

  test("salt decision drives the fan-out with the computed factor") {
    withNoAutoBroadcast {
      val (strategy, build, factor) = decisions("li_self_orderkey")
      assert(strategy == "salt" && build == "right")
      val li = Engine.table(spark, dir, "lineitem")
      val left = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val right = li.select(col("l_orderkey").as("r_orderkey"),
        col("l_quantity").as("r_quantity"))
      val planned = JoinPlanner.plannedJoin(left, right,
        "l_orderkey", "r_orderkey", strategy, build, factor,
        Seq("l_orderkey", "l_linenumber", "l_partkey"))
      // the computed factor appears in the probe side's salt
      // expression (the replicated side's sequence literal constant-
      // folds to an opaque array, so the pmod modulus is the readable
      // witness) — the q118 constant-factor era closed (VERDICT r10
      // item 1)
      val p = planned.queryExecution.executedPlan.toString
      assert(s"pmod\\(hash\\([^)]*\\), $factor\\)".r.findFirstIn(p).nonEmpty,
        s"salt fan-out must be the computed factor $factor:\n$p")
      // salting is layout-only: same result as the plain join
      val plain = left.join(right, col("l_orderkey") === col("r_orderkey"))
      assert(planned.count() == plain.count())
    }
  }

  test("shuffle decision keeps a shuffle-side merge join, no broadcast") {
    withNoAutoBroadcast {
      val (strategy, build, factor) = decisions("li_self_partkey")
      assert(strategy == "shuffle")
      val li = Engine.table(spark, dir, "lineitem")
      val left = li.select(col("l_partkey"), col("l_orderkey"))
        .limit(500) // bound the fixture self-join blow-up; plan shape only
      val right = li.select(col("l_partkey").as("r_partkey")).limit(500)
      val planned = JoinPlanner.plannedJoin(left, right,
        "l_partkey", "r_partkey", strategy, build, factor, Nil)
      val ns = nodes(planned)
      assert(ns.exists(_.isInstanceOf[SortMergeJoinExec]),
        "shuffle decision must plan a SortMergeJoin")
      assert(!ns.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    }
  }

  test("TableWidths recipes mirror the actual fixture schemas") {
    import org.apache.spark.sql.types._
    JoinPlanner.TableWidths.foreach { case (tbl, (fixed, strs)) =>
      val schema = Engine.table(spark, dir, tbl).schema
      val (strFields, primFields) =
        schema.fields.partition(_.dataType == StringType)
      assert(strFields.map(_.name).toSet == strs.toSet,
        s"$tbl: string columns drifted")
      val primSum = primFields.map(_.dataType match {
        case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
        case IntegerType | DateType => 4L
        case other => fail(s"$tbl: unhandled type $other")
      }).sum
      assert(primSum == fixed, s"$tbl: fixed width $primSum != recipe $fixed")
    }
  }

  test("sketch-stats mode: never under-salts, broadcasts agree, q180 value-identical") {
    // the production stats denomination (VERDICT r12 item 3): CMS
    // upper-bound max_cnt + KMV NDV replace the exact per-key pass.
    // One-sided bound ⇒ exact-salt joins must still salt; bytes are
    // exact in both modes ⇒ the broadcast set is identical; and since
    // every strategy is answer-invariant, q180 rows match exactly.
    val exact = JoinPlanner.decisions(spark, dir)
    val q180Exact = SparkEntry.queries("q180_planned_star")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    spark.conf.set(JoinPlanner.SketchStatsKey, "true")
    try {
      val sketch = JoinPlanner.decisions(spark, dir)
      assert(sketch.keySet == exact.keySet)
      exact.foreach { case (name, (strategy, build, _)) =>
        val (s2, b2, _) = sketch(name)
        if (strategy == "broadcast")
          assert(s2 == "broadcast" && b2 == build,
            s"$name: broadcast decisions are byte-based and bytes are exact")
        if (strategy == "salt")
          assert(s2 == "salt", s"$name: the one-sided CMS bound must never under-salt")
      }
      // the sketch mode still produces a multi-strategy matrix here
      assert(sketch.values.map(_._1).toSet.contains("broadcast"))
      val q180Sketch = SparkEntry.queries("q180_planned_star")(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(q180Sketch.nonEmpty && q180Sketch == q180Exact)
    } finally spark.conf.unset(JoinPlanner.SketchStatsKey)
  }

  test("broadcast build side is chosen by BYTES, not rows (narrow-many vs wide-few)") {
    import spark.implicits._
    // the ADVICE r12 failure shape: the smaller-BY-ROWS side is the
    // larger-BY-BYTES side (wide-few-rows dim vs narrow-many-rows
    // fact). Broadcasting by rows would ship the bigger payload — the
    // exact failure autoBroadcastJoinThreshold exists to prevent.
    val stats = Seq(
      ("narrow_many", "k", 10000L, 100000L, 10000.0, 1.0),
      ("wide_few", "k", 100L, 200000L, 100.0, 1.0))
      .toDF("rel", "key_col", "n_rows", "n_bytes", "ndv", "skew_raw")
    val joins = Seq(("bj", "narrow_many", "k", "wide_few", "k"))
      .toDF("join_name", "left_rel", "left_key", "right_rel", "right_key")
    val d = JoinPlanner.decide(stats, joins).collect().head
    assert(d.getAs[String]("strategy") == "broadcast")
    assert(d.getAs[String]("build_side") == "left",
      s"must broadcast the smaller-by-bytes (left) side, got $d")
    // non-broadcast strategies still pick the build side by rows (the
    // probe = larger merge side, consistent with the skew probe)
    val stats2 = Seq(
      ("narrow_many2", "k", 10000L, 400000L, 10000.0, 1.0),
      ("wide_few2", "k", 100L, 800000L, 100.0, 1.0))
      .toDF("rel", "key_col", "n_rows", "n_bytes", "ndv", "skew_raw")
    val joins2 = Seq(("sj", "narrow_many2", "k", "wide_few2", "k"))
      .toDF("join_name", "left_rel", "left_key", "right_rel", "right_key")
    val d2 = JoinPlanner.decide(stats2, joins2).collect().head
    assert(d2.getAs[String]("strategy") == "shuffle")
    assert(d2.getAs[String]("build_side") == "right")
  }

  test("salt factor is capped at the parallelism budget on a synthetic hot key") {
    import spark.implicits._
    // a skew-150 power-law key the fixtures don't contain: uncapped,
    // ceil(skew) would prescribe a 150-fold build-side explode
    val stats = Seq(
      ("hot_fact", "k", 10000000L, 10000000000L, 5000000.0, 150.0),
      ("dim_big", "k", 9000000L, 9000000000L, 9000000.0, 1.5))
      .toDF("rel", "key_col", "n_rows", "n_bytes", "ndv", "skew_raw")
    val joins = Seq(("hot_join", "hot_fact", "k", "dim_big", "k"))
      .toDF("join_name", "left_rel", "left_key", "right_rel", "right_key")
    val d = JoinPlanner.decide(stats, joins).collect().head
    assert(d.getAs[String]("strategy") == "salt")
    val cap = JoinPlanner.saltFactorCap(spark)
    assert(cap == 32L, "Engine sessions pin 32 shuffle partitions")
    assert(d.getAs[Long]("salt_factor") == cap,
      s"factor must cap at $cap, got $d")
    // applying the capped factor to an actual hot-key frame is still
    // layout-only: same rows as the plain join
    val left = (1 to 3000).map(i => (1L, i)) ++ (1 to 50).map(i => (i.toLong + 1, i))
    val l = left.toDF("k", "payload")
    val r = (1L to 10L).map(k => (k, s"d$k")).toDF("rk", "name")
    val planned = JoinPlanner.plannedJoin(l, r, "k", "rk",
      "salt", "right", JoinPlanner.saltFactorCap(spark), Seq("k", "payload"))
    val plain = l.join(r, col("k") === col("rk"))
    assert(planned.count() == plain.count())
  }

  test("build-side=left salt path normalizes column order (events_orders sf0.01)") {
    withNoAutoBroadcast {
      val sf01 = "/root/testdata/sf0.01"
      val d01 = JoinPlanner.decisions(spark, sf01)
      val (strategy, build, factor) = d01("events_orders")
      // the catalog's one build=='left' salt at a gate SF (ADVICE r11:
      // only build=='right' was exercised)
      assert(strategy == "salt" && build == "left", s"$d01")
      val ev = Engine.table(spark, sf01, "events")
        .select(col("event_id"), col("user_id"))
      val ord = Engine.table(spark, sf01, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val planned = JoinPlanner.plannedJoin(ev, ord, "user_id", "o_custkey",
        strategy, build, factor, Seq("o_orderkey", "o_custkey"))
      // output schema is left++right regardless of which side salts —
      // positional consumers see ONE schema across planner decisions
      assert(planned.columns.toSeq ==
        Seq("event_id", "user_id", "o_orderkey", "o_custkey"))
      val plain = ev.join(ord, col("user_id") === col("o_custkey"))
      assert(planned.count() == plain.count())
    }
  }

  test("q180 planned star executes the decision table's physical strategies") {
    withNoAutoBroadcast {
      // sf0.001: all three scaling joins decide broadcast → with
      // Spark's own size-estimate broadcasting disabled, every
      // BroadcastHashJoin in the plan is a planner decision (3) or a
      // fixed-dim hint (nation, region = 2); a merge join anywhere
      // would mean a decision was dropped on the floor
      assert(Seq("li_orders", "li_supplier", "orders_customer")
        .forall(k => decisions(k)._1 == "broadcast"), s"$decisions")
      val ns = nodes(graft.operators.Relational.q180PlannedStar(spark, dir))
      assert(ns.count(_.isInstanceOf[BroadcastHashJoinExec]) == 5,
        s"expected 5 broadcast joins, got ${ns.count(_.isInstanceOf[BroadcastHashJoinExec])}")
      assert(!ns.exists(_.isInstanceOf[SortMergeJoinExec]))
      // sf0.01: li_orders decides salt — the executed plan carries the
      // COMPUTED salt fan-out (not a constant), inside a real query
      val sf01 = "/root/testdata/sf0.01"
      val d01 = JoinPlanner.decisions(spark, sf01)
      val (st, _, factor) = d01("li_orders")
      assert(st == "salt")
      val p01 = graft.operators.Relational.q180PlannedStar(spark, sf01)
        .queryExecution.executedPlan.toString
      assert(s"pmod\\(hash\\([^)]*\\), $factor\\)".r.findFirstIn(p01).nonEmpty,
        s"salted li_orders fan-out $factor missing from q180 plan")
    }
  }

  test("q181 sketch analyze: the CMS bound is one-sided and never under-salts") {
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val rows = JoinPlanner.q181SketchAnalyze(spark, d).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        // min-over-rows of max-bucket is a true upper bound on max_cnt
        assert(r.getAs[Long]("onesided_ok") == 1L,
          s"$d: upper bound violated at $r")
        // hence the sketch path may over-salt but can never MISS a salt
        assert(!(r.getAs[Long]("salt_exact") == 1L &&
          r.getAs[Long]("salt_est") == 0L), s"$d: under-salted at $r")
      }
    }
  }

  test("decisions and estimates scale-shift coherently across SFs") {
    // at sf0.01 orders outgrows the broadcast budget and li_orders
    // flips broadcast -> salt with a LARGER factor than sf0.001's
    // l_orderkey skew would give — the planner follows the data, not
    // the catalog. (Values pinned loosely; the oracle pins them hard.)
    val d01 = JoinPlanner.decisions(spark, "/root/testdata/sf0.01")
    assert(d01("li_orders")._1 == "salt")
    assert(d01("li_orders")._3 >= decisions("li_self_orderkey")._3)
    assert(d01("cust_nation")._1 == "broadcast")
  }
}
