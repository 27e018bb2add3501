package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.plans.Asof

/** The native as-of join (logical node → strategy → physical exec).
  *
  * Three layers of proof:
  *   1. unit semantics on hand-built frames — latest-prior-or-equal
  *     match, per-key isolation, left-outer nulls, SQL null-key/time
  *     semantics, build-tie resolution;
  *   2. equivalence — q182 (native exec) must reproduce q33 (the
  *     union + fill-forward composition) row-for-row on the fixtures,
  *     and both share one DuckDB ASOF JOIN oracle in the gate;
  *   3. plan shape — AsofJoinExec actually plans (via the injected
  *     strategy), the merge side has NO WindowExec (the q33
  *     composition's cost center), and pre-partitioned+sorted children
  *     insert no extra exchange (the 100 TB bucketed-build path).
  */
class AsofNativeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def probes(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, u, t) => (id, u, ts(t)) }.toDF("event_id", "user_id", "ts")
  }

  private def builds(rows: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, t, v) => (u, ts(t), v) }.toDF("b_user", "b_ts", "p_value")
  }

  /** The finalized physical plan as text, truncated to AQE's final plan
    * (the full toString repeats the initial plan below it, which would
    * double-count pattern matches).
    */
  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head

  test("latest prior-or-equal build wins; strictly-later never matches") {
    val p = probes((1L, "u1", "2024-01-10 00:00:00"), (2L, "u1", "2024-01-20 00:00:00"))
    val b = builds(
      ("u1", "2024-01-05 00:00:00", 5.0),
      ("u1", "2024-01-10 00:00:00", 10.0), // equal ts: inclusive
      ("u1", "2024-01-15 00:00:00", 15.0),
      ("u1", "2024-01-25 00:00:00", 25.0)) // after both probes
    val out = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
      .select("event_id", "p_value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 10.0, 2L -> 15.0))
  }

  test("left outer: probe with no prior build emits null build columns") {
    val p = probes((1L, "u1", "2024-01-01 00:00:00"), (2L, "u2", "2024-01-01 00:00:00"))
    val b = builds(("u1", "2024-02-01 00:00:00", 1.0)) // only AFTER u1's probe; u2 absent
    val out = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(out.head.fieldIndex("p_value"))))
  }

  test("keys isolate: u2's builds never leak into u1's probes") {
    val p = probes((1L, "u1", "2024-01-10 00:00:00"))
    val b = builds(("u2", "2024-01-05 00:00:00", 99.0))
    val out = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("p_value")))
  }

  test("SQL null semantics: null probe key/time and null build time never match") {
    import spark.implicits._
    val p = Seq(
      (1L, null.asInstanceOf[String], ts("2024-01-10 00:00:00")), // null key
      (2L, "u1", null.asInstanceOf[Timestamp]),                   // null time
      (3L, "u1", ts("2024-01-10 00:00:00")))                      // real
      .toDF("event_id", "user_id", "ts")
    val b = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 00:00:00"), 7.0), // null build key
      ("u1", null.asInstanceOf[Timestamp], 8.0),                   // null build time
      ("u1", ts("2024-01-05 00:00:00"), 5.0))
      .toDF("b_user", "b_ts", "p_value")
    val out = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
      .select("event_id", "p_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(1L -> None, 2L -> None, 3L -> Some(5.0)))
  }

  test("build ties on (key, time) resolve to the last row in sort order") {
    import spark.implicits._
    // two builds at the identical (key, ts): required ordering is only
    // (key, time), so ties resolve to whichever sorts last — the
    // documented reason q33/q182 dedup the build side first. Assert the
    // match is ONE of the tied values (never the earlier 1.0).
    val p = probes((1L, "u1", "2024-01-10 00:00:00"))
    val b = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1.0),
      ("u1", ts("2024-01-05 00:00:00"), 2.0),
      ("u1", ts("2024-01-05 00:00:00"), 3.0))
      .toDF("b_user", "b_ts", "p_value")
    val v = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
      .select("p_value").collect().head.getDouble(0)
    assert(v == 2.0 || v == 3.0)
  }

  test("multi-key as-of joins on the full composite key") {
    import spark.implicits._
    val p = Seq((1L, "u1", "a", ts("2024-01-10 00:00:00")))
      .toDF("event_id", "user_id", "k2", "ts")
    val b = Seq(
      ("u1", "a", ts("2024-01-05 00:00:00"), 5.0),
      ("u1", "b", ts("2024-01-09 00:00:00"), 9.0)) // later, but k2 differs
      .toDF("b_user", "b_k2", "b_ts", "p_value")
    val v = Asof.join(p, b, Seq("user_id" -> "b_user", "k2" -> "b_k2"), "ts", "b_ts")
      .select("p_value").collect().head.getDouble(0)
    assert(v == 5.0)
  }

  test("q182 (native exec) == q33 (window composition) on the fixtures") {
    val native = SparkEntry.queries("q182_asof_native")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val composed = SparkEntry.queries("q33_asof_join")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("q182 plans AsofJoinExec; the merge replaces the fill-forward window") {
    val df = SparkEntry.queries("q182_asof_native")(spark, dir)
    df.collect() // finalize AQE
    val p = finalPlan(df)
    assert(p.contains("AsofJoin "), s"no AsofJoinExec in:\n$p")
    // exactly the build-dedup window survives — q33's second (fill-
    // forward over the union) window is what the native exec removes
    assert("Window \\[".r.findAllIn(p).length <= 1, s"unexpected windows in:\n$p")
  }

  test("pre-partitioned + pre-sorted children insert no exchange above the repartition") {
    // the 100 TB path: a bucketed/sorted build table must stream into
    // the merge without EnsureRequirements adding anything. Emulate
    // bucketing with explicit repartition + sortWithinPartitions on
    // both sides and count exchanges: exactly the two we inserted.
    val p = probes((1L, "u1", "2024-01-10 00:00:00"), (2L, "u2", "2024-01-10 00:00:00"))
      .repartition(4, col("user_id")).sortWithinPartitions("user_id", "ts")
    val b = builds(("u1", "2024-01-05 00:00:00", 5.0))
      .repartition(4, col("b_user")).sortWithinPartitions("b_user", "b_ts")
    val joinedDf = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
    joinedDf.collect()
    val s = finalPlan(joinedDf)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges == 2, s"expected only the 2 explicit repartitions, got $exchanges:\n$s")
    assert(s.contains("AsofJoin "))
  }

  test("probe-side filter above Asof.join pushes below the node into the parquet scan") {
    val e = Engine.table(spark, dir, "events")
    val probe = e.select(col("event_id"), col("user_id"), col("ts"))
    val build = e.select(col("user_id").as("b_user"), col("ts").as("b_ts"),
      col("value").as("p_value"))
    // the natural composition order: filter written ABOVE the join
    val joined = Asof.join(probe, build, Seq("user_id" -> "b_user"), "ts", "b_ts")
      .filter(col("event_id") < 100L)
    // logical: AsofPushDown moved the conjunct below the node
    val aj = joined.queryExecution.optimizedPlan
      .collectFirst { case a: graft.plans.AsofJoin => a }.get
    assert(aj.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.nonEmpty, "probe-side filter did not move below AsofJoin")
    // physical: PhysicalOperation carried it into the scan's pushed filters
    joined.collect()
    val p = finalPlan(joined)
    assert(p.contains("LessThan(event_id,100)"),
      s"filter not pushed to the parquet scan:\n$p")
    // value check: filter-above == filter-below, and rows survive
    val manual = Asof.join(probe.filter(col("event_id") < 100L), build,
      Seq("user_id" -> "b_user"), "ts", "b_ts")
      .collect().map(_.toString).sorted.toSeq
    val auto = joined.collect().map(_.toString).sorted.toSeq
    assert(auto.nonEmpty && auto == manual)
  }

  test("mixed filter splits: probe conjunct pushes, build-side conjunct stays above") {
    val e = Engine.table(spark, dir, "events")
    val probe = e.select(col("event_id"), col("user_id"), col("ts"))
    val build = e.select(col("user_id").as("b_user"), col("ts").as("b_ts"),
      col("value").as("p_value"))
    val joined = Asof.join(probe, build, Seq("user_id" -> "b_user"), "ts", "b_ts")
      .filter(col("event_id") < 100L && col("p_value") > 0.0)
    val opt = joined.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case a: graft.plans.AsofJoin => a }.get
    // probe conjunct below the node...
    assert(aj.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.exists(_.condition.references.map(_.name).toSet == Set("event_id")))
    // ...build-side conjunct (does NOT commute with as-of semantics:
    // dropping build rows changes matches; null semantics differ on
    // unmatched rows) stays above it
    val above = opt.collectFirst {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(_,
        _: graft.plans.AsofJoin) => f
    }
    assert(above.exists(_.condition.references.map(_.name).toSet == Set("p_value")),
      s"build-side conjunct must remain above the join:\n$opt")
  }

  test("narrow projection above Asof.join prunes unused build columns from the scan") {
    // pins the GENERIC ColumnPruning behavior the node inherits
    // (Catalyst's catch-all case works because AsofJoin.references are
    // exactly the keys + times): projecting only probe columns must
    // drop p_value (raw column `value`) out of the build scan entirely
    val e = Engine.table(spark, dir, "events")
    val probe = e.select(col("event_id"), col("user_id"), col("ts"))
    val build = e.select(col("user_id").as("b_user"), col("ts").as("b_ts"),
      col("value").as("p_value"))
    val joined = Asof.join(probe, build, Seq("user_id" -> "b_user"), "ts", "b_ts")
      .select(col("event_id"), col("b_ts"))
    joined.collect()
    val p = finalPlan(joined)
    assert(!p.contains("value:double"),
      s"unused build column `value` still read by a scan:\n$p")
  }

  test("inner mode drops unmatched probes at emission; inner == outer+filter") {
    // unit: the unmatched probe vanishes instead of null-extending
    val p = probes((1L, "u1", "2024-01-10 00:00:00"), (2L, "u2", "2024-01-10 00:00:00"))
    val b = builds(("u1", "2024-01-05 00:00:00", 5.0)) // u2 has no build
    val inner = Asof.innerJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
    val out = inner.collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L), s"unmatched probe leaked: ${out.toSeq}")
    // null probe key/time are unmatched-by-definition: dropped too
    import spark.implicits._
    val pn = Seq((3L, null.asInstanceOf[String], ts("2024-01-10 00:00:00")),
      (4L, "u1", null.asInstanceOf[Timestamp]))
      .toDF("event_id", "user_id", "ts")
    assert(Asof.innerJoin(pn, b, Seq("user_id" -> "b_user"), "ts", "b_ts").count() == 0)
    // fixtures: inner == the outer join post-filtered, row-for-row
    val e = Engine.table(spark, dir, "events")
    val probesF = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val buildsF = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    val innerF = Asof.innerJoin(probesF, buildsF,
      Seq("user_id" -> "b_user"), "ts", "b_ts")
      .collect().map(_.toString).sorted.toSeq
    val outerFiltered = Asof.join(probesF, buildsF,
      Seq("user_id" -> "b_user"), "ts", "b_ts")
      .filter(col("p_value").isNotNull)
      .collect().map(_.toString).sorted.toSeq
    assert(innerF.nonEmpty && innerF == outerFiltered)
    // and the declared q199 equals q182 (same result, inner-mode plan)
    val q199 = SparkEntry.queries("q199_asof_inner")(spark, dir)
    q199.collect()
    assert(finalPlan(q199).contains("AsofJoin "), "q199 must plan the native exec")
    assert(q199.collect().map(_.toString).sorted.toSeq ==
      SparkEntry.queries("q182_asof_native")(spark, dir)
        .collect().map(_.toString).sorted.toSeq)
  }

  test("tolerance: stale matches drop (inner) or null-extend (outer); candidates stay live") {
    val hour = 3600L * 1000000 // micros
    // unit: u1 probe at +2h from its build (within 6h), u2 at +10h (stale)
    val p = probes((1L, "u1", "2024-01-10 02:00:00"),
      (2L, "u2", "2024-01-10 10:00:00"),
      (3L, "u2", "2024-01-10 23:00:00")) // matches u2's LATER build
    val b = builds(("u1", "2024-01-10 00:00:00", 5.0),
      ("u2", "2024-01-10 00:00:00", 7.0),
      ("u2", "2024-01-10 22:00:00", 9.0))
    val inner = Asof.innerJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts",
      tolerance = Some(6 * hour))
    assert(inner.collect().map(r => (r.getLong(0), r.getDouble(5))).sorted.toSeq ==
      Seq((1L, 5.0), (3L, 9.0)),
      "probe 2's only candidate is 10h stale; probe 3 must still see the newer build")
    // outer: the stale probe survives, null-extended
    val outer = Asof.join(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts",
      tolerance = Some(6 * hour))
    val r2 = outer.filter(col("event_id") === 2).collect()
    assert(r2.length == 1 && r2.head.isNullAt(5),
      "outer mode must keep the stale probe with null build columns")
    // fixtures: tolerance == the untoleranced join post-filtered by gap
    val e = Engine.table(spark, dir, "events")
    val probesF = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val buildsF = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    val tol = Asof.innerJoin(probesF, buildsF,
      Seq("user_id" -> "b_user"), "ts", "b_ts", tolerance = Some(6 * hour))
      .collect().map(_.toString).sorted.toSeq
    val postFiltered = Asof.innerJoin(probesF, buildsF,
      Seq("user_id" -> "b_user"), "ts", "b_ts")
      .filter(col("ts").cast("long") - col("b_ts").cast("long") <= 6 * 3600)
      .collect().map(_.toString).sorted.toSeq
    assert(tol.nonEmpty && tol == postFiltered)
  }

  test("forward direction: smallest later-or-equal build wins; equality counts; none-after drops") {
    val p = probes((1L, "u1", "2024-01-10 00:00:00"),
      (2L, "u1", "2024-01-15 00:00:00"),
      (3L, "u1", "2024-01-30 00:00:00"), // after every build
      (4L, "u2", "2024-01-10 00:00:00")) // u2 has no build
    val b = builds(
      ("u1", "2024-01-05 00:00:00", 5.0),   // before everything: never a forward match
      ("u1", "2024-01-10 00:00:00", 10.0),  // equal ts: counts for probe 1
      ("u1", "2024-01-20 00:00:00", 20.0))
    val inner = Asof.forwardJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts",
      inner = true)
    assert(inner.collect().map(r => (r.getLong(0), r.getDouble(5))).sorted.toSeq ==
      Seq((1L, 10.0), (2L, 20.0)))
    // outer keeps the unmatched probes null-extended
    val outer = Asof.forwardJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
    assert(outer.count() == 4 &&
      outer.filter(col("event_id").isin(3, 4)).collect().forall(_.isNullAt(5)))
    // forward + tolerance: probe 2's next build is 5 days out — a
    // 2-day window drops it, probe 1's equal-time match survives
    val tol = Asof.forwardJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts",
      inner = true, tolerance = Some(2L * 86400 * 1000000))
    assert(tol.collect().map(r => (r.getLong(0), r.getDouble(5))).toSeq ==
      Seq((1L, 10.0)))
  }

  test("forward direction equals the all-pairs min-later composition on the fixtures") {
    val e = Engine.table(spark, dir, "events")
    val probesF = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val buildsF = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .agg(max(col("value")).as("p_value")) // dedup ties: max value == max event_id row? use min b_ts only
    val native = Asof.forwardJoin(probesF,
        buildsF.select(col("b_user"), col("b_ts"), col("p_value")),
        Seq("user_id" -> "b_user"), "ts", "b_ts", inner = true)
      .select(col("event_id"), col("b_ts"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    // composition: per probe, the minimum b_ts >= ts (timestamp only —
    // tie VALUES depend on the dedup rule, the matched TIME does not)
    val composed = probesF.join(buildsF,
        col("user_id") === col("b_user") && col("b_ts") >= col("ts"))
      .groupBy(col("event_id"))
      .agg(min(col("b_ts")).as("b_ts"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(native.nonEmpty && native == composed)
  }

  test("nearest direction: min-|gap| wins; ties go backward; tolerance bounds the chosen gap") {
    val p = probes(
      (1L, "u1", "2024-01-10 00:00:00"), // back gap 2d, fwd gap 1d → forward wins
      (2L, "u1", "2024-01-13 00:00:00"), // back gap 2d, fwd gap 2d → TIE → backward
      (3L, "u1", "2024-01-11 00:00:00"), // exact-time build → gap 0 backward
      (4L, "u2", "2024-01-10 00:00:00")) // u2 has no build at all
    val b = builds(
      ("u1", "2024-01-08 00:00:00", 8.0),
      ("u1", "2024-01-11 00:00:00", 11.0),
      ("u1", "2024-01-15 00:00:00", 15.0))
    val inner = Asof.nearestJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts",
      inner = true)
    assert(inner.collect().map(r => (r.getLong(0), r.getDouble(5))).sorted.toSeq ==
      Seq((1L, 11.0), (2L, 11.0), (3L, 11.0)))
    // outer null-extends the candidate-less probe
    val outer = Asof.nearestJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts")
    assert(outer.count() == 4 &&
      outer.filter(col("event_id") === 4).collect().forall(_.isNullAt(5)))
    // tolerance bounds the CHOSEN gap: 1 day keeps only probes 1 and 3
    val tol = Asof.nearestJoin(p, b, Seq("user_id" -> "b_user"), "ts", "b_ts",
      inner = true, tolerance = Some(86400L * 1000000))
    assert(tol.collect().map(r => (r.getLong(0), r.getDouble(5))).sorted.toSeq ==
      Seq((1L, 11.0), (3L, 11.0)))
  }

  test("nearest direction equals the all-pairs min-|gap| composition on the fixtures") {
    import org.apache.spark.sql.expressions.Window
    val e = Engine.table(spark, dir, "events")
    val probesF = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val buildsF = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .agg(max(col("value")).as("p_value"))
    val native = Asof.nearestJoin(probesF,
        buildsF.select(col("b_user"), col("b_ts"), col("p_value")),
        Seq("user_id" -> "b_user"), "ts", "b_ts", inner = true)
      .select(col("event_id"), col("b_ts"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    // composition: all pairs per user, min |gap| in MICROSECONDS, tie
    // broken toward the backward (earlier-or-equal) candidate — the
    // engine's single-pass answer must equal this quadratic baseline
    val w = Window.partitionBy(col("event_id")).orderBy(
      abs(unix_micros(col("b_ts")) - unix_micros(col("ts"))).asc,
      (col("b_ts") <= col("ts")).cast("int").desc)
    val composed = probesF.join(buildsF,
        col("user_id") === col("b_user"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("b_ts"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(native.nonEmpty && native == composed)
  }

  test("result is identical across partition counts (merge is partition-local)") {
    val a = SparkEntry.queries("q182_asof_native")(spark, dir)
      .repartition(1).collect().map(_.toString).sorted.toSeq
    val b = Engine.session(master = "local[4]").conf
    val prev = b.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val c = SparkEntry.queries("q182_asof_native")(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(a == c)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
