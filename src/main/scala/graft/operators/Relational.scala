package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Engine

/** Relational core of the engine (SURVEY.md §2B): joins of every type,
  * partial+final hash aggregation, window functions, set ops, sorts with
  * deterministic ties, offset/limit, scalar/date/JSON functions — each as
  * a named query over the fixture tables with a DuckDB oracle in
  * [[Relational.oracles]].
  *
  * Numeric-parity rules (applied to every query so the driver's
  * hash-compare is deterministic across engines):
  *   - money aggregates are summed as DECIMAL(12,2) (exact and
  *     order-independent — shuffle/partition order can't change a digit,
  *     which is also the correct design at 100 TB where float sums are
  *     nondeterministic across retries) and then cast to DOUBLE once, so
  *     both engines emit the identical float64;
  *   - means/ratios are computed as double(exact decimal sum) / count —
  *     one double division of identical inputs is bit-exact everywhere;
  *   - integer sums are pinned to BIGINT on both sides (DuckDB's
  *     sum(BIGINT) natively widens to HUGEINT);
  *   - every query ends in an ORDER BY over a unique key, and timestamp
  *     arithmetic compares unix microseconds exactly.
  *
  * Scale notes are per-query in the scaladoc: what shuffles, what
  * broadcasts, and why the plan survives 1000 executors.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** DECIMAL(12,2) cast — exact representation of the 2-dp money/qty
    * doubles in the fixtures; keeps product precision within 38 digits
    * on both engines (12,2 × 13,2 → ≤(26,4); × again ≤(38,6)).
    *
    * Measured tradeoff (sf0.1, warm): decimal group-sums run ~2× slower
    * than scaled-integer ("cents") long sums (1.07 s vs 0.53 s for the
    * q01 aggregate set). Decimal is kept deliberately: identical
    * exactness guarantees, simpler oracle parity, and the headline
    * queries stay well inside the bench envelope. If a future round
    * needs the 2×, switch dsum to sum(round(x*100)::long)/100.0 on both
    * engines.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum emitted as double (identical bits both engines). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact mean: double(exact sum) / count. */
  private def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  private val one = lit(1).cast(DecimalType(12, 2))

  /** revenue item: extendedprice * (1 - discount), exact decimal. */
  private def revItem: Column =
    dec(col("l_extendedprice")) * (one - dec(col("l_discount")))

  /** Cents twin of sum(revItem): price¢ · (100 − disc¢) per row in
    * exact longs (codegen integer ops instead of per-row BigDecimal
    * multiplies), overflow-proof decimal accumulation, one exact
    * de-scale — the same rational, hence the same double bits and
    * unchanged oracles (see the cents/lsum/descale contract above).
    */
  private def revSum: Column =
    descale(lsum(cents(col("l_extendedprice")) *
      (lit(100L) - cents(col("l_discount")))), 10000L)

  // ---- scaled-integer ("cents") twins of the decimal helpers ----
  //
  // Spark's double→decimal cast routes through BigDecimal.valueOf
  // (a Double.toString parse) and decimal×decimal through BigDecimal
  // multiply — per-ROW object work that dominates the hot aggregates
  // (measured: the q01 aggregate set at sf0.1 runs ~2× faster on cents).
  // The cents form keeps the identical exactness contract: the 2-dp
  // fixture doubles scale to integers EXACTLY (round() kills the
  // ~1e-11 binary-representation error), all row arithmetic is long
  // multiplies inside codegen, and the aggregation accumulates in
  // DECIMAL(28,0) (a compact long-backed Decimal — no strings, no
  // BigDecimal until ~1e18) so the sum cannot overflow at any corpus
  // size. The final de-scale divides the exact integer sum as a
  // DECIMAL (result scale ≥ 6 covers every product's true scale, so
  // the division is exact) and only THEN converts to double — the
  // same rational number the decimal formulation produces, hence the
  // same double bits and an unchanged oracle.

  /** x · 100 as an exact long (2-dp fixture values only). */
  private[graft] def cents(c: Column): Column = round(c * 100).cast("bigint")

  /** Overflow-proof exact sum of a long column: accumulate in compact
    * decimal (values < 1e18 never leave the long fast path).
    */
  private[graft] def lsum(c: Column): Column = sum(c.cast(DecimalType(28, 0)))

  /** De-scale an exact integer sum by 10^k and emit as double. */
  private[graft] def descale(sumCol: Column, pow10: Long): Column =
    (sumCol / lit(pow10)).cast("double")

  // ---------------------------------------------------------------
  // Aggregation
  // ---------------------------------------------------------------

  /** q01: TPC-H Q1-style pricing summary. One wide shuffle on the group
    * keys (6 groups) with map-side partial aggregation — at 100 TB the
    * shuffle moves only #partitions × 6 tiny rows. Scan prunes to 7
    * columns + pushes the shipdate filter into parquet.
    */
  val q01PricingSummary: Q = (s, dir) => {
    // all row-level arithmetic in exact scaled longs (see cents/lsum):
    // rev = price¢ · (100 − disc¢) is the revenue item at scale 10⁴,
    // charge adds (100 + tax¢) for scale 10⁶ — both exact integers per
    // row, summed overflow-proof, de-scaled once per GROUP
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .withColumn("qc", cents(col("l_quantity")))
      .withColumn("pc", cents(col("l_extendedprice")))
      .withColumn("rev", col("pc") * (lit(100L) - cents(col("l_discount"))))
      .withColumn("chg", col("rev") * (lit(100L) + cents(col("l_tax"))))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        descale(lsum(col("qc")), 100L).as("sum_qty"),
        descale(lsum(col("pc")), 100L).as("sum_base_price"),
        descale(lsum(col("rev")), 10000L).as("sum_disc_price"),
        descale(lsum(col("chg")), 1000000L).as("sum_charge"),
        (descale(lsum(col("qc")), 100L) / count(lit(1))).as("avg_qty"),
        (descale(lsum(col("pc")), 100L) / count(lit(1))).as("avg_price"),
        (descale(lsum(cents(col("l_discount"))), 100L) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: revenue per nation — 3-way join. `nation` (25 rows, fixed
    * cardinality) is hint-broadcast; `customer` SCALES with the corpus,
    * so its join strategy is left to the optimizer — statically
    * broadcast from parquet stats at test SFs, AQE-converted or a
    * plain shuffle join (bucketable) at 100 TB, where a FORCED
    * broadcast would OOM the build side. The orders⋈lineitem side
    * stays a shuffle join on orderkey either way, which AQE can
    * skew-split.
    */
  val q02RevenueByNation: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        revSum.as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** q03: top-10 orders by revenue. Aggregate-then-join keeps the join
    * input small; the global top-k is a TakeOrderedAndProject (no full
    * sort materialization).
    */
  val q03TopOrders: Q = (s, dir) => {
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(revSum.as("revenue"))
    t(s, dir, "orders")
      .join(rev, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** q21: multi-distinct aggregation per market segment (Spark plans
    * count(distinct) with an Expand + two-phase agg — dedup happens
    * before the wide shuffle, so it scales).
    */
  val q21DistinctAgg: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** q22: ROLLUP over (returnflag, linestatus); NULL group keys coalesced
    * to 'ALL' so NULL-ordering differences can't bite.
    *
    * TWO-LEVEL shape (guide §2.3 "aggregate before you shuffle"): the
    * corpus is first aggregated per (flag, status) — map-side
    * combinable, |R×S| result rows — and the ROLLUP's Expand runs over
    * that tiny aggregate instead of multiplying every corpus row ×3
    * through the partial-agg hash. count/sum are decomposable (sums of
    * sums, exact decimal accumulation), so every emitted value is
    * bit-identical to the single-level form.
    */
  val q22Rollup: Q = (s, dir) => {
    val base = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).as("sq"))
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n")).as("n_rows"), sum(col("sq")).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** q23: CUBE over (orderstatus, orderpriority) — same two-level shape
    * as q22 (the Expand ×4 runs over the |status×priority| pre-
    * aggregate, not the orders scan).
    */
  val q23Cube: Q = (s, dir) => {
    val base = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("sp"))
    base.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("n")).as("n_orders"), sum(col("sp")).cast("double").as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))
  }

  // ---------------------------------------------------------------
  // Joins
  // ---------------------------------------------------------------

  /** q04: LEFT SEMI — orders having a late-shipped lineitem (ship > 60
    * days after order date). Semi-join avoids materializing the multi-
    * match fact side.
    */
  val q04SemiJoin: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val late = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** q05: LEFT ANTI — customers with no orders, counted per nation. */
  val q05AntiJoin: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** q06: LEFT OUTER join + two-level aggregation: distribution of
    * order counts per customer (0-order customers included via the outer
    * join; the second agg is tiny).
    */
  val q06LeftJoinHistogram: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders").select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))
  }

  /** q07: FULL OUTER join of per-nation customer counts vs supplier
    * counts (both sides pre-aggregated → the outer join is tiny).
    */
  val q07FullOuter: Q = (s, dir) => {
    val cn = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("c_cnt"))
    val sn = t(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("s_cnt"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("c_cnt"), lit(0L)).as("customers"),
        coalesce(col("s_cnt"), lit(0L)).as("suppliers"))
      .orderBy(col("nationkey"))
  }

  /** q08: CROSS join of two small dims (region × distinct order status)
    * — cross joins are only ever sane on broadcast-size inputs, which
    * this is by construction.
    */
  val q08CrossJoin: Q = (s, dir) => {
    val r = t(s, dir, "region").select(col("r_name"))
    val st = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
    r.crossJoin(st)
      .select(col("r_name"), col("o_orderstatus"),
        concat_ws("/", col("r_name"), col("o_orderstatus")).as("cell"))
      .orderBy(col("r_name"), col("o_orderstatus"))
  }

  /** q09: range self-join on events — pairs of events from the same user
    * within 60s. Equi on user_id (the shuffle key) + time-range residual;
    * at scale the equi key keeps this a hash join, not a cross product.
    */
  val q09RangeJoin: Q = (s, dir) => {
    val e1 = t(s, dir, "events").select(
      col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val e2 = t(s, dir, "events").select(
      col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    e1.join(e2,
        col("a_user") === col("b_user") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 60 SECONDS"))
      .groupBy(col("a_user").as("user_id"))
      .agg(count(lit(1)).as("pairs_within_60s"))
      .orderBy(col("user_id"))
  }

  /** Shared DuckDB oracle for the q09 range-join contract — q185 (the
    * BucketIntervalJoin rewrite of q09's plan) hashes against the same
    * SQL.
    */
  val q09Sql: String =
    """SELECT a.user_id AS user_id, count(*) AS pairs_within_60s
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  /** q185: q09's FORWARD range join (strict lower bound, +60 s window)
    * rewritten by [[graft.plans.BucketIntervalJoin]] — proves the
    * generalized window matcher (any literal-offset window, either
    * direction, strict or inclusive bounds) through the DuckDB gate,
    * the q184 pattern applied to the second interval-join shape. The
    * rewrite fires on the join UNDER the aggregation (transform
    * recurses), so this also pins that the rule composes with
    * downstream operators.
    */
  val q185RangeRule: Q = (s, dir) => {
    val base = q09RangeJoin(s, dir)
    val rewritten = graft.plans.BucketIntervalJoin.rewrite(
      base.queryExecution.optimizedPlan)
    org.apache.spark.sql.graft.Bridge.ofRows(s, rewritten)
  }

  /** q10: theta join (equi + inequality residual): lineitems whose
    * quantity exceeds the part size, per brand. The equi component
    * keys the join (no all-pairs); the inequality stays a residual
    * filter. `part` scales with the corpus, so no broadcast hint —
    * the optimizer broadcasts from stats when it fits and shuffles on
    * partkey when it doesn't.
    */
  val q10ThetaJoin: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_size"), col("p_brand"))
    li.join(p,
        col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("p_brand"))
  }

  // ---------------------------------------------------------------
  // Window functions
  // ---------------------------------------------------------------

  /** q11: ranking trio — top-3 orders per customer by price. row_number
    * ties pinned by orderkey; rank/dense_rank left on the price ordering
    * alone (deterministic for equal keys by definition).
    *
    * The rn filter is applied IMMEDIATELY after the row_number window so
    * Catalyst's InferWindowGroupLimit turns it into a per-group top-k
    * pushdown (each group stops after 3 rows instead of materializing
    * the whole partition — the difference between shuffling k rows and
    * shuffling everything at 100 TB). rank/dense_rank computed after the
    * filter are identical: a surviving row's rank depends only on rows
    * ordered at-or-before it, all of which survive rn<=3.
    */
  val q11WindowRank: Q = (s, dir) => {
    val wRn = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wRk = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(wRn).as("rn"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"),
        rank().over(wRk).as("rk"),
        dense_rank().over(wRk).as("drk"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rk"), col("drk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q12: lag/lead of order price within each customer's order history. */
  val q12WindowLagLead: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q13: running decimal sum + 4-row moving average per supplier.
    * Decimal frame sums keep the incremental window evaluation exact on
    * both engines; emitted as double. The fixture lineitem has NO unique
    * key (duplicate (orderkey, linenumber) pairs exist), so the window
    * order resolves ties down to l_extendedprice — remaining ties are
    * full duplicates whose outputs are interchangeable — and the final
    * ORDER BY pins those with running_price.
    */
  val q13RunningSum: Q = (s, dir) => {
    val ord = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_extendedprice").asc)
    val running = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving = ord.rowsBetween(-3, Window.currentRow)
    t(s, dir, "lineitem")
      // window sums ride exact cents longs (see cents/lsum): the frame
      // accumulator does compact-long decimal adds instead of per-row
      // double→decimal string casts; de-scaled per output row
      .withColumn("pc", cents(col("l_extendedprice")))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        descale(lsum(col("pc")).over(running), 100L).as("running_price"),
        (descale(lsum(col("pc")).over(moving), 100L) /
          count(lit(1)).over(moving)).as("moving_avg4"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("running_price"))
  }

  /** q14: stateful fill-forward (the reference's date fill-forward scan,
    * SURVEY §2A#6, re-expressed relationally): last purchase value
    * carried forward over each user's event stream.
    */
  val q14FillForward: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
          .over(w).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q15: distribution windows — ntile/percent_rank/cume_dist of part
    * retail price within each brand.
    */
  val q15Distribution: Q = (s, dir) => {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").asc, col("p_partkey").asc)
    t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  // ---------------------------------------------------------------
  // Sort / limit / dedup / set ops
  // ---------------------------------------------------------------

  /** q16: the reference's skip-newest window (§2A#27): global sort,
    * OFFSET 1, LIMIT 8, deterministic ties.
    */
  val q16OffsetLimit: Q = (s, dir) => {
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(1)
      .limit(8)
  }

  /** q17: UNION ALL (bag semantics, §2A#23) of customer and supplier
    * nation keys, then counted.
    */
  val q17UnionAll: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.unionAll(sup)
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("nationkey"))
  }

  /** q18: INTERSECT (set semantics). */
  val q18Intersect: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.intersect(sup).orderBy(col("nationkey"))
  }

  /** q19: EXCEPT (set semantics). */
  val q19Except: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.except(sup).orderBy(col("nationkey"))
  }

  /** q20: order-sensitive first-wins dedup (§2A#25): earliest order per
    * (custkey, status), ties broken by orderkey — row_number over an
    * explicit arrival order, never bare dropDuplicates (which keeps an
    * arbitrary row under shuffles).
    */
  val q20FirstWinsDedup: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"), col("o_orderstatus"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("o_custkey"), col("o_orderstatus"))
  }

  // ---------------------------------------------------------------
  // Scalar / date / JSON functions
  // ---------------------------------------------------------------

  /** q24: string-function gauntlet over part (all codegen'd builtins —
    * narrow ops fused into one WholeStageCodegen span with the scan).
    */
  val q24StringFuncs: Q = (s, dir) => {
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
        size(split(col("p_name"), " ")).as("n_words"),
        base64(col("p_name").cast("binary")).as("name_b64"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("no_vowels"))
      .orderBy(col("p_partkey"))
  }

  /** q25: date/time functions over orders, plus the custom
    * fmt_month_abbrev (ref fetchRumors.js:153-159) on the ISO date.
    */
  val q25DateFuncs: Q = (s, dir) => {
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_date"),
        graft.functions.Scalars.fmt_month_abbrev(
          date_format(col("o_orderdate"), "yyyy-MM-dd")).as("pretty_date"))
      .orderBy(col("o_orderkey"))
  }

  /** q26: JSON extraction over events.props + aggregation (sum pinned to
    * BIGINT on both engines).
    */
  val q26Json: Q = (s, dir) => {
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))
  }

  /** q27: CASE WHEN banding of customer balances. */
  val q27CaseWhen: Q = (s, dir) => {
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("band"))
  }

  /** q28: the reference's custom scalars (§2A#12-18) as native Catalyst
    * expressions over part names: slugify, html_escape, extract_iso_date.
    */
  val q28CustomScalars: Q = (s, dir) => {
    import graft.functions.Scalars._
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        slugify(col("p_name")).as("slug"),
        html_escape(concat(col("p_name"), lit(" & <\"tags\">"))).as("escaped"),
        extract_iso_date(
          concat(lit("posted January "), (col("p_size") % 28 + 1).cast("string"),
            lit(", 2024 by editor"))).as("iso_from_text"))
      .orderBy(col("p_partkey"))
  }

  /** q29: batch analog of a tumbling event-time window (1 h) — the same
    * grouping Structured Streaming produces with window(ts, '1 hour'),
    * verified against DuckDB time_bucket.
    */
  val q29TumblingWindow: Q = (s, dir) => {
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Session gap (microseconds) — ONE constant shared by q30's batch
    * sessionization, its oracle, and q115's path mining (StatsOps), so
    * the "same sessionization" claim cannot silently drift.
    */
  val SessionGapUs = 1800000000L

  /** q30: sessionization in batch — session = run of events per user with
    * gaps < 30 min (lag + cumulative sum of gap flags), then per-session
    * stats. Gap compared in unix microseconds (exact on both engines).
    * The batch twin of the streaming session window.
    */
  val q30Sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q31: array-building aggregates — collect_set (sorted for
    * determinism) and min_by/max_by argmin-aggregates per nation.
    * The collected set is emitted as a ','-joined string: the value is
    * identical information, and a flat string column hash-compares in
    * any downstream tool (array cells don't).
    */
  val q31CollectAgg: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    c.groupBy(col("c_nationkey"))
      .agg(
        concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"),
        min_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("poorest"),
        max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("richest"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** q32: approximate distinct counting (HyperLogLog++) next to the
    * exact count. Raw HLL estimates are engine-specific, so the
    * cross-engine contract is: the exact count plus a boolean computed
    * *within each engine* asserting its own estimate is within 5% of
    * exact — both engines emit identical rows iff both sketches meet
    * the published HLL++ error bound.
    */
  val q32ApproxDistinct: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    // ONE scan + ONE pre-dedup feeds both exact counts and both HLL
    // sketches: stack() tags each row with its key family, the (flag,
    // tag, key) dedup shares its shuffle between exact and approx, and —
    // because approx_count_distinct is insertion-idempotent — the sketch
    // over deduped rows is identical to the sketch over raw rows while
    // existing only for the 6 (flag, tag) final groups. A combined
    // countDistinct×2 + approx agg would instead carry a sketch buffer
    // per distinct-value PARTIAL group (~26 GB at sf0.1, measured GC
    // collapse).
    // rsd=0.015 resolves to HLL precision p=13 (true rsd ~1.15%), so
    // the 5% contract bound sits ~4.3 standard errors out — still
    // deterministic-in-practice at every SF (default rsd=0.05 is ~1
    // sigma and *should* sometimes miss), at half the p=14 register
    // file, whose 1536-word aggregation buffer dominated this query's
    // runtime via codegen size, not data.
    // the whole (flag, tag, key) triple is bit-packed into ONE long —
    // key × 512 + family bit × 256 + ascii(flag) (the flag is a single
    // ASCII char in this schema, so it round-trips through ascii()/
    // char() with no dictionary join; a NULL flag packs as 0 and
    // decodes back to NULL so dirty rows keep their own group instead
    // of collapsing the whole key to NULL) — and the dedup shuffle
    // ships just that long: one 8-byte fixed-width column on the only
    // full-width exchange in the query, vs (string, long) rows costing
    // ~3× in UnsafeRow bytes and string comparisons. The sketch hashes
    // `k3 div 512` = the original key, so estimates are unchanged.
    val dedup = li.selectExpr(
      "stack(2, l_partkey * 512 + 256 + coalesce(ascii(l_returnflag), 0), " +
        "l_orderkey * 512 + coalesce(ascii(l_returnflag), 0)) as (k3)")
      .distinct()
    val agged = dedup
      .groupBy(expr("CASE WHEN k3 % 256 = 0 THEN NULL ELSE char(k3 % 256) END")
        .as("l_returnflag"),
        expr("(k3 div 256) % 2").as("is_p"))
      .agg(count(lit(1)).as("exact"),
        approx_count_distinct(expr("k3 div 512"), 0.015).as("approx"))
    agged.groupBy(col("l_returnflag"))
      .agg(
        max(when(col("is_p") === 1, col("exact"))).as("exact_parts"),
        max(when(col("is_p") === 0, col("exact"))).as("exact_orders"),
        max(when(col("is_p") === 1, col("approx"))).as("approx_parts"),
        max(when(col("is_p") === 0, col("approx"))).as("approx_orders"))
      .select(
        col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("approx_parts").cast("double") - col("exact_parts").cast("double")) <=
          col("exact_parts").cast("double") * 0.05).cast("bigint").as("parts_within_5pct"),
        (abs(col("approx_orders").cast("double") - col("exact_orders").cast("double")) <=
          col("exact_orders").cast("double") * 0.05).cast("bigint").as("orders_within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  /** q33: AS-OF join — each non-purchase event joined to the same
    * user's most recent prior-or-equal purchase. Spark lacks a native
    * as-of join; rather than a quadratic range join, this composes
    * built-ins (brief preference (a)): union both sides, one
    * fill-forward window over the merged stream, keep probe rows —
    * a single shuffle on user_id, linear in events. DuckDB oracle uses
    * its native ASOF JOIN.
    */
  val q33AsofJoin: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        lit(null).cast("double").as("p_value"), lit(1).as("is_probe"))
    // one build row per (user, ts) — keeps DuckDB's ASOF tie behavior
    // out of the comparison (and makes the operator deterministic)
    val wb = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val builds = e.filter(col("event_type") === "purchase")
      .withColumn("rnb", row_number().over(wb)).filter(col("rnb") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("p_value"), lit(0).as("is_probe"))
    // merged stream ordered by (ts, is_probe, event_id): a build row at
    // the same ts sorts before probes (<= as-of semantics)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_probe").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionAll(builds)
      .withColumn("last_purchase_value",
        last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("user_id"), col("last_purchase_value"))
      .filter(col("last_purchase_value").isNotNull)
      .orderBy(col("event_id"))
  }

  /** q182: the SAME as-of semantics as q33, executed by the NATIVE
    * [[graft.plans.AsofJoinExec]] physical operator instead of the
    * union + fill-forward composition — the engine's one custom
    * LogicalPlan → SparkStrategy → SparkPlan stack, registered via
    * GraftExtensions/extraStrategies. Shares q33's DuckDB ASOF JOIN
    * oracle VERBATIM (same contract, different physical plan), so the
    * correctness gate value-checks the native exec against an
    * independent engine; AsofNativeSpec additionally cross-checks it
    * against q33's composition row-for-row and asserts AsofJoinExec
    * actually appears in the executed plan. Build side deduped to one
    * row per (user, ts) exactly as q33 — the exec's last-in-sort-order
    * tie rule then matches the oracle's row_number pick.
    */
  val q182AsofNative: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // build dedup (one row per (user, ts), max event_id wins — q33's
    // rule) phrased as last-of-ts-group over a window clustered on
    // user_id ALONE: the window's sort (user_id, ts, event_id) is a
    // superset of the as-of exec's required (key, time) ordering, so
    // EnsureRequirements inserts NO exchange and NO sort between the
    // dedup and the merge — one shuffle total on the build side, vs
    // two with a (user_id, ts)-partitioned row_number dedup
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val builds = e.filter(col("event_type") === "purchase")
      .withColumn("nts", lead(col("ts"), 1).over(wb))
      .filter(col("nts").isNull || col("nts") =!= col("ts"))
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    graft.plans.Asof.join(probes, builds,
        Seq("user_id" -> "b_user"), "ts", "b_ts")
      .filter(col("p_value").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("p_value").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q199: the INNER native as-of join — q182's exact result produced
    * by the exec's inner mode instead of a compose-then-filter: the
    * merge DROPS unmatched probes at emission (zero null-extended rows
    * ever materialize between operators), which is DuckDB's bare
    * `ASOF JOIN` semantics — so the query reuses q33's oracle VERBATIM
    * with no isNotNull anywhere on the Spark side. Same build-side
    * dedup as q182 (one row per (user, ts), exec tie rule == oracle's
    * row_number pick); AsofNativeSpec pins inner == outer+filter
    * row-for-row and the unchanged plan contract.
    */
  val q199AsofInner: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val builds = e.filter(col("event_type") === "purchase")
      .withColumn("nts", lead(col("ts"), 1).over(wb))
      .filter(col("nts").isNull || col("nts") =!= col("ts"))
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    graft.plans.Asof.innerJoin(probes, builds,
        Seq("user_id" -> "b_user"), "ts", "b_ts")
      .select(col("event_id"), col("user_id"),
        col("p_value").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q213: the native as-of join under a TOLERANCE (pandas
    * `merge_asof`'s knob, which neither plain SQL ASOF nor the q33
    * composition expresses without a post-filter): a purchase older
    * than the probe by more than 6 hours does not count as context.
    * The exec checks the gap at EMISSION against its O(1) buffered
    * candidate — stale matches are never materialized between
    * operators, unlike the compose-then-filter equivalent that
    * carries every match out of the join first. Inner mode, so the
    * DuckDB oracle is q33's ASOF JOIN plus the verbatim gap predicate
    * (for the inner form, post-filtering the gap is exactly the
    * tolerance semantics — AsofNativeSpec pins that equivalence and
    * the outer form's null-extension against composed baselines).
    */
  val q213AsofTolerance: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val builds = e.filter(col("event_type") === "purchase")
      .withColumn("nts", lead(col("ts"), 1).over(wb))
      .filter(col("nts").isNull || col("nts") =!= col("ts"))
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    graft.plans.Asof.innerJoin(probes, builds,
        Seq("user_id" -> "b_user"), "ts", "b_ts",
        tolerance = Some(6L * 3600 * 1000000)) // 6 h in micros
      .select(col("event_id"), col("user_id"),
        col("p_value").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q219: the FORWARD-direction native as-of — "which purchase came
    * NEXT after each probe event" (the attribution mirror of q199's
    * last-purchase-before): each probe matches the build row with the
    * smallest `b_ts >= ts`. Same single-pass merge, mirror-image
    * state (strictly-earlier build rows are consumed, the match IS
    * the buffered head). Inner mode; DuckDB expresses the direction
    * natively — `ASOF JOIN … ON p.ts <= b.ts` — so the oracle is the
    * verbatim reversed-inequality q33 SQL. Build dedup as q182/q199.
    */
  val q219AsofForward: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val builds = e.filter(col("event_type") === "purchase")
      .withColumn("nts", lead(col("ts"), 1).over(wb))
      .filter(col("nts").isNull || col("nts") =!= col("ts"))
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    graft.plans.Asof.forwardJoin(probes, builds,
        Seq("user_id" -> "b_user"), "ts", "b_ts", inner = true)
      .select(col("event_id"), col("user_id"),
        col("p_value").as("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q220: the NEAREST-direction native as-of — "which purchase sits
    * CLOSEST in time to each probe event, either side" (pandas
    * `merge_asof` direction="nearest", completing the direction knob:
    * backward q199, forward q219, nearest here). The backward merge's
    * O(1) state already holds both candidates — the consumed
    * best-at-or-before row and the buffered first-after row — so
    * nearest costs one gap comparison at emission, no extra pass, no
    * extra state. Ties go backward (the pandas rule). DuckDB has no
    * nearest direction, so the oracle is the CLOSED FORM the verdict
    * named: both directional ASOF joins unioned per probe with the
    * min-|gap| pick (strict `<` ⇒ ties to backward) — the engine's
    * single-pass answer must equal the two-pass composition byte for
    * byte. Build dedup as q182/q199; inner mode (a probe with no
    * purchase on either side drops).
    */
  val q220AsofNearest: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val probes = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val builds = e.filter(col("event_type") === "purchase")
      .withColumn("nts", lead(col("ts"), 1).over(wb))
      .filter(col("nts").isNull || col("nts") =!= col("ts"))
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("p_value"))
    graft.plans.Asof.nearestJoin(probes, builds,
        Seq("user_id" -> "b_user"), "ts", "b_ts", inner = true)
      .select(col("event_id"), col("user_id"),
        col("p_value").as("nearest_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q35: explicit GROUPING SETS — ((returnflag, linestatus), (returnflag),
    * (linestatus)) without the grand total (which distinguishes it from
    * rollup/cube in q22/q23).
    */
  val q35GroupingSets: Q = (s, dir) => {
    Engine.registerViews(s, dir)
    // two-level shape (q22's rationale): the GROUPING SETS Expand ×3
    // runs over the per-(flag, status) pre-aggregate — |R×S| rows —
    // instead of tripling the lineitem scan through the partial agg;
    // sums of counts / sums of exact decimal sums are value-identical
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  sum(n) AS n_rows,
        |  CAST(sum(sq) AS DOUBLE) AS sum_qty
        |FROM (SELECT l_returnflag, l_linestatus, count(*) AS n,
        |        sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
        |      FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** q34: TPC-H Q5-adapted — local-supplier revenue for ASIA in 1997:
    * a 6-way join (two facts + four dims). The FIXED dims (nation 25,
    * region 5) are hint-broadcast; supplier and customer SCALE with
    * the corpus, so their strategy is optimizer-chosen (broadcast from
    * stats at test SFs, shuffle join at 100 TB — a forced broadcast of
    * an SF-scaling table is a production OOM). The fact⋈fact join
    * shuffles on orderkey; the c_nationkey = s_nationkey residual
    * makes it a "local supplier" join. Classic star-join shape.
    */
  val q34LocalSupplierVolume: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders").filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revSum.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** q180: the q179 COST-BASED PLANNER consumed by the engine's own
    * surface (VERDICT r11 item 5) — q34's local-supplier star with its
    * three SCALING joins (li⋈orders, ⋈supplier, ⋈customer) routed
    * through [[JoinPlanner.plannedJoin]] using the [[JoinPlanner
    * .decisions]] table the planner computed from its own statistics;
    * the two FIXED dims (nation 25, region 5) stay hint-broadcast as
    * in q34. Planning is layout-only, so the oracle is q34's oracle
    * VERBATIM: a hash match proves the planner's broadcast hints and
    * salted-join rewrites changed the physical plan (PlanSpec asserts
    * that) without moving one byte of the answer — the "decisions are
    * consumable, not just a report" bar.
    *
    * The decisions were profiled on the BASE tables while two of the
    * joins here consume intermediates — exactly how a System R
    * optimizer plans (base-table statistics approximate intermediate
    * cardinalities); the salt columns passed for each join are probe-
    * side columns that vary WITHIN a join key, so a hot key's rows
    * actually spread across the salt fan-out.
    *
    * Scale shape: q34's, plus the planner's O(k)-state ANALYZE pass;
    * at sf0.01+ the li⋈orders join executes SALTED with the computed
    * factor (orders outgrows the broadcast budget, l_orderkey skew ≈
    * 3–4), which is the 100 TB shape: no forced broadcast of a scaling
    * table, stragglers leveled by measured skew, not a constant.
    */
  val q180PlannedStar: Q = (s, dir) => {
    val d = JoinPlanner.decisions(s, dir)
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders").filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    // lineitem-side columns that vary within every catalog key —
    // valid salts for whichever join the planner decides to salt
    // (the probe side is always the lineitem-carrying intermediate
    // for these three joins at every gate SF)
    val liSalt = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    def planned(left: DataFrame, right: DataFrame, lk: String, rk: String,
        name: String): DataFrame = {
      val (strategy, build, factor) = d(name)
      JoinPlanner.plannedJoin(left, right, lk, rk, strategy, build, factor,
        liSalt)
    }
    val j = planned(
      planned(
        planned(li, o, "l_orderkey", "o_orderkey", "li_orders"),
        sup, "l_suppkey", "s_suppkey", "li_supplier"),
      c, "o_custkey", "c_custkey", "orders_customer")
      .filter(col("c_nationkey") === col("s_nationkey"))
    j.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revSum.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  // ---------------------------------------------------------------

  /** q36: exact discrete percentiles (p50/p95 of quantity per
    * returnflag), DISTRIBUTED: aggregate (flag, qty) → count first (one
    * map-side-combinable shuffle over the DISTINCT value domain — ~50
    * quantities per flag regardless of row count), then rank-select over
    * the cumulative counts: pN is the smallest qty whose cumulative
    * count reaches ceil(N·n). Identical to percentile_disc / the
    * row_number-at-ceil(q·n) formulation, but the windows see distinct
    * VALUES, not rows — a row-level window partitioned by the 3-value
    * returnflag would push n/3 rows through one task's sort forever.
    */
  val q36Percentiles: Q = (s, dir) => {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("qty").asc)
    val wAll = Window.partitionBy(col("l_returnflag"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("qty"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cnt", sum(col("c")).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= ceil(col("cnt") * 0.5), col("qty"))).as("p50"),
        min(when(col("cum") >= ceil(col("cnt") * 0.95), col("qty"))).as("p95"),
        max(col("cnt")).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** q37: correlated subqueries — customers above their own nation's
    * average balance (correlated scalar agg) that have at least one
    * order (correlated EXISTS). Written in SQL so Catalyst's
    * decorrelation (RewriteCorrelatedScalarSubquery + rewrite of EXISTS
    * into a semi join) does the planning — the point of the operator.
    */
  val q37Correlated: Q = (s, dir) => {
    Engine.registerViews(s, dir)
    s.sql(Relational.q37Sql)
  }

  /** One ANSI string runs verbatim on BOTH engines (the exact-mean
    * parity form: exact decimal sum, one double division).
    */
  val q37Sql: String =
    """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
      |FROM customer c
      |WHERE CAST(c_acctbal AS DOUBLE) >
      |      (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
      |       FROM customer c2
      |       WHERE c2.c_nationkey = c.c_nationkey)
      |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q63: interval join (batch twin of the stream-stream
    * clickPurchaseJoin — EventStreamsSpec proves streaming == batch on
    * the same function; this row makes the semantics driver-verified).
    */
  val q63IntervalJoin: Q = (s, dir) => {
    val e = t(s, dir, "events")
    graft.streaming.EventStreams.clickPurchaseJoin(e, e)
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Shared DuckDB oracle for the interval-join contract — q63 (plain
    * equi-key + residual) and q183 (time-bucketed) hash against the
    * same SQL, so the gate proves both strategies compute one answer.
    */
  val q63Sql: String =
    """SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
      |  p.ts AS purchase_ts, p.value
      |FROM events c JOIN events p ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR
      |ORDER BY click_id, purchase_id""".stripMargin

  /** q183: the SAME interval-join semantics as q63, executed via TIME
    * BUCKETING — the scale path for interval joins with hot keys.
    *
    * q63 keys its shuffle on `user_id` alone, leaving the 1-hour range
    * as a residual filter: correct, but one user with m events in the
    * probed window costs O(m²) candidate pairs inside a single task —
    * the classic interval-join straggler at 100 TB. q183 bounds that:
    * both sides carry `bucket = epoch_seconds div 3600` (bucket width ==
    * the join interval, so a matching purchase can only sit in the
    * click's bucket or the one before it), each purchase is replicated
    * into its own bucket and the NEXT (`explode(array(pb, pb+1))`), and
    * the join keys become `(user_id, bucket)`. Per-key work drops from
    * O(events-per-user²) to O(events-per-user-per-hour²), the exchange
    * spreads a hot user over all their active hours, and the composite
    * key is exactly what AQE's skew-join splitting and q118's salting
    * operate on if one HOUR is still hot. Cost: a ×2 replication of the
    * (already filtered) purchase side — bytes linear in the input,
    * traded for the quadratic task bound. Each candidate pair arises
    * exactly once (a purchase's two replicas land in distinct buckets;
    * a click has one bucket), so no post-join dedup is needed and the
    * exact range predicate reproduces q63 verbatim — the gate runs both
    * against ONE DuckDB oracle. IntervalBucketedSpec proves equivalence
    * on fixtures + boundary frames and that the candidate count on a
    * hot key is strictly below the user-only keying's.
    */
  val q183IntervalBucketed: Q = (s, dir) =>
    intervalBucketedJoin(t(s, dir, "events"))
      .orderBy(col("click_id"), col("purchase_id"))

  /** q184: the interval join REWRITTEN BY THE OPTIMIZER RULE — the
    * natural q63 join is built as-is, then
    * [[graft.plans.BucketIntervalJoin.rewrite]] transforms its
    * optimized plan into the q183 bucketed layout (the same transform
    * the injected rule applies transparently when
    * `spark.graft.bucketIntervalJoin.enabled` is set; applying it
    * directly keeps the driver session's conf untouched so q63's own
    * plan stays un-rewritten in the same run). Hashes against the
    * shared q63 oracle, so the gate value-checks the RULE's output —
    * hand-written q183 and rule-rewritten q184 must both equal DuckDB.
    * IntervalRuleSpec covers the conf-gated path, idempotence, and
    * both window directions — the generalized matcher rewrites q09's
    * strict-bound forward window too (q185 depends on it); the shapes
    * pinned as refusals are the genuinely unbucketable ones
    * (sub-second lower offsets, month intervals).
    */
  val q184IntervalRule: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val plain = graft.streaming.EventStreams.clickPurchaseJoin(e, e)
    val rewritten = graft.plans.BucketIntervalJoin.rewrite(
      plain.queryExecution.optimizedPlan)
    org.apache.spark.sql.graft.Bridge.ofRows(s, rewritten)
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** q198: the LEFT-OUTER interval join through the optimizer rule —
    * the "every click, with its optional preceding-hour purchases"
    * shape (VERDICT r12 item 6, the round-12 rule fired only on
    * INNER). The rule re-anchors the window onto the PRESERVED click
    * side (anchor rows are never replicated, so unmatched clicks
    * surface exactly once, null-extended by the join itself) and
    * explodes only the purchase side — per-task work bounded exactly
    * as in q184, outer semantics intact. The `require` self-verifies
    * the rewrite fired; the oracle is the verbatim raw left-join SQL,
    * so the gate value-checks the outer path of the rule (matched
    * rows AND the null-extended unmatched tail). IntervalRuleSpec
    * pins re-anchoring, single-surfacing of unmatched rows, and the
    * sub-second refusal asymmetry.
    */
  val q198IntervalLeftOuter: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    val plain = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
    val rewritten = graft.plans.BucketIntervalJoin.rewrite(
      plain.queryExecution.optimizedPlan)
    require(rewritten.treeString.contains(
      graft.plans.BucketIntervalJoin.BucketPrefix),
      "q198: the left-outer interval rewrite did not fire")
    org.apache.spark.sql.graft.Bridge.ofRows(s, rewritten)
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** q221: the FULL-OUTER interval join through the optimizer rule —
    * "every click AND every purchase, paired where the preceding-hour
    * window matches" (VERDICT r13 item 8, the last join type the rule
    * lacked). No single bucketed join can preserve both sides (the
    * exploded side's unmatched rows would surface once per replica),
    * so the rule DECOMPOSES: a bucketed LEFT OUTER anchored on clicks
    * unioned with a bucketed LEFT ANTI anchored on purchases that
    * recovers the unmatched purchase tail under null-extended click
    * columns — both parts skew-bounded, the union exactly the full
    * outer join. The `require` self-verifies the rewrite fired AND
    * produced the two-part shape; the oracle is the verbatim raw
    * FULL JOIN SQL, so the gate value-checks matched pairs and BOTH
    * unmatched tails in one hash.
    */
  val q221IntervalFullOuter: Q = (s, dir) => {
    val e = t(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    val plain = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
      "full_outer")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
    val rewritten = graft.plans.BucketIntervalJoin.rewrite(
      plain.queryExecution.optimizedPlan)
    require(rewritten.treeString.contains(
      graft.plans.BucketIntervalJoin.BucketPrefix) &&
      rewritten.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Union]),
      "q221: the full-outer interval rewrite did not fire")
    // full outer ⇒ null keys on BOTH sort columns; pin NULLS LAST
    // explicitly (DuckDB's ASC default) so the presentation order is
    // engine-agnostic
    org.apache.spark.sql.graft.Bridge.ofRows(s, rewritten)
      .orderBy(col("click_id").asc_nulls_last, col("purchase_id").asc_nulls_last)
  }

  /** The q183 operator over any events-shaped frame (event_id, user_id,
    * ts, event_type, value) — IntervalBucketedSpec drives synthetic
    * boundary/hot-key frames through this exact code path.
    */
  def intervalBucketedJoin(e: DataFrame): DataFrame = {
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"),
        expr("cast(ts as bigint) div 3600").as("bucket"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"),
        expr("cast(ts as bigint) div 3600").as("pb"))
      .withColumn("join_bucket", explode(array(col("pb"), col("pb") + 1)))
    clicks.join(purchases,
        col("user_id") === col("p_user") && col("bucket") === col("join_bucket") &&
          col("purchase_ts") <= col("click_ts") &&
          col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
  }

  /** Salt fan-out for q118 (what q100's skew report recommends for a
    * uniform key; real skew would size this from max/mean).
    */
  val SaltFactor = 4

  /** q118: salted skew join, oracle-proven equivalent to the plain
    * join — `Salting.saltedJoin` spreads each supplier key over
    * [[SaltFactor]] sub-keys (fact side salted by a deterministic row
    * hash, dimension side replicated ×salt), then revenue aggregates
    * per supplier. The oracle is the UNSALTED join: a hash match is
    * the proof that salting changes the shuffle layout and nothing
    * else. Closes the loop with q100 (which computes the salt factor a
    * pipeline would pass here).
    */
  val q118SaltedJoin: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    Salting.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
      SaltFactor, Seq("l_orderkey", "l_linenumber", "l_partkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        revSum.as("revenue"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, Q] = Map(
    "q36_percentiles" -> q36Percentiles,
    "q37_correlated" -> q37Correlated,
    "q63_interval_join" -> q63IntervalJoin,
    "q183_interval_bucketed" -> q183IntervalBucketed,
    "q184_interval_rule" -> q184IntervalRule,
    "q198_interval_left_outer" -> q198IntervalLeftOuter,
    "q221_interval_full_outer" -> q221IntervalFullOuter,
    "q118_salted_join" -> q118SaltedJoin,
    "q31_collect_agg" -> q31CollectAgg,
    "q32_approx_distinct" -> q32ApproxDistinct,
    "q33_asof_join" -> q33AsofJoin,
    "q182_asof_native" -> q182AsofNative,
    "q199_asof_inner" -> q199AsofInner,
    "q213_asof_tolerance" -> q213AsofTolerance,
    "q219_asof_forward" -> q219AsofForward,
    "q220_asof_nearest" -> q220AsofNearest,
    "q34_local_supplier_volume" -> q34LocalSupplierVolume,
    "q180_planned_star" -> q180PlannedStar,
    "q35_grouping_sets" -> q35GroupingSets,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_revenue_by_nation" -> q02RevenueByNation,
    "q03_top_orders" -> q03TopOrders,
    "q04_semi_join" -> q04SemiJoin,
    "q05_anti_join" -> q05AntiJoin,
    "q06_left_join_histogram" -> q06LeftJoinHistogram,
    "q07_full_outer" -> q07FullOuter,
    "q08_cross_join" -> q08CrossJoin,
    "q09_range_join" -> q09RangeJoin,
    "q185_range_rule" -> q185RangeRule,
    "q10_theta_join" -> q10ThetaJoin,
    "q11_window_rank" -> q11WindowRank,
    "q12_window_lag_lead" -> q12WindowLagLead,
    "q13_running_sum" -> q13RunningSum,
    "q14_fill_forward" -> q14FillForward,
    "q15_distribution" -> q15Distribution,
    "q16_offset_limit" -> q16OffsetLimit,
    "q17_union_all" -> q17UnionAll,
    "q18_intersect" -> q18Intersect,
    "q19_except" -> q19Except,
    "q20_first_wins_dedup" -> q20FirstWinsDedup,
    "q21_distinct_agg" -> q21DistinctAgg,
    "q22_rollup" -> q22Rollup,
    "q23_cube" -> q23Cube,
    "q24_string_funcs" -> q24StringFuncs,
    "q25_date_funcs" -> q25DateFuncs,
    "q26_json" -> q26Json,
    "q27_case_when" -> q27CaseWhen,
    "q28_custom_scalars" -> q28CustomScalars,
    "q29_tumbling_window" -> q29TumblingWindow,
    "q30_sessionize" -> q30Sessionize)

  private val decSum = (c: String) =>
    s"CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  private val q33Sql =
    """WITH b AS (
      |  SELECT user_id, ts, value AS p_value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
      |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type != 'purchase')
      |SELECT p.event_id, p.user_id, b.p_value AS last_purchase_value
      |FROM p ASOF JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
      |ORDER BY p.event_id""".stripMargin

  private val q34Sql =
    s"""SELECT n_name, CAST(sum($revSql) AS DOUBLE) AS revenue, count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      | AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      | AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** DuckDB oracle SQL, one per query, same column names + ORDER BY.
    * (q32 approx-distinct is rows-only: HLL sketches are engine-specific.)
    */
  val oracles: Map[String, String] = Map(
    "q36_percentiles" ->
      """SELECT l_returnflag,
        |  max(CASE WHEN rn = ceil(cnt * 0.5) THEN qty END) AS p50,
        |  max(CASE WHEN rn = ceil(cnt * 0.95) THEN qty END) AS p95,
        |  count(*) AS n_rows
        |FROM (
        |  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qty,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS DOUBLE) ASC) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q37_correlated" -> q37Sql,
    "q63_interval_join" -> q63Sql,
    // q183 executes the same contract via time bucketing and q184 via
    // the optimizer rule's rewrite of the plain join; one oracle
    // value-checks all three physical strategies (the q33/q182 pattern)
    "q183_interval_bucketed" -> q63Sql,
    "q184_interval_rule" -> q63Sql,
    "q198_interval_left_outer" ->
      """SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
        |  p.ts AS purchase_ts, p.value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q221_interval_full_outer" ->
      """SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
        |  p.ts AS purchase_ts, p.value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q31_collect_agg" ->
      """SELECT g.c_nationkey, g.segments, p.poorest, r.richest, g.n_customers FROM
        |  (SELECT c_nationkey,
        |          array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |          count(*) AS n_customers FROM customer GROUP BY c_nationkey) g
        |JOIN (SELECT c_nationkey, c_name AS poorest FROM customer
        |      QUALIFY row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) = 1) p
        |  USING (c_nationkey)
        |JOIN (SELECT c_nationkey, c_name AS richest FROM customer
        |      QUALIFY row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey DESC) = 1) r
        |  USING (c_nationkey)
        |ORDER BY g.c_nationkey""".stripMargin,
    "q32_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  CAST(abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
        |           - CAST(count(DISTINCT l_partkey) AS DOUBLE))
        |       <= CAST(count(DISTINCT l_partkey) AS DOUBLE) * 0.05 AS BIGINT)
        |    AS parts_within_5pct,
        |  CAST(abs(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
        |           - CAST(count(DISTINCT l_orderkey) AS DOUBLE))
        |       <= CAST(count(DISTINCT l_orderkey) AS DOUBLE) * 0.05 AS BIGINT)
        |    AS orders_within_5pct
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q35_grouping_sets" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows, ${decSum("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q34_local_supplier_volume" -> q34Sql,
    // q180 reuses q34's oracle VERBATIM: the planner's rewrites are
    // layout-only, and the shared oracle makes that a value check
    "q180_planned_star" -> q34Sql,
    "q33_asof_join" -> q33Sql,
    // q182 reuses q33's oracle VERBATIM: same as-of contract, executed
    // by the native AsofJoinExec instead of the window composition —
    // the shared oracle makes the physical-operator swap a value check
    "q182_asof_native" -> q33Sql,
    "q219_asof_forward" ->
      """WITH b AS (
        |  SELECT user_id, ts, value AS p_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type != 'purchase')
        |SELECT p.event_id, p.user_id, b.p_value AS next_purchase_value
        |FROM p ASOF JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts
        |ORDER BY p.event_id""".stripMargin,
    // q220: DuckDB has no NEAREST direction — the oracle is the closed
    // form: both directional ASOF LEFT joins per probe, min-|gap| pick
    // with strict `<` so ties resolve backward (the engine's tie rule)
    "q220_asof_nearest" ->
      """WITH b AS (
        |  SELECT user_id, ts, value AS p_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type != 'purchase'),
        |bk AS (
        |  SELECT p.event_id, p.user_id, p.ts, b.ts AS b_ts, b.p_value AS b_value
        |  FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts),
        |fw AS (
        |  SELECT p.event_id, b.ts AS f_ts, b.p_value AS f_value
        |  FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts)
        |SELECT event_id, user_id,
        |  CASE WHEN b_ts IS NULL THEN f_value
        |       WHEN f_ts IS NULL THEN b_value
        |       WHEN (f_ts - ts) < (ts - b_ts) THEN f_value
        |       ELSE b_value END AS nearest_purchase_value
        |FROM bk JOIN fw USING (event_id)
        |WHERE b_ts IS NOT NULL OR f_ts IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q213_asof_tolerance" ->
      """WITH b AS (
        |  SELECT user_id, ts, value AS p_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type != 'purchase')
        |SELECT p.event_id, p.user_id, b.p_value AS last_purchase_value
        |FROM p ASOF JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
        |WHERE p.ts - b.ts <= INTERVAL 6 HOUR
        |ORDER BY p.event_id""".stripMargin,
    // q199 reuses it a third time: the INNER exec mode == DuckDB's bare
    // ASOF JOIN (which IS inner), no post-filter on either side
    "q199_asof_inner" -> q33Sql,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${decSum("l_quantity")} AS sum_qty,
        |  ${decSum("l_extendedprice")} AS sum_base_price,
        |  CAST(sum($revSql) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum($revSql * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  ${decSum("l_quantity")} / count(*) AS avg_qty,
        |  ${decSum("l_extendedprice")} / count(*) AS avg_price,
        |  ${decSum("l_discount")} / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      s"""SELECT n_name, CAST(sum($revSql) AS DOUBLE) AS revenue, count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q118_salted_join" ->
      // deliberately the PLAIN join: hash-matching it proves the salted
      // plan changes the shuffle layout and nothing else
      s"""SELECT s_suppkey, s_name, count(*) AS n_items,
        |  CAST(sum($revSql) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,
    "q03_top_orders" ->
      s"""SELECT o_orderkey, o_orderstatus, revenue FROM orders
        |JOIN (SELECT l_orderkey, CAST(sum($revSql) AS DOUBLE) AS revenue
        |      FROM lineitem GROUP BY l_orderkey) r ON o_orderkey = l_orderkey
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_anti_join" ->
      """SELECT n_name, count(*) AS n_customers FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q06_left_join_histogram" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_custkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q07_full_outer" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |  coalesce(c_cnt, 0) AS customers, coalesce(s_cnt, 0) AS suppliers
        |FROM (SELECT c_nationkey, count(*) AS c_cnt FROM customer GROUP BY c_nationkey) cn
        |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS s_cnt FROM supplier GROUP BY s_nationkey) sn
        |  ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q08_cross_join" ->
      """SELECT r_name, o_orderstatus, r_name || '/' || o_orderstatus AS cell
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q09_range_join" -> q09Sql,
    // q185 is the rule's rewrite of q09's plan — same oracle
    "q185_range_rule" -> q09Sql,
    "q10_theta_join" ->
      s"""SELECT p_brand, count(*) AS n_items, ${decSum("l_extendedprice")} AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q11_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk,
        |    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drk
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q12_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q13_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) OVER w_run AS DOUBLE) AS running_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) OVER w_mov AS DOUBLE) / count(*) OVER w_mov AS moving_avg4
        |FROM lineitem
        |WINDOW
        |  w_run AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_mov AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_price""".stripMargin,
    "q14_fill_forward" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q15_distribution" ->
      """SELECT p_brand, p_partkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q16_offset_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 8 OFFSET 1""".stripMargin,
    "q17_union_all" ->
      """SELECT nationkey, count(*) AS n_rows FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q18_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q19_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q20_first_wins_dedup" ->
      """SELECT o_custkey, o_orderstatus, o_orderkey, o_orderdate FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey, o_orderstatus""".stripMargin,
    "q21_distinct_agg" ->
      s"""SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(*) AS n_orders,
        |  ${decSum("o_totalprice")} AS sum_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q22_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows, ${decSum("l_quantity")} AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q23_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders, ${decSum("o_totalprice")} AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q24_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS upper_name,
        |  substring(p_name, 1, 8) AS prefix8,
        |  p_brand || '|' || p_type AS brand_type,
        |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  to_base64(p_name::BLOB) AS name_b64,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS no_vowels
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q25_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  quarter(o_orderdate) AS q, dayofyear(o_orderdate) AS doy,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
        |  ['Jan.','Feb.','Mar.','Apr.','May','Jun.','Jul.','Aug.','Sep.','Oct.','Nov.','Dec.'][month(o_orderdate)]
        |    || ' ' || CAST(day(o_orderdate) AS VARCHAR) || ', ' || CAST(year(o_orderdate) AS VARCHAR) AS pretty_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q26_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q27_case_when" ->
      s"""SELECT band, count(*) AS n_customers, ${decSum("c_acctbal")} AS sum_bal
        |FROM (SELECT c_acctbal,
        |        CASE WHEN c_acctbal < 0 THEN 'negative'
        |             WHEN c_acctbal < 3000 THEN 'low'
        |             WHEN c_acctbal < 7000 THEN 'mid'
        |             ELSE 'high' END AS band
        |      FROM customer)
        |GROUP BY band ORDER BY band""".stripMargin,
    "q28_custom_scalars" ->
      """SELECT p_partkey,
        |  regexp_replace(regexp_replace(replace(lower(trim(regexp_replace(p_name, '\s+', ' ', 'g'))), '&', ' and '), '[^a-z0-9]+', '_', 'g'), '^_+|_+$', '', 'g') AS slug,
        |  replace(replace(replace(replace(replace(p_name || ' & <"tags">', '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), chr(39), '&#39;') AS escaped,
        |  '2024-01-' || lpad(CAST(p_size % 28 + 1 AS VARCHAR), 2, '0') AS iso_from_text
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q29_tumbling_window" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, ${decSum("value")} AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q30_sessionize" ->
      s"""SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > $SessionGapUs THEN 1 ELSE 0 END AS new_session
        |    FROM (SELECT *, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |          FROM events)))
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)
}
