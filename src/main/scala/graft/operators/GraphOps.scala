package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.Engine.MaterializeSyntax

/** Graph analytics over data-derived graphs — the iterative-algorithm
  * surface of the engine (the near-dup connected components in LlmOps
  * is the third member of this family).
  *
  * The demo graph is the co-purchase graph: parts are nodes, and two
  * parts are linked when they appear in at least [[CoPurchaseMinOrders]]
  * common orders. It is built from `lineitem` alone, is deterministic,
  * and keeps non-trivial structure at every fixture scale (hundreds to
  * thousands of nodes/edges, triangles present).
  *
  * Determinism discipline for the oracle: PageRank runs entirely in
  * FIXED-POINT integer arithmetic (scaled longs, truncating division) —
  * integer sums are order-independent, so the result is bit-identical
  * across engines, partitionings, and cluster sizes. A floating-point
  * PageRank can never be hash-compared (per-partition sum order drifts).
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** Two parts are co-purchased when they share at least this many
    * orders (calibrated so the fixture graph is sparse but connected:
    * ~2.3k edges at sf0.001, ~3.4k at sf0.01).
    */
  val CoPurchaseMinOrders = 2L

  /** PageRank fixed-point scale (1e12: rank mass per node stays ≥ 1e8
    * at a million nodes, so truncating division keeps ~8 significant
    * digits; 85 × total mass ≈ 8.5e13 is far from long overflow).
    */
  val PrScale = 1000000000000L

  /** PageRank iterations (build-quality knob, not a correctness one —
    * the fixed-point arithmetic keeps every iteration oracle-matched).
    */
  val PageRankIters = 3

  /** Canonical co-purchase edge list (pa < pb, n_orders ≥ cut) WITH the
    * co-order count — q93/q94 project the structure, q116's association
    * rules consume the counts.
    *
    * Scale shape: the per-order pair expansion is quadratic in BASKET
    * size, not corpus size — baskets are bounded (an order has O(10)
    * items), so the expansion is a constant-factor flatMap. The pair
    * counting groupBy is map-side combinable; only (pa, pb, partial
    * count) triples shuffle. A skewed "mega-basket" would be the one
    * hazard at 100 TB; AQE skew-join handles the downstream joins and
    * the expansion itself can be capped per order upstream if a source
    * ever produces unbounded baskets.
    */
  private val edgeCache =
    new graft.SessionCache

  private val basketCache =
    new graft.SessionCache

  /** Per-order sorted distinct-part baskets — the ONE lineitem pass the
    * whole co-purchase family derives from (collect_set dedups
    * map-side). Cached per (session, dir) like the LlmOps signature
    * tables: the edge build AND q116's per-part supports / basket
    * total all read it, so within a session the lineitem scan + basket
    * shuffle run once (MEMORY_AND_DISK — spills, never recomputes).
    */
  private[operators] def orderBaskets(s: SparkSession, dir: String): DataFrame =
    basketCache.getOrElseUpdate(s, dir)(
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .cache())

  /** The thresholded pair counting over a basket table — basket form,
    * not a self-join: the ordered pairs explode map-side from the
    * sorted basket; a self-join on l_orderkey would shuffle the scan
    * twice and materialize the join; this ships each basket once. The
    * quadratic pair fan-out is per-basket (bounded, O(10) items),
    * never per-corpus.
    */
  private def basketPairs(baskets: DataFrame): DataFrame =
    baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> named_struct('pa', x, 'pb', y))))"))
        .as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= CoPurchaseMinOrders)

  private[operators] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    coPurchaseEdgesFrom(s, dir, orderBaskets(s, dir))

  private def coPurchaseEdgesFrom(s: SparkSession, dir: String,
      baskets: => DataFrame): DataFrame =
    edgeCache.getOrElseUpdate(s, dir)(
      // the thresholded edge list is ~n_edges ≪ the pair expansion
      // (3.6k rows at sf0.1): materialize it eagerly ONCE — q93's
      // iterations and q94's wedge joins then plan against a flat
      // in-memory table instead of replaying the expansion per
      // reference, and the pair-count scan never runs twice across
      // the q93/q94 pair (same per-(session, dir) discipline as the
      // LlmOps signature caches)
      basketPairs(baskets).materialize(true))

  /** q93: PageRank over the co-purchase graph — [[PageRankIters]]
    * damped iterations (d = 0.85) in fixed-point longs.
    *
    * Per iteration: ONE shuffle (the contribution sum, map-side
    * combinable) plus a co-partitioned join back to the node table —
    * the edge list and the rank table hash-partition on the same key,
    * so AQE reuses the layout across iterations. The symmetrized graph
    * has no dangling nodes (every node has out-degree ≥ 1), so no
    * dangling-mass redistribution step is needed. Teleport and damping
    * are integer expressions: r' = (0.15·S)/n + (85·Σ r_u div deg_u)
    * div 100, all truncating long division — identical on both engines.
    *
    * Input: canonical undirected edge list (columns (pa, pb), pa < pb)
    * → (node, deg, rank_fp).
    */
  def pageRank(e0: DataFrame, iters: Int = PageRankIters): DataFrame = {
    // null endpoints and self-loops are dropped ONCE here (same hygiene
    // as connectedComponents): a (x, x) edge would otherwise feed rank
    // back to its own node and a null would form a phantom node
    val e = e0.toDF("pa", "pb")
      .filter(col("pa").isNotNull && col("pb").isNotNull &&
        col("pa") =!= col("pb"))
    val edges = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    // node table: degree + per-corpus constants (teleport term, r0);
    // n arrives as a broadcast 1-row aggregate — one job, no collect.
    // Materialized once (node-table-sized): every iteration references
    // it twice, and a deep uncached lineage would replay the degree
    // aggregation 2×iters times and nest the codegen correspondingly.
    val base = deg.select(col("src").as("node"), col("deg"))
      .crossJoin(broadcast(nRow))
      .withColumn("tele", expr(s"(($PrScale * 15) div 100) div n"))
      .withColumn("r", expr(s"$PrScale div n"))
      .select(col("node"), col("deg"), col("tele"), col("r"))
      .materialize(true)
    // each round materializes its (node-table-sized) rank table so the
    // next round plans two flat-table joins instead of a lineage that
    // re-runs every earlier round's shuffles and recompiles their
    // codegen (the q62 connected-components lesson: per-round fixed
    // cost dominates small graphs — keep rounds flat and shallow)
    val ranks = (1 to iters).foldLeft(base) { (r, _) =>
      r.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), expr("r div deg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("cin"))
        .join(base.select(col("node"), col("deg"), col("tele")), Seq("node"))
        .withColumn("r", expr("tele + (85 * cin) div 100"))
        .select(col("node"), col("deg"), col("tele"), col("r"))
        .materialize(true)
    }
    ranks.select(col("node"), col("deg"), col("r").as("rank_fp"))
  }

  val q93PageRank: Q = (s, dir) => {
    pageRank(coPurchaseEdges(s, dir).select(col("pa"), col("pb")))
      .select(col("node").as("part_id"), col("deg"), col("rank_fp"))
      .orderBy(col("rank_fp").desc, col("part_id").asc)
  }

  /** q94: per-node triangle count + clustering coefficient over the
    * co-purchase graph — the basket-coherence / community-structure
    * diagnostic.
    *
    * Scale shape (Suri & Vassilvitskii, "Counting Triangles and the
    * Curse of the Last Reducer"): edges are ORIENTED from the
    * lower-(degree, id) endpoint to the higher, so every wedge is
    * enumerated at its lowest-degree vertex — the wedge fan-out is
    * bounded by graph arboricity instead of max degree, which is what
    * kills the naive formulation on power-law graphs (a celebrity node
    * with degree 1e6 would otherwise enumerate 1e12 wedges in one
    * task). Both joins are equi-joins; nothing is ever all-pairs.
    *
    * Input: canonical undirected edge list (columns (pa, pb), pa < pb)
    * → (node, deg, n_triangles, clustering).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // edge-list-sized; referenced three times below (degrees, wedge
    // sides via `oriented`, and the closing join) — materialize once.
    // Null endpoints / self-loops dropped with the same policy as
    // pageRank and connectedComponents.
    val e0 = edges.toDF("pa", "pb")
      .filter(col("pa").isNotNull && col("pb").isNotNull &&
        col("pa") =!= col("pb"))
      .materialize(true)
    val deg = e0.select(col("pa").as("node"))
      .unionAll(e0.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient each canonical edge low→high by (degree, id)
    val withDeg = e0
      .join(deg.select(col("node").as("pa"), col("deg").as("dega")), Seq("pa"))
      .join(deg.select(col("node").as("pb"), col("deg").as("degb")), Seq("pb"))
    val oriented = withDeg.select(
      when(col("dega") < col("degb") ||
        (col("dega") === col("degb") && col("pa") < col("pb")),
        struct(col("pa").as("lo"), col("pb").as("hi")))
        .otherwise(struct(col("pb").as("lo"), col("pa").as("hi")))
        .as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges at the low vertex; id-ordered so each wedge appears once
    val l = oriented.select(col("lo").as("u"), col("hi").as("v"))
    val r = oriented.select(col("lo").as("u2"), col("hi").as("w"))
    val wedges = l.join(r, col("u") === col("u2") && col("v") < col("w"))
      .select(col("u"), col("v"), col("w"))
    // close the wedge against the canonical edge list (either direction)
    val tri = wedges.join(e0,
      least(col("v"), col("w")) === col("pa") &&
        greatest(col("v"), col("w")) === col("pb"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2, round(
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  val q94Triangles: Q = (s, dir) => {
    triangleStats(coPurchaseEdges(s, dir).select(col("pa"), col("pb")))
      .select(col("node").as("part_id"), col("deg"), col("n_triangles"),
        col("clustering"))
      .orderBy(col("part_id"))
  }

  /** Seed predicate for q117: node id below this is a BFS source. */
  val BfsSeedBelow = 50L

  /** BFS round cap — a correctness backstop far above any co-purchase
    * graph diameter, mirrored into the oracle's recursion bound.
    */
  val BfsMaxHops = 16

  /** Multi-source BFS hop counts over a canonical undirected edge list:
    * (node, hops) with hops = shortest hop distance to ANY seed.
    *
    * Frontier-based: each round expands only the nodes discovered in
    * the previous round (one equi-join + one left-anti against the
    * settled set, both map-side combinable aggregations after), and
    * the loop stops the first round that discovers nothing — O(diameter)
    * rounds, per-round shuffles proportional to the FRONTIER, never
    * the graph. The settled table is materialized per round (the q62
    * lesson: keep iterative lineage flat). Hop counts are integers, so
    * the result is deterministic under any partitioning.
    */
  def bfsHops(e0: DataFrame, seeds: DataFrame, maxRounds: Int = BfsMaxHops): DataFrame = {
    val e = e0.toDF("pa", "pb")
      .filter(col("pa").isNotNull && col("pb").isNotNull &&
        col("pa") =!= col("pb"))
    val edges = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
      .materialize(true)
    var frontier = seeds.toDF("node").distinct()
      .select(col("node"), lit(0L).as("hops"))
      .materialize(true)
    // the settled set is the UNION OF FRONTIERS — each frontier is its
    // round's eager checkpoint (plan flatness preserved), but the union
    // is left lazy: the old per-round `dist.unionAll(next).materialize`
    // re-copied EVERY settled node each round (O(rounds × nodes)
    // checkpoint traffic + one extra job per round) just to flatten a
    // union of already-flat tables. Frontiers are disjoint by
    // construction (the anti-join), so the union IS dist.
    val frontiers = scala.collection.mutable.ArrayBuffer(frontier)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val settled = frontiers.reduce(_ unionAll _)
      val next = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
        .join(settled.select(col("node")), Seq("node"), "left_anti")
        .materialize(true)
      if (next.isEmpty) done = true
      else {
        frontiers += next
        frontier = next
      }
    }
    frontiers.reduce(_ unionAll _)
  }

  /** q117: product blast radius — hop distance from the seed set
    * (part_id < [[BfsSeedBelow]], e.g. a recall list) to every product
    * reachable through shared baskets; unreachable parts report -1.
    * The traversal member of the graph family next to components (q62)
    * and PageRank (q93).
    */
  val q117BfsHops: Q = (s, dir) => {
    val e0 = coPurchaseEdges(s, dir).select(col("pa"), col("pb"))
    val nodes = e0.select(col("pa").as("node"))
      .unionAll(e0.select(col("pb").as("node"))).distinct()
    val seeds = nodes.filter(col("node") < BfsSeedBelow)
    val dist = bfsHops(e0, seeds)
    nodes.join(dist, Seq("node"), "left")
      .select(col("node").as("part_id"),
        coalesce(col("hops"), lit(-1L)).as("hops"))
      .orderBy(col("part_id"))
  }

  /** Rules reported by q116. */
  val AssocTopK = 25

  /** q116: association rules over co-purchase pairs — support,
    * directional confidence, and lift for the part pairs that share
    * baskets (the frequent-itemset / market-basket staple, k = 2).
    * Reuses the cached co-purchase counts; the per-part supports are
    * one map-side-combinable count and join back as a dimension-sized
    * table; the basket total is a broadcast 1-row aggregate. Ranking
    * on rounded lift with (pa, pb) tiebreaks keeps the top-k
    * engine-stable.
    */
  val q116AssocRules: Q = (s, dir) => {
    // ONE lineitem pass feeds everything (guide §1.2/§2.4): the cached
    // basket table is shared by the edge build, the per-part supports
    // (explode of the deduped baskets ≡ the old distinct-(okey, part)
    // groupBy — collect_set already dedups), and the basket total (one
    // basket row per distinct l_orderkey ≡ the old double-distinct
    // count). The old form planned the (okey, part)-distinct subtree
    // twice more on top of the edge build's own scan: 3 lineitem scans
    // + 2 distinct shuffles → 1 scan + 1 basket shuffle, cached.
    val baskets = orderBaskets(s, dir)
    val nOrders = baskets.agg(count(lit(1)).as("nt"))
    val psup = baskets.select(explode(col("ps")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("c_part"))
    coPurchaseEdgesFrom(s, dir, baskets)
      .withColumnRenamed("n_orders", "c_ab")
      .join(psup.select(col("part").as("pa"), col("c_part").as("c_a")), Seq("pa"))
      .join(psup.select(col("part").as("pb"), col("c_part").as("c_b")), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("c_ab").cast("double") / col("nt"), 6).as("support"),
        round(col("c_ab").cast("double") / col("c_a"), 6).as("conf_a_b"),
        round(col("c_ab").cast("double") / col("c_b"), 6).as("conf_b_a"),
        round(col("nt") * col("c_ab").cast("double") /
          (col("c_a") * col("c_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("pa").asc, col("pb").asc)
      .limit(AssocTopK)
  }

  val queries: Map[String, Q] = Map(
    "q93_pagerank" -> q93PageRank,
    "q94_triangles" -> q94Triangles,
    "q116_assoc_rules" -> q116AssocRules,
    "q117_bfs_hops" -> q117BfsHops)

  // ---- DuckDB oracle dialect ----

  /** Shared CTE chain: distinct (order, part) → canonical co-purchase
    * edges (mirrors [[coPurchaseEdges]] verbatim).
    */
  private val edgeCtesD =
    s"""lp AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
       |e0 AS (
       |  SELECT a.part AS pa, b.part AS pb, count(*) AS c_ab
       |  FROM lp a JOIN lp b ON a.okey = b.okey AND a.part < b.part
       |  GROUP BY 1, 2 HAVING count(*) >= $CoPurchaseMinOrders)""".stripMargin

  /** One unrolled fixed-point PageRank iteration (same integer formula
    * as the Spark side; `//` is DuckDB's truncating division for the
    * positive operands used here, matching Spark's `div`). The sum is
    * cast to BIGINT: DuckDB's integer `sum` returns HUGEINT, which
    * survives `//` and round-trips through parquet as DOUBLE — the
    * engine emits BIGINT, so an uncast oracle hash-mismatches on a
    * value-identical result (CORRECTNESS r5/r6 q93).
    */
  private def prIterD(prev: String, curr: String): String =
    s"""$curr AS (
       |  SELECT d.node, d.deg, d.tele,
       |    d.tele + (85 * CAST(sum(r.r // r.deg) AS BIGINT)) // 100 AS r
       |  FROM $prev r JOIN edges e ON r.node = e.src
       |  JOIN $prev d ON d.node = e.dst
       |  GROUP BY d.node, d.deg, d.tele)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q93_pagerank" ->
      // the iteration chain is GENERATED from PageRankIters so tuning
      // the knob can never silently desynchronize query and oracle
      s"""WITH $edgeCtesD,
        |edges AS (SELECT pa AS src, pb AS dst FROM e0
        |          UNION ALL SELECT pb, pa FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |n AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT src AS node, deg,
        |         (($PrScale * 15) // 100) // n.n AS tele,
        |         $PrScale // n.n AS r
        |       FROM deg, n),
        |${(1 to PageRankIters).map(i => prIterD(s"r${i - 1}", s"r$i")).mkString(",\n")}
        |SELECT node AS part_id, deg, r AS rank_fp FROM r$PageRankIters
        |ORDER BY rank_fp DESC, part_id ASC""".stripMargin,
    "q94_triangles" ->
      s"""WITH $edgeCtesD,
        |deg AS (SELECT node, count(*) AS deg FROM (
        |          SELECT pa AS node FROM e0 UNION ALL SELECT pb FROM e0)
        |        GROUP BY node),
        |tri AS (
        |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |  FROM e0 e1 JOIN e0 e2 ON e2.pa = e1.pb
        |  JOIN e0 e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |pn AS (SELECT node, count(*) AS n_triangles FROM (
        |         SELECT unnest([a, b, c]) AS node FROM tri)
        |       GROUP BY node)
        |SELECT deg.node AS part_id, deg.deg,
        |  coalesce(pn.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.deg >= 2 THEN round(
        |    2.0 * coalesce(pn.n_triangles, 0) / (deg.deg * (deg.deg - 1)), 6)
        |  ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN pn USING (node)
        |ORDER BY part_id""".stripMargin,
    "q116_assoc_rules" ->
      s"""WITH $edgeCtesD,
        |n AS (SELECT count(DISTINCT okey) AS nt FROM lp),
        |psup AS (SELECT part, count(*) AS c_part FROM lp GROUP BY part)
        |SELECT e0.pa, e0.pb, CAST(e0.c_ab AS BIGINT) AS c_ab,
        |  CAST(a.c_part AS BIGINT) AS c_a, CAST(b.c_part AS BIGINT) AS c_b,
        |  round(CAST(e0.c_ab AS DOUBLE) / n.nt, 6) AS support,
        |  round(CAST(e0.c_ab AS DOUBLE) / a.c_part, 6) AS conf_a_b,
        |  round(CAST(e0.c_ab AS DOUBLE) / b.c_part, 6) AS conf_b_a,
        |  round(n.nt * CAST(e0.c_ab AS DOUBLE) / (a.c_part * b.c_part), 6) AS lift
        |FROM e0
        |JOIN psup a ON e0.pa = a.part
        |JOIN psup b ON e0.pb = b.part, n
        |ORDER BY lift DESC, pa ASC, pb ASC LIMIT $AssocTopK""".stripMargin,
    "q117_bfs_hops" ->
      s"""WITH RECURSIVE $edgeCtesD,
        |edges AS (SELECT pa AS src, pb AS dst FROM e0
        |          UNION ALL SELECT pb, pa FROM e0),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |walk(node, hops) AS (
        |  SELECT node, 0 FROM nodes WHERE node < $BfsSeedBelow
        |  UNION
        |  SELECT e.dst, w.hops + 1 FROM walk w JOIN edges e ON e.src = w.node
        |  WHERE w.hops < $BfsMaxHops),
        |dist AS (SELECT node, min(hops) AS hops FROM walk GROUP BY node)
        |SELECT n.node AS part_id, CAST(coalesce(d.hops, -1) AS BIGINT) AS hops
        |FROM nodes n LEFT JOIN dist d USING (node)
        |ORDER BY part_id""".stripMargin)
}
