package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the properties that make these queries
  * survive a 100 TB / 1000-executor scale-up (SURVEY.md §4). A plan that
  * silently loses its pushdown, broadcast, or top-k shortcut would still
  * pass value checks; these tests pin the plan shape itself.
  */
class PlanSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def codegenPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)

  test("q01: shipdate predicate reaches the parquet scan, columns pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    // only 7 of 11 lineitem columns are read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_partkey"), "unused column not pruned from scan")
  }

  test("q02: dimension joins are broadcast, fact join is not a nested loop") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q03: global top-10 is TakeOrderedAndProject, not a full sort") {
    assert(plan("q03_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "no partial aggregation found")
  }

  test("q11: rank filter uses WindowGroupLimit (per-group top-k pushdown)") {
    assert(plan("q11_window_rank").contains("WindowGroupLimit"))
  }

  // NB: CodegenMode on a not-yet-executed AQE plan with a top-level
  // global sort reports "Found 0 WholeStageCodegen subtrees" (stages
  // collapse only at execution), so codegen is asserted on the
  // scan→project stage without the final presentation sort.
  private def codegenSubtrees(df: org.apache.spark.sql.DataFrame): Int = {
    val s = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(0)
  }

  test("q24: narrow string pipeline is whole-stage codegen'd") {
    import org.apache.spark.sql.functions._
    val df = Engine.table(spark, dir, "part")
      .select(upper(col("p_name")).as("u"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("n"),
        base64(col("p_name").cast("binary")).as("b"))
    assert(codegenSubtrees(df) >= 1)
  }

  test("q44: exact dedup is a single hash-shuffle") {
    val p = plan("q44_exact_dedup")
    assert(p.split("Exchange").length - 1 <= 2,
      s"too many shuffles in exact dedup:\n$p")
  }

  test("q47: set-similarity join is an equi hash join, never a cross product") {
    val p = plan("q47_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q48: query side is broadcast against the corpus scan") {
    assert(plan("q48_cosine_topk").contains("BroadcastExchange"))
  }

  test("q43: fingerprint loops are native expressions — no encoder boundary") {
    val p = plan("q43_fingerprint")
    assert(!p.contains("DeserializeToObject") && !p.contains("MapPartitions"),
      s"q43 should not leave the codegen'd row pipeline:\n$p")
    import org.apache.spark.sql.functions._
    import graft.functions.Scalars._
    val df = Engine.table(spark, dir, "documents")
      .select(min_gram_hash(lower(col("text"))).as("g"),
        min_rolling_hash(lower(col("text"))).as("r"))
    assert(codegenSubtrees(df) >= 1)
  }

  test("q47: shingling is a native expression — no encoder boundary") {
    val p = plan("q47_ngram_jaccard")
    assert(!p.contains("DeserializeToObject") && !p.contains("MapPartitions"),
      s"q47 should not leave the codegen'd row pipeline:\n$p")
  }

  test("q58: sample reads only the needed columns; selection is map-side") {
    val p = plan("q58_stratified_sample")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("text"), "sampling must not read document bodies")
    // one exchange only: the presentation sort (selection itself never shuffles)
    assert(p.split("Exchange").length - 1 <= 1, s"sampling shuffled:\n$p")
  }

  test("q46: SimHash signatures compute map-side — only the presentation sort shuffles") {
    // per-document Simhash60 kernel: no explode, no aggregation; the one
    // Exchange is the final orderBy (was: explode(token)×explode(bit)
    // through two aggregations — three shuffles of 60 rows per token)
    val p = plan("q46_simhash")
    assert(p.split("Exchange").length - 1 <= 1, s"signature computation shuffled:\n$p")
    assert(!p.contains("Generate"), s"no explode expected:\n$p")
  }

  test("q70: repetition stats are a narrow projection — only the presentation sort shuffles") {
    val p = plan("q70_repetition_stats")
    assert(p.split("Exchange").length - 1 <= 1, s"repetition stats shuffled:\n$p")
    assert(!p.contains("Generate"), s"no explode expected:\n$p")
  }

  test("q36: percentile windows operate on distinct values after a partial-agg shuffle") {
    val p = plan("q36_percentiles")
    // the (flag, qty) count aggregation runs BEFORE any Window — windows
    // see the distinct value domain, not rows
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"no map-side combine before the percentile window:\n$p")
  }

  test("q64: chunk offsets broadcast back to the corpus (two-level prefix sum)") {
    // the offsets table is corpus/G rows, so the code carries NO forced
    // hint (a forced broadcast of a corpus-proportional table is a
    // 100 TB OOM); at this SF, AQE must still convert the join-back to
    // a broadcast at runtime from the actual materialized size
    assert(finalPlan("q64_sequence_packing").contains("BroadcastExchange"),
      "AQE should runtime-broadcast the small chunk-offset table")
  }

  test("q65/q67: corpus-size literals are broadcast 1-row aggregates, not driver actions") {
    // the count lives IN the plan (broadcast cross join of a 1-row
    // aggregate) instead of a driver-side count() job per query
    assert(plan("q65_tfidf").contains("BroadcastNestedLoopJoin BuildRight, Cross"))
    assert(plan("q67_lm_score").contains("BroadcastNestedLoopJoin BuildRight, Cross"))
  }

  test("q59: vocab count aggregates map-side before the shuffle") {
    val p = plan("q59_vocab_topk")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"no partial aggregation in vocab build:\n$p")
  }

  test("q63: interval join is a hash/merge equi-join on user, not a cross product") {
    val p = plan("q63_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated:\n$p")
  }

  test("q37: correlated subqueries decorrelate to joins, never per-row replans") {
    val p = plan("q37_correlated")
    // the scalar agg becomes an aggregate+join, EXISTS becomes a semi
    // join; nothing should survive as a nested-loop or cartesian shape
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery did not decorrelate:\n$p")
    assert(p.contains("Join"), s"expected decorrelated joins:\n$p")
  }

  // AQE resolves exchange reuse at runtime, so these properties are
  // only visible on the executed final plan (the Initial Plan section
  // repeats the un-reused original and is stripped before counting).
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def scans(p: String): Int = "Scan parquet".r.findAllIn(p).size

  test("q73: ingest-select is single-pass — one scan, min_by dedup, no join") {
    val p = finalPlan("q73_ingest_select")
    // r17: the per-hash canonical row comes from ONE map-side-combinable
    // min_by aggregation; the old canonical-set branch (second scan +
    // semi join) is gone
    assert(scans(p) == 1, s"expected a single corpus scan:\n$p")
    assert(p.contains("min_by"), s"canonical row should be a min_by aggregate:\n$p")
    assert(!p.contains("Join"), s"no join should remain:\n$p")
  }

  test("q74: bigram/unigram count exchanges are computed once and reused") {
    val p = finalPlan("q74_pmi_collocations")
    assert(p.contains("ReusedExchange"),
      s"totals should reuse the count exchanges, not rescan:\n$p")
    assert(scans(p) <= 2, s"PMI should scan the corpus at most twice:\n$p")
  }

  test("q75: the (source,word) count exchange feeds every downstream aggregate") {
    val p = finalPlan("q75_source_mix_kl")
    assert(p.contains("ReusedExchange"), s"per-source/corpus totals should reuse:\n$p")
    assert(scans(p) <= 2, s"KL should scan the corpus at most twice:\n$p")
  }

  test("q76: boilerplate df join is an equi-join (AQE-splittable), never a cross product") {
    val p = finalPlan("q76_boilerplate_ngrams")
    assert(scans(p) <= 2)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q69: training side carries a runtime Bloom probe before the contamination join") {
    val p = finalPlan("q69_decontaminate")
    // the probe must survive into the executed plan (map-side, pre-shuffle) ...
    assert(p.contains("might_contain"),
      s"expected a bloom might_contain probe on the training side:\n$p")
    // ... and the exact equi-join must still run after it (the bloom is
    // a superset filter, not the join itself)
    assert(p.contains("Join"), s"expected the exact contamination join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q81: shard write parallelism is corpus-proportional (REBALANCE, no single-task funnel)") {
    val p = graft.sources.TrainingShards
      .shardPlan(Engine.table(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    // the write-side exchange must be an AQE-splittable rebalance on the
    // partition keys — a repartition would pin one task per (lang,bucket)
    // group however large, a coalesce(1) would serialize the whole write
    assert(p.contains("REBALANCE_PARTITIONS_BY_COL"),
      s"expected a rebalance exchange on (lang, bucket):\n$p")
    assert(!p.contains("SinglePartition") && !p.contains("Coalesce"),
      s"shard write must never funnel through one task:\n$p")
  }

  test("q88: split/shard assignment is pure map-side — only the presentation sort shuffles") {
    val p = plan("q88_dataset_split")
    assert(p.split("Exchange").length - 1 <= 1,
      s"split assignment must not shuffle:\n$p")
    assert(!p.contains("text"), "split assignment must not read document bodies")
  }

  test("q87: snapshot manifests join doc_id-equi, texts hash map-side") {
    val p = plan("q87_snapshot_delta")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"manifest diff degenerated:\n$p")
    // the full-outer manifest join must see only (doc_id, hash) columns —
    // the text dies inside the project under each scan
    assert(p.contains("FullOuter"), s"expected a full-outer manifest join:\n$p")
  }

  test("q90: CDF windows run over the distinct (source, bucket) domain, not rows") {
    val p = plan("q90_quantile_norm")
    // the count aggregation (with map-side combine) runs BEFORE any Window
    assert(p.contains("partial_count"),
      s"no map-side combine before the CDF window:\n$p")
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      s"window should consume the bucket aggregate (plan prints top-down):\n$p")
  }

  test("q91: funnel is chained equi-joins on user_id — no windows, no cross products") {
    val p = plan("q91_funnel")
    assert(!p.contains("Window"), s"funnel must not use row windows:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"stage minima should combine map-side:\n$p")
  }

  test("q95: the verify pass filters the scan by the broadcast candidate set") {
    val p = finalPlan("q95_heavy_hitters")
    // pass 2's exact count must consume only candidate rows: the
    // semi-join against the k-sized candidate list is a broadcast, so
    // the full per-item count table never shuffles
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate filter should be a broadcast semi join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q98: fuzzy-join candidates come from a gram equi-join, never all-pairs") {
    val p = finalPlan("q98_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocking must keep the verify off the cross product:\n$p")
  }

  test("q99: pair counts aggregate map-side over the word-frequency table") {
    val p = finalPlan("q99_bpe_pairs")
    // corpus text is touched exactly once (one documents scan); the
    // pair explosion runs over the vocabulary-sized word table
    assert(scans(p) == 1, s"BPE counting should scan the corpus once:\n$p")
    assert(p.contains("partial_"), s"pair counts should map-side combine:\n$p")
  }

  test("q101: engagement collapses raw events before the window explode") {
    val p = finalPlan("q101_engagement")
    assert(scans(p) <= 2, s"DAU/WAU derive from (user, day) pairs:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q103: each profile branch prunes its scan to the profiled column") {
    val p = finalPlan("q103_column_profile")
    // every numeric branch reads exactly its one column (plus nothing)
    assert(p.contains("ReadSchema: struct<l_quantity:double>"),
      s"quantity branch should read only l_quantity:\n$p")
    assert(p.contains("ReadSchema: struct<l_returnflag:string>"),
      s"returnflag branch should read only l_returnflag:\n$p")
  }

  test("q104: anchors broadcast against one corpus scan; arg-max is a hash agg") {
    val p = finalPlan("q104_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"anchor set should broadcast:\n$p")
    assert(p.contains("max_by"), s"selection should be max_by hash agg, not a window:\n$p")
    assert(!p.toLowerCase.contains("window"), s"no per-anchor sort windows:\n$p")
  }

  test("q107: zone map is one pruned scan, no joins, map-side combinable") {
    val p = finalPlan("q107_zone_map")
    assert(scans(p) == 1, s"zone map should be a single pass:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      s"scan should prune to the three needed columns:\n$p")
    assert(!p.contains("Join"), s"no joins expected:\n$p")
  }

  test("q118: salted join actually salts — composite (key, salt) join, replicated build side") {
    val p = finalPlan("q118_salted_join")
    assert(p.contains("__salt"),
      s"join should run on the composite (key, __salt) pair:\n$p")
    assert(p.toLowerCase.contains("explode"),
      s"build side should replicate across salts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q110: interpolation windows are per-user, never a global single partition") {
    val p = finalPlan("q110_interpolate")
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    assert(windows.forall(_.contains("user_id")),
      s"every window must partition on the entity key:\n${windows.mkString("\n")}")
  }

  test("q121: retention aggregates map-side and broadcasts cohort sizes") {
    val p = finalPlan("q121_retention_cohorts")
    assert(p.contains("partial_"), "distinct/agg must partial-aggregate map-side")
    assert(p.contains("BroadcastHashJoin"),
      s"cohort-size join (weeks-many rows) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q122: every event-log window partitions on the entity key") {
    val windows = finalPlan("q122_markov_transitions")
      .linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty)
    // the event-scale windows (sessionize + lead) must be per-user; the
    // p-normalization window runs over the |types|²-row AGGREGATE and
    // legitimately partitions by src
    val eventWindows = windows.filter(w =>
      w.contains("lead(") || w.contains("lag(") || w.contains("session"))
    assert(eventWindows.nonEmpty)
    assert(eventWindows.forall(_.contains("user_id")),
      s"event-log windows must be per-user, never a single global partition:\n${windows.mkString("\n")}")
  }

  test("q123: Count-Min sketch partial-aggregates before the shuffle") {
    val p = plan("q123_cms_sketch")
    assert(p.contains("partial_count_min"),
      s"each task must condense its partition into one sketch buffer:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row sketch must broadcast against the queried keys")
  }

  test("q125: shard manifest is one map-side-combinable aggregation") {
    val p = finalPlan("q125_shard_manifest")
    assert(p.contains("partial_"), "manifest sums must partial-aggregate")
    // groupBy(shard) + final presentation sort are the only exchanges
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"unexpected extra shuffles ($exchanges):\n$p")
  }

  test("q126: per-user collapse shuffles once; pooled stats broadcast back") {
    val p = finalPlan("q126_ab_test")
    assert(p.contains("partial_"), "user collapse must partial-aggregate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row pooled statistics must broadcast")
    assert(scans(p) <= 2, "the event log is scanned at most twice (arms + pooled)")
  }

  test("q161/q162: final top-k is the bounded heap, not a corpus window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def windows(name: String): Seq[WindowExec] = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
        p.collect {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case w: WindowExec => Seq(w)
        }.flatten
      walk(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
    }
    // VERDICT r10 item 2: the scored candidate set (10 × corpus rows)
    // must never pass through a WindowExec sort — top-3 per probe is
    // the BoundedTopK map-side heap. q161 plans ZERO windows; q162
    // keeps only the nprobe cell-assignment window (`crn`) over the
    // 10-probe × 16-centroid frame — probe-sized by construction, and
    // allowed to appear more than once (the probe subtree feeds both
    // the qc-dot and LUT branches).
    assert(windows("q161_pq_adc").isEmpty,
      "q161 must not sort the scored set through a window")
    val w162 = windows("q162_ivfpq")
    assert(w162.nonEmpty && w162.forall(_.windowExpression.exists(_.name == "crn")),
      s"q162 may window only the probe-side cell assignment (crn), got: " +
        w162.map(_.windowExpression.map(_.name).mkString(",")).mkString("; "))
    val p161 = plan("q161_pq_adc"); val p162 = plan("q162_ivfpq")
    assert(p161.contains("top_k") && p162.contains("top_k"),
      "bounded top_k aggregate missing from the final rank stage")
  }

  test("custom scalar expressions do not break whole-stage codegen") {
    import org.apache.spark.sql.functions._
    import graft.functions.Scalars._
    val df = Engine.table(spark, dir, "part")
      .select(slugify(col("p_name")).as("slug"),
        html_escape(col("p_type")).as("esc"),
        stable_hash64(col("p_name")).as("h"))
    assert(codegenSubtrees(df) >= 1)
    // the generated code actually calls into the static impls
    assert(df.queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
      .contains("graft.functions.ScalarOps"))
  }
}
