package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene for the driver contract: `SparkEntry.queries` and
  * `oracleSql` are built by ++-merging eleven per-module maps, and Map
  * concatenation silently keeps the LAST binding — a duplicated query
  * name would drop an operator from the board with no compile error
  * and no test failure anywhere else. This spec makes that failure
  * loud.
  */
class QueryRegistrySpec extends AnyFunSuite {

  private val moduleMaps: Seq[(String, Set[String])] = Seq(
    "Relational" -> operators.Relational.queries.keySet,
    "LlmOps" -> operators.LlmOps.queries.keySet,
    "Multimodal" -> operators.Multimodal.queries.keySet,
    "RumorPipeline" -> operators.RumorPipeline.queries.keySet,
    "PipelineOps" -> operators.PipelineOps.queries.keySet,
    "GraphOps" -> operators.GraphOps.queries.keySet,
    "AnalyticsOps" -> operators.AnalyticsOps.queries.keySet,
    "JoinPlanner" -> operators.JoinPlanner.queries.keySet,
    "IndexOps" -> operators.IndexOps.queries.keySet,
    "StatsOps" -> operators.StatsOps.queries.keySet,
    "TrainingShards" -> sources.TrainingShards.queries.keySet,
    "JsonlCorpus" -> sources.JsonlCorpus.queries.keySet,
    "StandingIndex" -> sources.StandingIndex.queries.keySet,
    "SimIndex" -> sources.SimIndex.queries.keySet,
    "BucketStore" -> sources.BucketStore.queries.keySet,
    "ClusteredStore" -> sources.ClusteredStore.queries.keySet,
    "MatView" -> sources.MatView.queries.keySet,
    "SnapshotStore" -> sources.SnapshotStore.queries.keySet)

  test("no query name is defined by two modules (Map ++ would shadow one)") {
    val all = moduleMaps.flatMap { case (m, ks) => ks.map(_ -> m) }
    val dup = all.groupBy(_._1).filter(_._2.size > 1)
      .map { case (q, ms) => s"$q in ${ms.map(_._2).mkString(", ")}" }
    assert(dup.isEmpty, s"shadowed query names: $dup")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a runnable query; only q60 lacks an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // the one permanent rows-only query (COVERAGE.md: crawled-HTML
    // input, no DuckDB-expressible oracle can exist)
    assert(q -- o == Set("q60_rumor_pipeline"), s"unexpected oracle-less: ${q -- o}")
  }

  test("query names follow the driver's qNN_snake_case contract") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"malformed query names: $bad")
  }
}
