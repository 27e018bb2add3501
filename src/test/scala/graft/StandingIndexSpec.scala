package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StandingIndex

/** Standing-index invariants beyond the oracle gate:
  *
  *  - incremental-append (q160) == one-shot build (q156), bucket by
  *    bucket, inside Spark (the gate proves each against DuckDB; this
  *    pins them against EACH OTHER so a drift in either formulation
  *    fails here even before the gate runs);
  *  - LOOKUPS over the merged incremental artifact return exactly what
  *    they return over the one-shot artifact — the invariant that makes
  *    an append a safe index update;
  *  - term-bucket routing actually prunes: the lookup scan carries a
  *    partition filter on pbucket, so only the query terms' shard
  *    directories are read.
  */
class StandingIndexSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("q160 incremental manifest == q156 one-shot manifest (counts per bucket)") {
    val oneShot = SparkEntry.queries("q156_index_build")(spark, dir)
      .select("pbucket", "n_terms", "n_postings", "n_docs")
      .collect().map(_.toString).sorted.toSeq
    val inc = SparkEntry.queries("q160_index_delta")(spark, dir)
      .select("pbucket", "n_terms", "n_postings", "n_docs")
      .collect().map(_.toString).sorted.toSeq
    assert(inc == oneShot && inc.nonEmpty)
  }

  test("BM25 lookup over the merged incremental artifact == one-shot artifact") {
    SparkEntry.queries("q160_index_delta")(spark, dir).collect() // build _inc
    val base = StandingIndex.bm25Lookup(spark, StandingIndex.ensure(spark, dir))
      .collect().map(_.toString).toSeq
    val merged = StandingIndex.bm25Lookup(spark, s"${StandingIndex.indexRoot(dir)}_inc")
      .collect().map(_.toString).toSeq
    assert(merged == base && merged.nonEmpty)
  }

  test("delta append leaves the base segment's files in place (no rewrite)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = s"${StandingIndex.indexRoot(dir)}_inc"
    SparkEntry.queries("q160_index_delta")(spark, dir).collect()
    def files(): Map[String, Long] =
      Files.walk(Paths.get(root, "postings")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val after = files()
    // the base overwrite + delta append both happened inside one q160
    // run; a SECOND lengths/stats read must see exactly 2 stats rows
    // (base + delta segments), proving the delta appended instead of
    // rewriting the artifact
    val statRows = spark.read.parquet(s"$root/stats").count()
    assert(statRows == 2, s"expected 2 stats segment rows, got $statRows")
    assert(after.nonEmpty)
  }

  test("lookup scan partition-prunes to the query terms' buckets") {
    StandingIndex.ensure(spark, dir)
    val plan = SparkEntry.queries("q157_index_bm25")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pbucket"),
      s"no pbucket partition filter in plan:\n$plan")
  }
}
