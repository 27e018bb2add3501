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
    import org.apache.spark.sql.functions._
    import graft.operators.LlmOps
    // drive the two segment writes DIRECTLY so a before/after file
    // snapshot brackets the append (q160 does both inside one call)
    val root = Files.createTempDirectory("idx_append_audit").toString
    val docs = Engine.table(spark, dir, "documents")
      .withColumn("tok", expr(LlmOps.toksS))
      .withColumn("half", pmod(col("doc_id"), lit(2L)))
    StandingIndex.writeSegment(docs.filter(col("half") === 0), root, "overwrite")
    def files(): Map[String, Long] =
      Files.walk(Paths.get(root, "postings")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val before = files()
    assert(before.nonEmpty)
    StandingIndex.writeSegment(docs.filter(col("half") === 1), root, "append")
    val after = files()
    // every base file survives the append byte-untouched (same path,
    // same mtime) — the property that makes the delta an APPEND
    val touched = before.filter { case (p, t) => after.get(p) != Some(t) }
    assert(touched.isEmpty, s"append rewrote base files: ${touched.keys.take(3)}")
    assert(after.size > before.size, "append added no postings files")
    assert(spark.read.parquet(s"$root/stats").count() == 2)
    // and q160's own artifact ends at exactly 2 stats segment rows
    SparkEntry.queries("q160_index_delta")(spark, dir).collect()
    val statRows = spark.read.parquet(
      s"${StandingIndex.indexRoot(dir)}_inc/stats").count()
    assert(statRows == 2, s"expected 2 stats segment rows, got $statRows")
  }

  test("lookup scan partition-prunes to the query terms' buckets") {
    StandingIndex.ensure(spark, dir)
    val plan = SparkEntry.queries("q157_index_bm25")(spark, dir)
      .queryExecution.executedPlan.toString
    // a NON-EMPTY partition filter naming pbucket: FileSourceScanExec
    // prints "PartitionFilters: [...]" (possibly empty) on EVERY
    // partitioned read, so contains("PartitionFilters") alone would
    // pass even after a pruning regression
    val pruned = """PartitionFilters: \[[^\]]*pbucket[^\]]*\]""".r
      .findFirstIn(plan)
    assert(pruned.isDefined,
      s"no non-empty pbucket partition filter in plan:\n$plan")
  }

  test("q168 compaction collapses segment files and preserves lookups") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def bucketFiles(root: String): Map[String, Int] =
      Files.list(Paths.get(root, "postings")).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("pbucket="))
        .map { p =>
          p.getFileName.toString ->
            Files.list(p).iterator().asScala
              .count(_.toString.endsWith(".parquet"))
        }.toMap
    SparkEntry.queries("q168_index_compact")(spark, dir).collect()
    val inc = s"${StandingIndex.indexRoot(dir)}_inc"
    val cmp = s"${StandingIndex.indexRoot(dir)}_cmp"
    // pre-state: the incremental artifact carries its two segments —
    // at least one bucket has >1 postings file, stats has 2 rows
    val incFiles = bucketFiles(inc)
    assert(incFiles.values.exists(_ > 1),
      s"incremental artifact already compact: $incFiles")
    assert(spark.read.parquet(s"$inc/stats").count() == 2)
    // post-state: exactly ONE postings file in every compacted bucket,
    // ONE stats row, ONE lengths file
    val cmpFiles = bucketFiles(cmp)
    assert(cmpFiles.nonEmpty && cmpFiles.values.forall(_ == 1),
      s"compaction left multi-file buckets: $cmpFiles")
    assert(spark.read.parquet(s"$cmp/stats").count() == 1)
    assert(Files.list(Paths.get(cmp, "lengths")).iterator().asScala
      .count(_.toString.endsWith(".parquet")) == 1)
    // compaction must not lose or duplicate a single posting: the
    // BM25 lookup over the compacted root equals the lookup over the
    // incremental root AND the one-shot artifact
    val oneShot = StandingIndex.bm25Lookup(spark, StandingIndex.ensure(spark, dir))
      .collect().map(_.toString).toSeq
    val overInc = StandingIndex.bm25Lookup(spark, inc)
      .collect().map(_.toString).toSeq
    val overCmp = StandingIndex.bm25Lookup(spark, cmp)
      .collect().map(_.toString).toSeq
    assert(overCmp == overInc && overCmp == oneShot && overCmp.nonEmpty)
  }
}
