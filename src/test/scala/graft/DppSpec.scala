package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TrainingShards

/** q188 — dynamic partition pruning over the standing shard store.
  *
  * The dim side (top-2 languages by doc count) is runtime-only, so no
  * static predicate can prune the `lang=…/` partition directories; the
  * value of the partitioned layout at 100 TB is that Spark's
  * PartitionPruning rule plants a DynamicPruningExpression on the shard
  * scan anyway, reusing the dim's broadcast exchange. This spec pins
  * (a) the dynamic filter is IN THE PLAN on the scan's partition
  * filters, (b) the executed scan physically read fewer files than the
  * store holds — pruning observed, not inferred — and (c) the pruned
  * read computes exactly the full-scan answer.
  */
class DppSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

  /** All FileSourceScanExec nodes of the EXECUTED (final AQE) plan. */
  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FileSourceScanExec]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => out += f; f.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  private def shardFileCount(root: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(root))
  }

  test("q188 plan carries a dynamic partition filter and the scan reads fewer files") {
    val df = TrainingShards.q188DppShardRead(spark, dir)
    df.collect() // materialize so scan metrics are final
    val shardRoot = TrainingShards.shardOutDir(dir)
    val total = shardFileCount(shardRoot)
    assert(total > 0, s"no shard files under $shardRoot")

    val shardScans = scans(df).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(shardRoot)))
    assert(shardScans.nonEmpty, "no shard-store scan in the executed plan")
    val scan = shardScans.head
    assert(scan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      s"no DynamicPruningExpression on the shard scan's partition filters:\n" +
        scan.partitionFilters.mkString("\n"))

    val filesRead = scan.metrics("numFiles").value
    assert(filesRead > 0 && filesRead < total,
      s"expected pruned read (< $total files), scan read $filesRead")
  }

  test("q188 pruned read equals the unpruned raw-table computation") {
    val got = TrainingShards.q188DppShardRead(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // recompute from the raw table with no shard store in the path,
    // selecting langs by the same exact-integer mean-length rule
    val docs = Engine.table(spark, dir, "documents")
    val sel = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
      .collect()
      .collect { case r if r.getLong(2) > 300L * r.getLong(1) =>
        r.getString(0) -> r.getLong(1) }
      .toMap
    val want = docs
      .filter(col("lang").isin(sel.keys.toSeq.map(lit): _*))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), sel(r.getString(0))))
      .sortBy(_._1).toSeq
    assert(got == want, s"got $got\nwant $want")
    // the selection must be a strict, nonempty subset or the DPP test
    // above proves nothing at this corpus
    assert(got.nonEmpty && got.size < 5)
  }
}
