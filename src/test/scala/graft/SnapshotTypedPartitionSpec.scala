package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotStore, SnapshotTableSource}

/** Round 16 — TYPED identity partitioning (VERDICT r15 what's-missing
  * 5): a LONG partition column's key groups, exchange elision,
  * storage-partitioned joins, file pruning and metadata-answered
  * GROUP BY all carry the column's true type (the manifest keeps the
  * value canonically as a string; the scan re-types from the table
  * schema).
  */
class SnapshotTypedPartitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def wholePlan(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => wholePlan(a.executedPlan)
      case other => Seq(other)
    }.flatten
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    wholePlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }
  private def spjConfs(): Unit = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
  }

  private def seed(): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tpart_").toString
    val root = s"$d/tbl"
    val df = (1L to 300L).map(i => (i, i % 5L, i * 2L)).toDF("doc_id", "grp", "v")
    SnapshotStore.appendPartitioned(spark, root,
      df.filter(col("doc_id") % 2 === 0), "grp")
    SnapshotStore.appendPartitioned(spark, root,
      df.filter(col("doc_id") % 2 === 1), "grp")
    root
  }

  private def load(root: String) =
    spark.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load()

  test("a LONG-partitioned store: GROUP BY elides the exchange, keys stay BIGINT") {
    val root = seed()
    load(root).createOrReplaceTempView("tpart_spec")
    spjConfs()
    val q = spark.sql(
      """SELECT grp, count(*) AS n, sum(v) AS sv
        |FROM tpart_spec WHERE doc_id > 0 GROUP BY grp""".stripMargin)
    assert(q.schema("grp").dataType ==
      org.apache.spark.sql.types.LongType, "the key must stay BIGINT")
    val expect = (1L to 300L).map(i => (i, i % 5L, i * 2L))
      .groupBy(_._2).toSeq
      .map { case (g, xs) => (g, xs.size.toLong, xs.map(_._3).sum) }
    import spark.implicits._
    assert(rows(q) == rows(expect.toDF("grp", "n", "sv")))
    // the doc_id predicate keeps the scan on the data path (metadata
    // agg declines) — so the ZERO below is the key-group elision
    assert(shuffles(q) == 0,
      s"the long-keyed rollup must not exchange:\n${q.queryExecution.executedPlan}")
  }

  test("two LONG-partitioned stores join on the partition column with zero exchanges") {
    val root = seed()
    spjConfs()
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      load(root).createOrReplaceTempView("tpart_a")
      load(root).createOrReplaceTempView("tpart_b")
      val q = spark.sql(
        """SELECT a.grp AS grp, count(*) AS n
          |FROM tpart_a a JOIN tpart_b b ON a.grp = b.grp
          |GROUP BY a.grp""".stripMargin)
      import spark.implicits._
      val sizes = (1L to 300L).groupBy(_ % 5L).view.mapValues(_.size.toLong)
      val expect = sizes.map { case (g, c) => (g, c * c) }.toSeq
      assert(rows(q) == rows(expect.toDF("grp", "n")))
      assert(shuffles(q) == 0,
        s"co-partitioned long-keyed join must not exchange:\n" +
          q.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("equality on the LONG partition column prunes files; metadata GROUP BY answers typed") {
    val root = seed()
    val cur = SnapshotStore.currentSnapshot(spark, root)
    val total = SnapshotStore.manifest(spark, root, cur).count()
    load(root).createOrReplaceTempView("tpart_prune")
    val n = spark.sql("SELECT count(*) AS n FROM tpart_prune WHERE grp = 3")
      .head().getLong(0)
    assert(n == (1L to 300L).count(_ % 5L == 3L))
    val planned = SnapshotTableSource.lastPlannedFiles.get(root)
    assert(planned == 2,
      s"grp = 3 must keep exactly the two grp-3 files of $total: $planned")
    // metadata-answered GROUP BY with the LONG key type
    val g = spark.sql(
      "SELECT grp, count(*) AS n FROM tpart_prune GROUP BY grp ORDER BY grp")
    import spark.implicits._
    val expect = (1L to 300L).groupBy(_ % 5L).toSeq
      .map { case (k, xs) => (k, xs.size.toLong) }
    assert(rows(g) == rows(expect.toDF("grp", "n")))
    assert(g.schema("grp").dataType == org.apache.spark.sql.types.LongType)
    assert(SnapshotTableSource.lastAggPushed.get(root),
      "the typed grouped aggregation must answer from the manifest")
    assert(SnapshotTableSource.lastPlannedFiles.get(root) == 0)
    // NULL refusal holds for typed columns too
    import org.apache.spark.sql.functions.lit
    assertThrows[Exception] {
      SnapshotStore.appendPartitioned(spark, root,
        Seq((9999L, null.asInstanceOf[java.lang.Long], 1L))
          .toDF("doc_id", "grp", "v"), "grp")
    }
  }
}
