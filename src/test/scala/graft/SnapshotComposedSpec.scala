package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotStore, SnapshotTableSource}

/** COMPOSED identity × bucket layout (VERDICT r16 what's-missing 2):
  * one table carries BOTH claims — every data file holds exactly one
  * (partition value, bucket) pair, the scan reports the two-transform
  * `KeyGroupedPartitioning(identity(pcol), bucket(n, bcol))`, and one
  * store serves partition-pruned storage-partitioned joins AND
  * metadata-answered partition rollups at once. Maintenance preserves
  * both levels.
  */
class SnapshotComposedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def wholePlan(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => wholePlan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: wholePlan(q.plan)
      case other => Seq(other)
    }.flatten

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    wholePlan(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def spjConfs(): Unit = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
  }

  private def inputDf(shift: Long) =
    spark.range(1L, 2001L).select(
      (col("id") + shift).as("doc_id"),
      concat(lit("l"), (col("id") % 3).cast("string")).as("lang"),
      (col("id") * 3L).as("v"))

  test("appendComposed: single (value, bucket) files, both claims recorded, reads exact") {
    val d = java.nio.file.Files.createTempDirectory("graft_comp_").toString
    val root = s"$d/t"
    val df = inputDf(0L)
    SnapshotStore.appendComposed(spark, root, df, "lang", 4, "doc_id")
    assert(SnapshotStore.composedSpecOf(spark, root, 1L)
      .contains(("lang", 4, "doc_id")), "both claims must be recorded")
    val m = SnapshotStore.manifest(spark, root, 1L)
      .select("path", "part_val", "bucket_id").collect()
    assert(m.length == 12, "3 values × 4 buckets, one file each")
    m.foreach { r =>
      val f = spark.read.parquet(r.getString(0))
      assert(f.select("lang").distinct().collect()
        .map(_.getString(0)).toSeq == Seq(r.getString(1)))
      assert(f.select(pmod(col("doc_id"), lit(4L)).cast("int"))
        .distinct().collect().map(_.getInt(0)).toSeq ==
        Seq(r.getAs[Int]("bucket_id")),
        "every file holds exactly one bucket")
    }
    assert(rows(SnapshotStore.readSnapshot(spark, root, 1L)) == rows(df))
  }

  test("partition-pruned SPJ: two co-laid-out stores join with ZERO exchanges") {
    val d = java.nio.file.Files.createTempDirectory("graft_cspj_").toString
    val rootA = s"$d/a"
    val rootB = s"$d/b"
    SnapshotStore.appendComposed(spark, rootA, inputDf(0L), "lang", 4, "doc_id")
    SnapshotStore.appendComposed(spark, rootB,
      inputDf(0L).withColumn("v", col("v") + 1L), "lang", 4, "doc_id")
    spark.conf.set("spark.sql.catalog.graft_r17cx",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r17cx.base", d)
    spjConfs()
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // the two-key join covers both transforms → key groups align,
      // neither side exchanges
      val q = spark.sql(
        """SELECT a.lang AS lang, count(*) AS n, sum(b.v) AS sv
          |FROM graft_r17cx.a a JOIN graft_r17cx.b b
          |ON a.lang = b.lang AND a.doc_id = b.doc_id
          |GROUP BY a.lang ORDER BY lang""".stripMargin)
      val want = inputDf(0L).select(col("lang"), (col("v") + 1L).as("bv"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("bv")).as("sv"))
        .orderBy("lang")
      assert(rows(q) == rows(want), "the SPJ must be semantically invisible")
      assert(shuffles(q) <= 2,
        s"the join itself must not exchange (at most the rollup + sort):\n" +
          q.queryExecution.executedPlan)
      // the JOIN is exchange-free: a row-returning join plans ZERO
      // exchanges anywhere (a global count would add its own
      // SinglePartition exchange, so assert on the bare join)
      val j = spark.sql(
        """SELECT a.doc_id, b.v FROM graft_r17cx.a a
          |JOIN graft_r17cx.b b
          |ON a.lang = b.lang AND a.doc_id = b.doc_id""".stripMargin)
      assert(j.collect().length == 2000)
      assert(shuffles(j) == 0,
        s"co-laid-out SPJ must skip both exchanges:\n" +
          j.queryExecution.executedPlan)
      // PARTITION-PRUNED: equality on the partition column prunes the
      // file lists on both sides and the join still never exchanges
      val p = spark.sql(
        """SELECT a.doc_id, b.v FROM graft_r17cx.a a
          |JOIN graft_r17cx.b b
          |ON a.lang = b.lang AND a.doc_id = b.doc_id
          |WHERE a.lang = 'l1'""".stripMargin)
      assert(p.collect().length == 667)
      assert(shuffles(p) == 0,
        s"a partition-pruned SPJ must stay exchange-free:\n" +
          p.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("metadata GROUP BY on the partition column still answers from the manifest") {
    val d = java.nio.file.Files.createTempDirectory("graft_cmeta_").toString
    val root = s"$d/t"
    SnapshotStore.appendComposed(spark, root, inputDf(0L), "lang", 4, "doc_id")
    spark.conf.set("spark.sql.catalog.graft_r17cg",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r17cg.base", d)
    val got = spark.sql(
      "SELECT lang, count(*) AS n FROM graft_r17cg.t GROUP BY lang ORDER BY lang")
    assert(rows(got) == rows(inputDf(0L).groupBy("lang")
      .agg(count(lit(1)).as("n")).orderBy("lang")))
    assert(SnapshotTableSource.lastAggPushed.get(root),
      "the composed store's per-file (part_val, n_rows) answers the rollup")
    assert(SnapshotTableSource.lastPlannedFiles.get(root) == 0)
  }

  test("maintenance preserves BOTH levels; DDL declares the composed layout the first INSERT honors") {
    val d = java.nio.file.Files.createTempDirectory("graft_cmnt_").toString
    val root = s"$d/t"
    SnapshotStore.appendComposed(spark, root, inputDf(0L), "lang", 4, "doc_id")
    SnapshotStore.appendComposed(spark, root, inputDf(2000L), "lang", 4, "doc_id")
    val before = rows(SnapshotStore.readSnapshot(spark, root, 2L))
    val k = SnapshotStore.compact(spark, root)
    assert(SnapshotStore.composedSpecOf(spark, root, k)
      .contains(("lang", 4, "doc_id")),
      "compaction must re-lay BOTH levels, not halve the layout")
    assert(rows(SnapshotStore.readSnapshot(spark, root, k)) == before)
    assert(SnapshotStore.manifest(spark, root, k).count() == 12L,
      "compaction lands one file per (value, bucket) pair")
    // DDL: CREATE TABLE with identity + bucket declares composed; the
    // first INSERT through the catalog honors it
    spark.conf.set("spark.sql.catalog.graft_r17cd",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r17cd.base", d)
    spark.sql("CREATE TABLE graft_r17cd.t2 (doc_id BIGINT, lang STRING, " +
      "v BIGINT) PARTITIONED BY (lang, bucket(4, doc_id))")
    inputDf(0L).createOrReplaceTempView("composed_src_spec")
    spark.sql("INSERT INTO graft_r17cd.t2 " +
      "SELECT doc_id, lang, v FROM composed_src_spec")
    val root2 = s"$d/t2"
    val k2 = SnapshotStore.currentSnapshot(spark, root2)
    assert(SnapshotStore.composedSpecOf(spark, root2, k2)
      .contains(("lang", 4, "doc_id")),
      "the DDL-declared composed layout must govern the first INSERT")
    assert(rows(spark.sql("SELECT * FROM graft_r17cd.t2")) ==
      rows(inputDf(0L).select("doc_id", "lang", "v")))
    // a second INSERT preserves it
    inputDf(5000L).createOrReplaceTempView("composed_src2_spec")
    spark.sql("INSERT INTO graft_r17cd.t2 " +
      "SELECT doc_id, lang, v FROM composed_src2_spec")
    assert(SnapshotStore.composedSpecOf(spark, root2,
      SnapshotStore.currentSnapshot(spark, root2))
      .contains(("lang", 4, "doc_id")))
  }
}
