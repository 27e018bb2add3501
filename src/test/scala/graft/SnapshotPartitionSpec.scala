package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** q245 — IDENTITY-PARTITIONED commits (hidden partitioning): every
  * data file holds one value of a string partition column, the scan
  * reports `KeyGroupedPartitioning(identity(col))`, and GROUP BY /
  * joins on the partition column skip their exchanges — through the
  * catalog AND through plain `format().load()` views, because identity
  * transforms resolve with no function catalog.
  */
class SnapshotPartitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

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
  }

  test("GROUP BY the partition column runs with ZERO exchanges; values correct") {
    val root = SnapshotStore.ensurePartitioned(spark, dir)
    val tbl = SnapshotStore.catalogName(spark, root)
    spjConfs()
    val q = spark.sql(
      s"""SELECT lang, count(*) AS n, sum(n_chars) AS sc
         |FROM $tbl GROUP BY lang""".stripMargin)
    val docs = Engine.table(spark, dir, "documents")
    assert(rows(q) == rows(docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))),
      "partitioning must be semantically invisible")
    assert(shuffles(q) == 0,
      s"a rollup keyed on the partition column must not exchange:\n" +
        q.queryExecution.executedPlan)
  }

  test("the format().load() route elides the exchange too — no function catalog involved") {
    val root = SnapshotStore.ensurePartitioned(spark, dir)
    spjConfs()
    spark.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView("part_view")
    val q = spark.sql(
      "SELECT lang, count(*) AS n FROM part_view GROUP BY lang")
    assert(q.collect().length == 5)
    assert(shuffles(q) == 0,
      "identity transforms resolve without a catalog; the temp-view " +
        s"read must still report key groups:\n${q.queryExecution.executedPlan}")
  }

  test("two identity-partitioned stores join on the partition column with zero exchanges") {
    val root = SnapshotStore.ensurePartitioned(spark, dir)
    val tbl = SnapshotStore.catalogName(spark, root)
    spjConfs()
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // the SAME store joined to itself on exactly the partition
      // column: both sides key-grouped on lang, neither exchanges, and
      // the per-lang pair count is n²
      val q = spark.sql(
        s"""SELECT a.lang AS lang, count(*) AS n
           |FROM $tbl a JOIN $tbl b ON a.lang = b.lang
           |GROUP BY a.lang""".stripMargin)
      val docs = Engine.table(spark, dir, "documents")
      assert(rows(q) == rows(docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("c"))
        .select(col("lang"), (col("c") * col("c")).as("n"))))
      assert(shuffles(q) == 0,
        s"co-partitioned join + rollup must not exchange:\n" +
          q.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("WHERE on the partition column prunes the file list to exactly the named values") {
    val root = SnapshotStore.ensurePartitioned(spark, dir)
    val tbl = SnapshotStore.catalogName(spark, root)
    val docs = Engine.table(spark, dir, "documents")
    val langs = docs.select("lang").distinct().orderBy("lang")
      .collect().map(_.getString(0)).toSeq
    val cur = SnapshotStore.currentSnapshot(spark, root)
    val total = SnapshotStore.manifest(spark, root, cur).count()
    assert(total == 2L * langs.length, "fixture: one file per lang per commit")
    def planned(pred: String): (Long, Int) = {
      val n = spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE $pred")
        .head().getLong(0)
      (n, graft.sources.SnapshotTableSource.lastPlannedFiles.get(root))
    }
    val (n1, f1) = planned(s"lang = '${langs.head}'")
    assert(n1 == docs.filter(col("lang") === langs.head).count())
    assert(f1 == 2, s"one value must plan exactly its 2 files, planned $f1")
    val (n2, f2) = planned(s"lang IN ('${langs.head}', '${langs.last}')")
    assert(n2 == docs.filter(col("lang").isin(langs.head, langs.last)).count())
    assert(f2 == 4, s"two values must plan exactly their 4 files, planned $f2")
    // contradictory equalities: Catalyst folds the predicate to an
    // empty relation before the scan plans (even better than pruning —
    // the file-list intersection path exists for predicates the
    // optimizer can't see through, e.g. values arriving via IN lists)
    val (n3, _) = planned(s"lang = '${langs.head}' AND lang = '${langs.last}'")
    assert(n3 == 0L)
  }

  test("INSERT INTO preserves the identity layout; maintenance re-partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_ip_").toString
    spark.conf.set("spark.sql.catalog.graft_ipw", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_ipw.base", base)
    val root = s"$base/ptbl"
    val docs = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    SnapshotStore.appendPartitioned(spark, root,
      docs.filter(col("doc_id") < 250), "lang")
    docs.filter(col("doc_id") >= 250).createOrReplaceTempView("ipw_src")
    spark.sql(
      "INSERT INTO graft_ipw.ptbl SELECT doc_id, lang, n_chars FROM ipw_src")
    val k = SnapshotStore.currentSnapshot(spark, root)
    assert(k == 2L)
    assert(SnapshotStore.partSpecOf(spark, root, k).contains("lang"),
      "INSERT INTO must record partition values, not void the layout")
    // every commit-2 file single-valued and labeled correctly
    SnapshotStore.manifest(spark, root, k)
      .filter(col("commit_id") === 2L)
      .select("path", "part_val").collect().foreach { r =>
        val vals = spark.read.parquet(r.getString(0))
          .select("lang").distinct().collect().map(_.getString(0))
        assert(vals.toSeq == Seq(r.getString(1)),
          s"file ${r.getString(0)} must hold only ${r.getString(1)}")
      }
    assert(rows(SnapshotStore.readSnapshot(spark, root, k).select("doc_id")) ==
      rows(docs.select("doc_id")))
    // compact delegates to the partition-preserving path
    val kC = SnapshotStore.compact(spark, root)
    assert(SnapshotStore.partSpecOf(spark, root, kC).contains("lang"),
      "compact on a partitioned store must keep the layout")
    assert(rows(SnapshotStore.readSnapshot(spark, root, kC).select("doc_id")) ==
      rows(docs.select("doc_id")))
    assert(SnapshotStore.manifest(spark, root, kC).count() == 5L,
      "compaction lands one file per partition value")
  }

  test("null or non-string partition values are refused loudly; a plain commit voids the claim") {
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ip_null_${System.nanoTime()}"
    intercept[IllegalArgumentException] {
      SnapshotStore.appendPartitioned(spark, root,
        Seq((1L, "a"), (2L, null)).toDF("doc_id", "tag"), "tag")
    }
    // fractional types stay refused (LONG/INT are first-class since
    // round 16 — SnapshotTypedPartitionSpec pins them)
    intercept[IllegalArgumentException] {
      SnapshotStore.appendPartitioned(spark, root,
        Seq((1L, 5.0)).toDF("doc_id", "num"), "num")
    }
    SnapshotStore.appendPartitioned(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "tag"), "tag")
    SnapshotStore.append(spark, root, Seq((3L, "c")).toDF("doc_id", "tag"))
    val k = SnapshotStore.currentSnapshot(spark, root)
    assert(SnapshotStore.partSpecOf(spark, root, k).isEmpty,
      "one non-partitioned file must void the whole layout claim")
    assert(rows(SnapshotStore.readSnapshot(spark, root, k).select("tag")) ==
      Seq("[a]", "[b]", "[c]"))
  }
}
