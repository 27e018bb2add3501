package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotStore, SnapshotTableSource}

/** q230/q231 — the DSv2 connector over the snapshot store: plan-time
  * manifest-stats file pruning for PLAIN SQL predicates, pushed-filter
  * consumption, column pruning, time travel options, and composition
  * with MOR deletes and field-id renames.
  */
class SnapshotTableSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"
  private def docs = Engine.table(spark, dir, "documents")
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def load(root: String, opts: (String, String)*) = {
    val r = spark.read.format("graft.sources.SnapshotTableSource")
      .option("root", root)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("plain SQL range predicate: files pruned from manifest stats, filter consumed, hash == readRange") {
    val root = SnapshotStore.ensure(spark, dir)
    val cur = SnapshotStore.currentSnapshot(spark, root)
    load(root).createOrReplaceTempView("snap_sql_spec")
    val q = spark.sql(
      """SELECT lang, count(*) AS n, sum(n_chars) AS sc FROM snap_sql_spec
        |WHERE doc_id BETWEEN 100 AND 250 GROUP BY lang ORDER BY lang""".stripMargin)
    val expect = rows(SnapshotStore.readRange(spark, root, cur, 100L, 250L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
      .orderBy(col("lang")))
    assert(rows(q) == expect, "the SQL read must hash-equal the library-routed readRange")
    // FILE PRUNING: the scan planned strictly fewer files than the manifest names
    val planned = SnapshotTableSource.lastPlannedFiles.get(root)
    val total = SnapshotStore.manifest(spark, root, cur).count()
    assert(planned > 0 && planned < total,
      s"the SQL predicate must prune the file list: planned $planned of $total")
    assert(planned == SnapshotStore.prunedPaths(spark, root, cur, 100L, 250L).size,
      "DSv2 pruning must agree with the library's prunedPaths")
    // PUSHED FILTERS leave the plan: the consumed range bounds appear in
    // no FilterExec (only the unpushable isnotnull survives)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains(">= 100") && !plan.contains("<= 250"),
      s"the pushed range must be consumed by the scan, not re-filtered:\n$plan")
    assert(plan.contains("GraftSnapshotScan") || plan.contains("graft_snapshot"),
      "the scan node must be ours")
  }

  test("column pruning reaches the reader; time travel options resolve snapshots") {
    val root = SnapshotStore.ensure(spark, dir)
    // snapshot 1 via the option == the library's time travel
    assert(rows(load(root, "snapshot" -> "1")) ==
      rows(SnapshotStore.readSnapshot(spark, root, 1L)))
    // asOfTs resolution
    val t1 = SnapshotStore.commitTimeOf(spark, root, 1L)
    assert(rows(load(root, "asOfTs" -> t1.toString)) ==
      rows(SnapshotStore.readSnapshot(spark, root, 1L)))
    // projection: a 1-column select reads and returns just that column
    val langs = load(root).select("lang")
    assert(langs.schema.fieldNames.toSeq == Seq("lang"))
    assert(rows(langs) == rows(docs.select("lang")))
    // pruned read with a filter on a column NOT in the projection
    assert(load(root).filter(col("doc_id") <= 50L).select("lang").count() ==
      docs.filter(col("doc_id") <= 50L).count())
  }

  test("the connector composes with MOR deletes and field-id renames") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2_")
      .toString + "/tbl"
    SnapshotStore.append(spark, root,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("doc_id", "tag", "n_chars"))
    SnapshotStore.renameColumn(spark, root, "n_chars", "size") // commit 2
    SnapshotStore.append(spark, root,
      Seq((4L, "d", 40L)).toDF("doc_id", "tag", "size")) // commit 3
    SnapshotStore.deleteKeys(spark, root, Seq(2L).toDF("doc_id")) // commit 4
    val got = load(root)
    assert(got.schema.fieldNames.toSeq == Seq("doc_id", "tag", "size"))
    assert(rows(got) == rows(SnapshotStore.readSnapshot(spark, root, 4L)),
      "SQL read must equal the library read across rename + MOR delete")
    assert(got.count() == 3L &&
      got.filter(col("doc_id") === 1L).head().getAs[Long]("size") == 10L)
    // sequence rule through the connector: re-insert key 2 (commit 5)
    SnapshotStore.append(spark, root,
      Seq((2L, "B", 21L)).toDF("doc_id", "tag", "size"))
    assert(load(root).filter(col("doc_id") === 2L)
      .head().getAs[String]("tag") == "B")
  }
}
