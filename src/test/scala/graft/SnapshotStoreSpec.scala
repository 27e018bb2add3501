package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** q203–q205 — the snapshot-manifest store: manifest-last commits
  * (torn writes invisible), time travel by manifest, file-level diff,
  * and O(1) snapshot-id freshness for derived artifacts.
  */
class SnapshotStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

  private def docs = Engine.table(spark, dir, "documents")
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** A private scratch corpus (copy of the fixture) so commit-count
    * mutations never disturb the shared 2-commit store the queries use.
    */
  private def scratchCorpus(): String = {
    val d = Files.createTempDirectory("graft_snap_").toString
    Files.copy(Paths.get(s"$dir/documents.parquet"),
      Paths.get(s"$d/documents.parquet"))
    d
  }

  test("time travel: snapshot 1 is the initial load, snapshot 2 the whole table") {
    val root = SnapshotStore.ensure(spark, dir)
    assert(SnapshotStore.currentSnapshot(spark, root) == 2L)
    assert(rows(SnapshotStore.readSnapshot(spark, root, 1L)) ==
      rows(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)))
    assert(rows(SnapshotStore.readSnapshot(spark, root, 2L)) == rows(docs))
  }

  test("diff 1→2 is exactly the appended rows, resolved at file level") {
    val root = SnapshotStore.ensure(spark, dir)
    assert(rows(SnapshotStore.readDiff(spark, root, 1L, 2L)) ==
      rows(docs.filter(pmod(col("doc_id"), lit(3)) === 0)))
    // and the manifest itself shows no snapshot-1 file in the diff
    assert(SnapshotStore.manifest(spark, root, 2L)
      .filter(col("commit_id") <= 1).count() ==
      SnapshotStore.manifest(spark, root, 1L).count())
  }

  test("torn commit: data files without a manifest are invisible to every reader") {
    val d = scratchCorpus()
    val root = SnapshotStore.ensure(spark, d)
    val before = rows(SnapshotStore.readSnapshot(spark, root, 2L))
    // simulate the crash window: commit 3's data lands, manifest never written
    docs.limit(7).write.mode("overwrite").parquet(s"$root/data/c3")
    assert(SnapshotStore.currentSnapshot(spark, root) == 2L)
    assert(rows(SnapshotStore.readSnapshot(spark, root,
      SnapshotStore.currentSnapshot(spark, root))) == before)
    // the retry path: a real commit 3 overwrites the orphans and commits
    val k = SnapshotStore.append(spark, root, docs.limit(5))
    assert(k == 3L && SnapshotStore.currentSnapshot(spark, root) == 3L)
    assert(SnapshotStore.readSnapshot(spark, root, 3L).count() ==
      docs.count() + 5)
    // snapshot 2 is untouched by the later commit — manifests are immutable
    assert(rows(SnapshotStore.readSnapshot(spark, root, 2L)) == before)
  }

  test("O(1) freshness: the derived aggregate reuses on an unchanged snapshot, rebuilds on commit") {
    val d = scratchCorpus()
    val root = SnapshotStore.ensure(spark, d)
    val aggPath = SnapshotStore.ensureSnapshotAgg(spark, root, d)
    val mtime = Files.getLastModifiedTime(
      Paths.get(aggPath.stripPrefix("file:"))).toMillis
    val first = rows(spark.read.parquet(aggPath))
    // "next session" replay (the ArtifactReuseSpec pattern): the same
    // snapshot id validates by the manifests listing alone, artifact
    // untouched (mtime witness)
    Thread.sleep(20)
    SnapshotStore.ensureSnapshotAggValidated(spark, root, d)
    assert(Files.getLastModifiedTime(
      Paths.get(aggPath.stripPrefix("file:"))).toMillis == mtime,
      "unchanged snapshot must reuse the stored aggregate")
    // a new commit moves the snapshot id → the next ensure rebuilds
    // and the rebuilt aggregate includes the appended rows
    val extra = docs.filter(col("lang") === "en").limit(3)
    val extraN = extra.count()
    val enBefore = docs.filter(col("lang") === "en").count()
    SnapshotStore.append(spark, root, extra)
    SnapshotStore.ensureSnapshotAggValidated(spark, root, d)
    val rebuilt = spark.read.parquet(aggPath)
    assert(rows(rebuilt) != first, "a new commit must invalidate the artifact")
    assert(rebuilt.filter(col("lang") === "en").head().getAs[Long]("n_docs") ==
      enBefore + extraN)
  }

  test("manifest stats prune files: the range read skips files and matches the raw rows") {
    val root = SnapshotStore.ensure(spark, dir)
    val cur = SnapshotStore.currentSnapshot(spark, root)
    val total = SnapshotStore.manifest(spark, root, cur).count()
    val pruned = SnapshotStore.prunedPaths(spark, root, cur, 100L, 250L)
    assert(pruned.nonEmpty && pruned.size < total,
      s"range [100,250] must skip files: touched ${pruned.size} of $total")
    assert(rows(SnapshotStore.readRange(spark, root, cur, 100L, 250L)) ==
      rows(docs.filter(col("doc_id").between(100, 250))))
    // a range beyond every file's stats touches nothing and reads empty
    assert(SnapshotStore.prunedPaths(spark, root, cur,
      Long.MaxValue - 1, Long.MaxValue).isEmpty)
    assert(SnapshotStore.readRange(spark, root, cur,
      Long.MaxValue - 1, Long.MaxValue).count() == 0)
  }

  test("streaming twin: every micro-batch is an atomic commit; time travel keeps each prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("graft_snapstream_").toString + "/tbl"
    val all = docs.select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batches = all.groupBy(t => math.floorMod(t._1, 3L)).toSeq
      .sortBy(_._1).map(_._2.toSeq)
    val ms = MemoryStream[(Long, String, Long)]
    val query = ms.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        SnapshotStore.append(spark, root, batch); ()
      }
      .start()
    try {
      var fed = Seq.empty[(Long, String, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        ms.addData(b)
        query.processAllAvailable()
        fed = fed ++ b
        assert(SnapshotStore.currentSnapshot(spark, root) == i + 1L,
          "each micro-batch must land as exactly one commit")
        assert(rows(SnapshotStore.readSnapshot(spark, root, i + 1L)) ==
          rows(fed.toDF("doc_id", "lang", "n_chars")),
          s"snapshot ${i + 1} != all rows fed so far")
      }
      // every prefix is still addressable — the streaming sink kept
      // the table's whole history, not just its head
      assert(SnapshotStore.readSnapshot(spark, root, 1L).count() ==
        batches.head.size)
    } finally query.stop()
  }

  test("q203/q204/q205 run green and agree with the raw table") {
    assert(rows(SnapshotStore.q203SnapshotTimeTravel(spark, dir)) ==
      rows(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))))
    assert(rows(SnapshotStore.q204SnapshotDiff(spark, dir)) ==
      rows(docs.filter(pmod(col("doc_id"), lit(3)) === 0).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))))
    assert(rows(SnapshotStore.q205SnapshotAgg(spark, dir)) ==
      rows(docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))))
  }
}
