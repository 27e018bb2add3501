package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.connector.write.WriterCommitMessage

import graft.sources.{SnapshotFileCommit, SnapshotStore, SnapshotWrite}

/** Round-16 ADVICE fixes, pinned:
  *   1. `DELETE FROM t WHERE doc_id IS NOT NULL` keeps null-key rows
  *      (routes to deleteRange, never truncate).
  *   2. Out-of-domain strict bounds (`> Long.MaxValue`) delete nothing.
  *   3. The streaming sink's epoch marker is recorded INSIDE the
  *      snapshot commit (no crash window), and a marker naming a
  *      never-committed snapshot is a crashed attempt → recommit.
  *   4. An EMPTY `INSERT OVERWRITE` still merges the write's schema.
  *   5. The branch claim wait honors `ClaimWaitKey` like the main path.
  */
class SnapshotAdviceR16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("SQL DELETE WHERE doc_id IS NOT NULL keeps null-key rows; out-of-domain bounds delete nothing") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_nn_del_").toString
    val root = s"$d/store"
    SnapshotStore.append(spark, root,
      Seq((Some(1L), "a"), (Some(2L), "b"), (None: Option[Long], "n"))
        .toDF("doc_id", "tag"))
    // a spec-unique catalog name: the shared `graft_snap` base conf is
    // racy across concurrently-running suites
    spark.conf.set("spark.sql.catalog.graft_r16adv",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r16adv.base", d)
    val tbl = "graft_r16adv.`store`"
    // a logically-empty predicate: > Long.MaxValue selects nothing —
    // including the row AT Long.MaxValue (clamping would delete it)
    SnapshotStore.append(spark, root,
      Seq((Long.MaxValue, "edge")).toDF("doc_id", "tag"))
    spark.sql(s"DELETE FROM $tbl WHERE doc_id > ${Long.MaxValue}L")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head().getLong(0) == 4L,
      "an out-of-domain strict bound must delete nothing")
    // IS NOT NULL: full id range but a REAL predicate — null rows kept
    spark.sql(s"DELETE FROM $tbl WHERE doc_id IS NOT NULL")
    val left = spark.sql(s"SELECT * FROM $tbl").collect()
    assert(left.length == 1 && left(0).isNullAt(0) &&
      left(0).getString(1) == "n",
      s"IS NOT NULL must keep exactly the null-key row: ${left.mkString(",")}")
    // bare DELETE still truncates (null rows included)
    spark.sql(s"DELETE FROM $tbl")
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl").head().getLong(0) == 0L)
  }

  test("epoch marker is part of the commit: names its snapshot; a marker for a never-committed snapshot recommits") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_txn_").toString
    val root = s"$d/store"
    SnapshotStore.append(spark, root, Seq((1L, "seed")).toDF("doc_id", "text"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val f = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def dataFile(id: Long): String = {
      val p = s"$d/payload_$id"
      Seq((id, s"t$id")).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(p)
      f.listStatus(new Path(p)).map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).head
    }
    def markerContent(name: String): String = {
      val in = f.open(new Path(s"$root/manifests/$name"))
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    }
    // epoch 5 commits: marker exists and NAMES the landed snapshot
    new SnapshotWrite(root, schema, "testq")
      .commit(5L, Array[WriterCommitMessage](SnapshotFileCommit(dataFile(10L), 1L, 10L, 10L)))
    assert(SnapshotStore.currentSnapshot(spark, root) == 2L)
    assert(markerContent("etestq_5") == "2",
      "the epoch marker must name the snapshot it landed as")
    // replay of epoch 5 (fresh attempt's files): skipped, files cleaned
    val replayFile = dataFile(11L)
    new SnapshotWrite(root, schema, "testq")
      .commit(5L, Array[WriterCommitMessage](SnapshotFileCommit(replayFile, 1L, 11L, 11L)))
    assert(SnapshotStore.currentSnapshot(spark, root) == 2L,
      "a replayed committed epoch must not commit again")
    assert(!f.exists(new Path(replayFile)),
      "the replayed attempt's files must be reclaimed")
    // a CRASHED attempt's leftover: marker naming a snapshot that never
    // landed (crash between marker and _SUCCESS) → recommit, not skip
    val out = f.create(new Path(s"$root/manifests/etestq_7"), true)
    try out.write("999".getBytes("UTF-8")) finally out.close()
    new SnapshotWrite(root, schema, "testq")
      .commit(7L, Array[WriterCommitMessage](SnapshotFileCommit(dataFile(12L), 1L, 12L, 12L)))
    assert(SnapshotStore.currentSnapshot(spark, root) == 3L,
      "a marker whose snapshot never committed must be recommitted")
    assert(markerContent("etestq_7") == "3")
    // legacy empty marker (pre-txn protocol) still reads as committed
    val out2 = f.create(new Path(s"$root/manifests/etestq_9"), true)
    try out2.write(Array.empty[Byte]) finally out2.close()
    val legacyFile = dataFile(13L)
    new SnapshotWrite(root, schema, "testq")
      .commit(9L, Array[WriterCommitMessage](SnapshotFileCommit(legacyFile, 1L, 13L, 13L)))
    assert(SnapshotStore.currentSnapshot(spark, root) == 3L &&
      !f.exists(new Path(legacyFile)),
      "a legacy empty marker means the epoch landed")
  }

  test("an empty INSERT OVERWRITE merges the write's schema like its non-empty twin") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_eow_").toString
    val root = s"$d/store"
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("doc_id", "tag"))
    // the commit primitive with ZERO files but a schema carrying a NEW
    // column (Spark's analyzer blocks extra columns on the SQL route,
    // but the primitive is the contract the connector's overwrite
    // lands on — its empty and non-empty branches must agree)
    SnapshotStore.commitOverwriteStats(spark, root, Seq.empty,
      Seq.empty[(Long, String, Long)].toDF("doc_id", "tag", "extra").schema)
    assert(SnapshotStore.currentSnapshot(spark, root) == 2L)
    val sch = SnapshotStore.readSnapshot(spark, root, 2L).schema
    assert(sch.fieldNames.contains("extra"),
      s"the empty overwrite must evolve the schema: ${sch.fieldNames.mkString(",")}")
    assert(SnapshotStore.readSnapshot(spark, root, 2L).count() == 0L)
  }

  test("appendBranch's claim wait reads ClaimWaitKey — a torn branch claim fails within the configured bound") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_bcw_").toString
    val root = s"$d/store"
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("doc_id", "tag"))
    SnapshotStore.createBranch(spark, root, "wip", 1L)
    // poison the next branch claim: a dead stager holds claimb_wip_1
    val f = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    f.create(new Path(s"$root/manifests/claimb_wip_1"), true).close()
    spark.conf.set(SnapshotStore.ClaimWaitKey, "200")
    try {
      val t0 = System.nanoTime()
      val ex = intercept[IllegalStateException] {
        SnapshotStore.appendBranch(spark, root, "wip",
          Seq((2L, "b")).toDF("doc_id", "tag"))
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(ex.getMessage.contains("claimb_wip_1"))
      assert(elapsedMs < 30000L,
        s"the 200ms conf must bound the wait (took ${elapsedMs}ms, not 60s)")
    } finally spark.conf.unset(SnapshotStore.ClaimWaitKey)
  }
}
