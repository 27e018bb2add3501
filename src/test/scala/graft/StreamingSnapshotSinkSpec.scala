package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** q242 — the NATIVE Structured Streaming sink over the snapshot
  * store: `writeStream.format(...)` commits one snapshot per
  * micro-batch through the claim CAS, with an epoch marker making
  * replayed epochs idempotent (exactly-once table state over Spark's
  * at-least-once epoch delivery). The consumer half (SnapshotCdcSource)
  * and producer half together close the streaming loop natively —
  * q73's foreachBatch twin proves the same loop through user code;
  * this is the sink a SQL-only pipeline uses.
  */
class StreamingSnapshotSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("one snapshot per micro-batch; restart with no new data re-commits nothing; CDC feed matches per-batch") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ssink_").toString
    val root = s"$d/store"
    val chk = s"$d/chk"
    // seed the schema (streaming writes append to an existing table)
    SnapshotStore.append(spark, root,
      Seq((1L, "seed")).toDF("doc_id", "text"))
    val in = MemoryStream[(Long, String)](spark)
    def start() = in.toDF().toDF("doc_id", "text")
      .writeStream.format("graft.sources.SnapshotTableSource")
      .option("root", root).option("checkpointLocation", chk)
      .start()
    val q = start()
    try {
      in.addData((2L, "b1-a"), (3L, "b1-b"))
      q.processAllAvailable()
      assert(SnapshotStore.currentSnapshot(spark, root) == 2L,
        "the first micro-batch must land as snapshot 2")
      in.addData((4L, "b2-a"))
      q.processAllAvailable()
      assert(SnapshotStore.currentSnapshot(spark, root) == 3L,
        "each micro-batch is its own snapshot commit")
      // the change feed sees exactly the batch's rows at its commit
      val feed = SnapshotStore.changeFeed(spark, root, 2L, 3L)
      assert(feed.count() == 1L &&
        feed.filter(col("change_type") === "insert").count() == 1L)
    } finally q.stop()
    val before = rows(SnapshotStore.readSnapshot(spark, root, 3L))
    // restart from the checkpoint with NO new data: nothing re-commits
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(SnapshotStore.currentSnapshot(spark, root) == 3L,
        "a restart with no new data must not commit")
    } finally q2.stop()
    assert(rows(SnapshotStore.readSnapshot(spark, root,
      SnapshotStore.currentSnapshot(spark, root))) == before)
    // table state: seed + both batches, exactly once each
    assert(before.size == 4)
  }

  test("q242 agrees with its closed-form expectation and the fixture reuses on a matching signature") {
    val docs = Engine.table(spark, dir, "documents")
    val got = SparkEntry.queries("q242_snapshot_stream_sink")(spark, dir)
    val expect = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"))
      .orderBy(col("source"))
    assert(rows(got) == rows(expect))
  }
}
