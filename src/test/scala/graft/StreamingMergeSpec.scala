package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps

/** VERDICT r7 item 4: q139's batch MERGE proves incremental == full
  * rebuild once; a 100 TB pipeline runs that merge CONTINUOUSLY. This
  * spec drives the same CDC delta through Structured Streaming — the
  * change feed arrives in micro-batches via MemoryStream, a
  * foreachBatch sink folds each batch into the standing snapshot with
  * the SAME [[PipelineOps.applyMergeBatch]] the batch query uses — and
  * asserts:
  *
  *  1. after EVERY micro-batch, the snapshot equals an independent
  *     full-outer-join merge (a deliberately different join shape) of
  *     the initial manifest with the delta rows fed so far;
  *  2. after the final batch, the snapshot's canonical hash equals the
  *     batch q139 result's — streamed-incremental == one-shot batch.
  *
  * No new oracle is needed: q139's DuckDB oracle already value-checks
  * the end state this converges to.
  *
  * Scale notes: each foreachBatch application joins the (corpus-sized)
  * snapshot against a |batch|-sized delta — the left-join + union
  * shape whose big side never shuffles — and re-materializes through
  * Engine.materialize, so on a real cluster the standing snapshot is a
  * checkpoint, not an ever-growing lineage chain across micro-batches
  * (lineage across N batches would replay N joins on any recompute).
  */
object StreamingMergeSpec {
  /** Change-feed record (new_hash is None for deletes). Top-level so
    * the case-class Encoder doesn't capture the suite instance.
    */
  case class Change(doc_id: Long, status: String, new_hash: Option[Long])
}

class StreamingMergeSpec extends AnyFunSuite {
  import StreamingMergeSpec.Change

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  /** Independent expected-state builder: full-outer merge of the
    * initial manifest with a set of delta rows — a DIFFERENT join
    * shape from applyMergeBatch's left-join + union, so agreement is
    * evidence about semantics, not shared code.
    */
  private def expectedState(initial: DataFrame, fed: DataFrame): DataFrame =
    initial.select(col("doc_id"), col("op_applied"), col("text_hash"))
      .join(fed, Seq("doc_id"), "full_outer")
      .filter(col("status").isNull || col("status") =!= "deleted")
      .select(col("doc_id"),
        when(col("status").isNull, col("op_applied"))
          .when(col("status") === "added", "inserted")
          .otherwise("updated").as("op_applied"),
        coalesce(col("new_hash"), col("text_hash")).as("text_hash"))

  test("streamed foreachBatch MERGE == batch q139 at every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val initial = Engine.materialize(PipelineOps.cdcOldSnapshot(spark, dir))
    val deltaRows = PipelineOps.cdcDeltaFeed(spark, dir)
      .collect().map(r => Change(r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(deltaRows.nonEmpty, "fixture delta must be non-empty")
    // three micro-batches, keyed so every doc changes exactly once
    // (a real CDC feed compacted per key — q139's delta is one row per
    // doc by construction)
    val batches = deltaRows.groupBy(c => math.floorMod(c.doc_id, 3L)).toSeq
      .sortBy(_._1).map(_._2.toSeq)
    assert(batches.size == 3)

    var snapshot = initial
    val ms = MemoryStream[Change]
    val query = ms.toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = batch.select(col("doc_id"), col("status"), col("new_hash"))
        snapshot = Engine.materialize(
          PipelineOps.applyMergeBatch(snapshot, delta))
        ()
      }
      .start()
    try {
      var fedSoFar = Seq.empty[Change]
      batches.foreach { b =>
        ms.addData(b)
        query.processAllAvailable()
        fedSoFar = fedSoFar ++ b
        val fed = fedSoFar.toDF()
          .select(col("doc_id"), col("status"), col("new_hash"))
        assert(Canonical.hash(snapshot) ==
          Canonical.hash(expectedState(initial, fed)),
          s"snapshot diverged after feeding ${fedSoFar.size} delta rows")
      }
      val batchResult = SparkEntry.queries("q139_snapshot_merge")(spark, dir)
      assert(Canonical.hash(snapshot) == Canonical.hash(batchResult),
        "streamed-incremental end state != one-shot batch MERGE")
      assert(snapshot.count() == batchResult.count())
    } finally query.stop()
  }
}
