package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ClusteredStore

/** Streaming twin of the clustered store's maintenance path (q192):
  * document deltas arrive in micro-batches, each batch is zone-assigned
  * against the FROZEN standing-side boundaries (a pure per-row
  * function), and appends one segment to the stored assignment
  * artifact — the ingest loop of a lakehouse table whose clustering is
  * re-derived at stats-refresh cadence, never per batch (per-batch
  * re-clustering would relocate the standing files).
  *
  * Asserted after EVERY micro-batch: the zone-ingest report over the
  * stored artifact equals the report computed from scratch over
  * standing + the deltas fed so far. After the final batch the
  * maintained report equals the one-shot q192, whose DuckDB oracle
  * value-checks every assignment — so streamed maintenance ==
  * oracle-pinned rebuild transitively (the StreamingVecIndexSpec /
  * StreamingPqIndexSpec discipline).
  *
  * foreachBatch (not a watermarked aggregation) because the store is
  * STATE on disk updated transactionally per batch.
  */
object StreamingClusterIndexSpec {
  /** Top-level so the Encoder doesn't capture the suite instance. */
  case class Doc(doc_id: Long, n_chars: Long)
}

class StreamingClusterIndexSpec extends AnyFunSuite {
  import StreamingClusterIndexSpec.Doc

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("per-batch frozen-boundary appends == from-scratch report at every batch; final == q192") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val d = ClusteredStore.docsSplit(spark, dir)
      .select(col("doc_id"), col("n_chars"), col("is_delta"))
    val standing = d.filter(!col("is_delta"))
    val bnds = ClusteredStore.boundariesOf(standing) // frozen ONCE
    bnds.collect() // materialize before any delta arrives

    val root = java.nio.file.Files.createTempDirectory("cls_stream").toString
    // segment 0: the standing side's assignments
    ClusteredStore.assignZones(standing, bnds)
      .select(col("doc_id"), col("n_chars"), col("is_delta"), col("zid"))
      .write.mode("overwrite").parquet(s"$root/assign")

    val deltaDocs = d.filter(col("is_delta"))
      .collect().map(r => Doc(r.getLong(0), r.getLong(1))).toSeq
    assert(deltaDocs.nonEmpty)
    val batches = deltaDocs.groupBy(x => math.floorMod(x.doc_id, 3L)).toSeq
      .sortBy(_._1).map(_._2)
    assert(batches.size == 3)

    val ms = MemoryStream[Doc]
    val query = ms.toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ClusteredStore.assignZones(
            batch.withColumn("is_delta", lit(true)), bnds)
          .select(col("doc_id"), col("n_chars"), col("is_delta"), col("zid"))
          .write.mode("append").parquet(s"$root/assign")
        ()
      }
      .start()
    try {
      var fed = Seq.empty[Doc]
      batches.foreach { b =>
        ms.addData(b)
        query.processAllAvailable()
        fed = fed ++ b
        val maintained = ClusteredStore.zoneIngestReport(
          spark.read.parquet(s"$root/assign"))
        val fromScratch = ClusteredStore.zoneIngestReport(
          ClusteredStore.assignZones(standing, bnds)
            .unionByName(ClusteredStore.assignZones(
              fed.toDF().withColumn("is_delta", lit(true)), bnds))
            .select(col("doc_id"), col("n_chars"), col("is_delta"), col("zid")))
        assert(Canonical.hash(maintained) == Canonical.hash(fromScratch),
          s"maintained report drifted after ${fed.size} delta docs")
      }
      val maintained = ClusteredStore.zoneIngestReport(
        spark.read.parquet(s"$root/assign"))
      val oneShot = ClusteredStore.q192ClusterDelta(spark, dir)
      assert(Canonical.hash(maintained) == Canonical.hash(oneShot),
        "maintained artifact != oracle-pinned one-shot q192")
    } finally query.stop()
  }
}
