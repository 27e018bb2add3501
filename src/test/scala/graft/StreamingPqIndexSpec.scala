package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Streaming twin of the PQ index's maintenance path (q187) — the
  * StreamingVecIndexSpec pattern applied to the product quantizer:
  * embedding deltas arrive in micro-batches, each batch is ENCODED
  * against the FROZEN standing-side codebooks, appending one code
  * segment to a stored artifact — the ingest loop of a production PQ
  * index (codebooks retrain at stat-refresh cadence, never per batch).
  *
  * Asserted after EVERY micro-batch: the q187 report over the stored
  * code table equals the report computed from scratch over standing +
  * the deltas fed so far. After the final batch: the maintained report
  * equals the one-shot q187 (whose DuckDB oracle value-checks every
  * code), so streamed maintenance == oracle-pinned rebuild
  * transitively.
  */
object StreamingPqIndexSpec {
  /** Top-level so the Encoder doesn't capture the suite instance. */
  case class Vec(vec_id: Long, embedding: Array[Float])
}

class StreamingPqIndexSpec extends AnyFunSuite {
  import StreamingPqIndexSpec.Vec

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("per-batch frozen-codebook appends == from-scratch report at every batch; final == q187") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val e = LlmOps.vecCorpusSplit(spark, dir)
    val standing = e.filter(!col("is_delta"))
      .select(col("vec_id"), col("embedding"))
    val cbooks = LlmOps.pqFrozenCodebooks(standing) // frozen ONCE

    val root = java.nio.file.Files.createTempDirectory("pq_idx_stream").toString
    // segment 0: the standing side's codes
    LlmOps.pqEncode(standing, cbooks).withColumn("is_delta", lit(false))
      .write.mode("overwrite").parquet(s"$root/codes")

    val deltaVecs = e.filter(col("is_delta"))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assert(deltaVecs.nonEmpty)
    val batches = deltaVecs.groupBy(v => math.floorMod(v.vec_id, 3L)).toSeq
      .sortBy(_._1).map(_._2)
    assert(batches.size == 3)

    val ms = MemoryStream[Vec]
    val query = ms.toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LlmOps.pqEncode(batch, cbooks).withColumn("is_delta", lit(true))
          .write.mode("append").parquet(s"$root/codes")
        ()
      }
      .start()
    try {
      var fed = Seq.empty[Vec]
      batches.foreach { b =>
        ms.addData(b)
        query.processAllAvailable()
        fed = fed ++ b
        val maintained =
          LlmOps.pqCodeReport(spark.read.parquet(s"$root/codes"))
        val fromScratch = LlmOps.pqCodeReport(
          LlmOps.pqEncode(standing, cbooks).withColumn("is_delta", lit(false))
            .union(LlmOps.pqEncode(fed.toDF(), cbooks)
              .withColumn("is_delta", lit(true))))
        assert(Canonical.hash(maintained) == Canonical.hash(fromScratch),
          s"maintained PQ report drifted after ${fed.size} delta vecs")
      }
      val maintained =
        LlmOps.pqCodeReport(spark.read.parquet(s"$root/codes"))
      val oneShot = LlmOps.q187PqDelta(spark, dir)
      assert(Canonical.hash(maintained) == Canonical.hash(oneShot),
        "stream-maintained PQ index != one-shot q187")
      assert(maintained.count() > 0)
    } finally query.stop()
  }
}
