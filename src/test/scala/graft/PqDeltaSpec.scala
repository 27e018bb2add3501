package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** q187 — PQ index maintenance against frozen codebooks.
  *
  * The maintenance invariant: codebooks are a pure function of the
  * STANDING side, so ingesting (or not ingesting) the delta changes NO
  * standing code — the standing half of the report must be
  * byte-identical with and without the delta present. Plus shape and
  * count sanity over the hash split.
  */
class PqDeltaSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("standing half of the report is identical with and without the delta") {
    val e = LlmOps.vecCorpusSplit(spark, dir)
    val standing = e.filter(!col("is_delta")).select(col("vec_id"), col("embedding"))
    val delta = e.filter(col("is_delta")).select(col("vec_id"), col("embedding"))
    assert(delta.count() > 0, "split produced no delta — the maintenance case is vacuous")
    val withDelta = LlmOps.pqDeltaReport(standing, delta)
      .select(col("m"), col("code"), col("n_standing"), col("sig_standing"))
      .collect().map(_.toString).sorted.toSeq
    val withoutDelta = LlmOps.pqDeltaReport(standing, delta.limit(0))
      .select(col("m"), col("code"), col("n_standing"), col("sig_standing"))
      .collect().map(_.toString).sorted.toSeq
    assert(withDelta == withoutDelta,
      "delta ingestion changed standing codes — codebooks are not frozen")
  }

  test("report counts cover both sides; codes stay within the codebook") {
    val full = LlmOps.q187PqDelta(spark, dir).collect()
    assert(full.nonEmpty && full.length <= LlmOps.PqM * LlmOps.PqK)
    val e = LlmOps.vecCorpusSplit(spark, dir)
    val nS = e.filter(!col("is_delta")).count()
    val nD = e.filter(col("is_delta")).count()
    assert(full.map(_.getAs[Long]("n_standing")).sum == nS * LlmOps.PqM)
    assert(full.map(_.getAs[Long]("n_delta")).sum == nD * LlmOps.PqM)
    assert(full.map(_.getAs[Long]("sig_delta")).sum > 0L)
    // codes are the seed ids: the PqK lowest STANDING vec_ids (q167's
    // seed rule — NOT 0..PqK, since delta ids are excluded)
    val seedIds = e.filter(!col("is_delta")).select(col("vec_id"))
      .orderBy(col("vec_id")).limit(LlmOps.PqK)
      .collect().map(_.getLong(0)).toSet
    assert(full.forall(r => seedIds.contains(r.getAs[Long]("code"))))
  }
}
