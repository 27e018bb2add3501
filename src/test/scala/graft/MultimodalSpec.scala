package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Structural invariants for the multimodal family beyond the oracle
  * gate — above all q171's greedy-packing tightness, which the manifest
  * hash can't express as a property.
  */
class MultimodalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("q171: batches respect the byte cap and pack tightly") {
    val cap = Multimodal.PackCapBytes
    val maxFrame = 224L * 224L * 3L // largest possible resized frame
    val rows = Multimodal.q171MediaBatches(spark, dir).collect()
    assert(rows.nonEmpty)
    // group batches by (mime, rbucket, shard); batch_no must be a
    // gapless 0..n sequence within each group (cum-div assignment
    // cannot skip a batch)
    val groups = rows.groupBy(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    groups.foreach { case (g, bs) =>
      val nos = bs.map(_.getLong(3)).sorted.toSeq
      assert(nos == (0L until nos.length.toLong).toSeq,
        s"$g batch_no gaps: $nos")
      val byNo = bs.sortBy(_.getLong(3))
      byNo.zipWithIndex.foreach { case (b, i) =>
        val bytes = b.getLong(5)
        // upper bound: a batch never exceeds cap by more than the one
        // straddling frame
        assert(bytes <= cap + maxFrame, s"$g batch $i too large: $bytes")
        // lower bound: every NON-final batch is within one frame of
        // full — the greedy packing actually packs
        if (i < byNo.length - 1)
          assert(bytes >= cap - maxFrame, s"$g batch $i underfull: $bytes")
      }
    }
    // conservation: every decoded frame lands in exactly one batch
    val totalFrames = rows.map(_.getLong(4)).sum
    val expected = Multimodal.q53MediaFrames(spark, dir).count()
    assert(totalFrames == expected,
      s"packed $totalFrames frames, decoded $expected")
  }
}
