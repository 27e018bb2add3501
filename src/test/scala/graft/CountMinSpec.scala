package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinAgg

/** The Count-Min sketch behind q123. Contract under test: point
  * estimates NEVER undercount the true frequency, the sketch merges
  * correctly under any partitioning (same grid whatever the task
  * split), and the overcount is bounded in practice by collisions —
  * all three are what the q123 verify-against-exact plan relies on.
  */
class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  import CountMinAgg.{A, B, D, P, W}

  private def grid(items: Seq[String], parts: Int): Seq[Long] = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .agg(CountMinAgg.count_min(col("item")).as("cm"))
      .collect()(0).getSeq[Long](0)
  }

  private def estimate(g: Seq[Long], item: String): Long = {
    val hp = java.lang.Math.floorMod(
      graft.functions.ScalarOps.stableHash64(item), P)
    (0 until D).map(i => g(i * W + (((A(i) * hp + B(i)) % P) % W).toInt)).min
  }

  test("estimates never undercount, under any partitioning") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(3000)(s"k${rnd.nextInt(120)}")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 16)) {
      val g = grid(items, parts)
      assert(g.sum == items.size.toLong * D)
      truth.foreach { case (k, n) =>
        assert(estimate(g, k) >= n, s"undercount for $k at parts=$parts")
      }
    }
  }

  test("merge is partitioning-invariant (identical grid)") {
    val items = (0 until 2000).map(i => s"v${i % 37}")
    assert(grid(items, 1) == grid(items, 13))
  }

  test("absent items estimate only collision mass (eps*n bound)") {
    val items = (0 until 4000).map(i => s"p${i % 50}")
    val g = grid(items, 8)
    // e/W * n with a comfortable constant: collisions alone, no truth
    val bound = math.ceil(math.E / W * items.size).toLong * 3
    (0 until 30).foreach { i =>
      assert(estimate(g, s"absent$i") <= bound)
    }
  }
}
