package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Direct tests for the connected-components operator behind q62 —
  * synthetic graphs with known components, independent of the SimHash
  * candidate generation (which the q62 oracle covers). Correctness
  * contract (identical for both regimes): one row per non-singleton
  * node, label = component minimum.
  *
  * Every graph runs through BOTH paths: the single-aggregation
  * union-find fast path (smallLimit = default, all these graphs are
  * tiny) and the large-star/small-star loop (forced with
  * smallLimit = 0).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def cc(smallLimit: Long, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    LlmOps.connectedComponents(pairs.toDF("doc_a", "doc_b"), smallLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val paths = Seq(
    "union-find fast path" -> Long.MaxValue,
    "large-star/small-star" -> 0L)

  for ((pathName, limit) <- paths) {

    test(s"[$pathName] a 60-node chain collapses to one component") {
      // worst case for plain label propagation (diameter = n); both
      // regimes must converge and label everything with the chain min
      val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
      val got = cc(limit, chain)
      assert(got.keySet == (0L until 60L).toSet)
      assert(got.values.toSet == Set(0L))
    }

    test(s"[$pathName] disjoint components keep distinct minimum labels") {
      val got = cc(limit,
        Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L)))
      assert(got == Map(
        10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L,
        30L -> 30L, 31L -> 30L, 32L -> 30L))
    }

    test(s"[$pathName] star graph: all leaves adopt the hub minimum") {
      val got = cc(limit, (1L to 9L).map(i => (0L, i)))
      assert(got.keySet == (0L to 9L).toSet)
      assert(got.values.toSet == Set(0L))
    }

    test(s"[$pathName] transitive closure across bridge edges (A~B, B~C => one cluster)") {
      // the reason pairs alone can't dedup a corpus: 5 and 7 share no edge
      val got = cc(limit, Seq((5L, 6L), (6L, 7L)))
      assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
    }

    test(s"[$pathName] empty edge list yields empty labels") {
      assert(cc(limit, Seq.empty) == Map.empty)
    }

    test(s"[$pathName] duplicate and reversed edges don't change the answer") {
      val got = cc(limit, Seq((3L, 4L), (4L, 3L), (3L, 4L), (4L, 5L)))
      assert(got == Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
    }

    test(s"[$pathName] self-loops are ignored: a self-loop-only node is a singleton") {
      // (9,9) must not surface 9 as a labelled node in EITHER regime —
      // both filter self-loops before branching, so callers treat it as
      // a singleton via their left join (labelling itself)
      val got = cc(limit, Seq((9L, 9L), (1L, 2L), (2L, 2L)))
      assert(got == Map(1L -> 1L, 2L -> 1L))
    }
  }

  test("both paths agree on a random-ish 200-node multi-component graph") {
    // deterministic pseudo-random edges (LCG) — 3 components by
    // construction: ids 0-69, 1000-1069, 2000-2069 with intra-range
    // edges only
    var seed = 42L
    def nxt(n: Int): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; Math.floorMod(seed >>> 33, n.toLong) }
    val edges = (0 until 3).flatMap { c =>
      val base = c * 1000L
      (0 until 90).map(_ => (base + nxt(70), base + nxt(70)))
    }.filter(e => e._1 != e._2)
    val fast = cc(Long.MaxValue, edges)
    val star = cc(0L, edges)
    assert(fast == star)
    // every label is the minimum of its own component
    assert(fast.groupBy(_._2).forall { case (label, members) =>
      members.keys.min == label
    })
  }
}
