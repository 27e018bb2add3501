package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Direct tests for the distributed connected-components loop behind
  * q62 — synthetic graphs with known components, independent of the
  * SimHash candidate generation (which the q62 oracle covers).
  * Correctness contract: one row per non-singleton node, label =
  * component minimum.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    LlmOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 60-node chain collapses to one component in O(log n) rounds") {
    // worst case for plain propagation (diameter = n); pointer jumping
    // must still converge and label everything with the chain minimum
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = cc(chain: _*)
    assert(got.keySet == (0L until 60L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint components keep distinct minimum labels") {
    val got = cc((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L))
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("star graph: all leaves adopt the hub minimum") {
    val got = cc((1L to 9L).map(i => (0L, i)): _*)
    assert(got.keySet == (0L to 9L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("transitive closure across bridge edges (A~B, B~C => one cluster)") {
    // the reason pairs alone can't dedup a corpus: 5 and 7 share no edge
    val got = cc((5L, 6L), (6L, 7L))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("empty edge list yields empty labels") {
    assert(cc() == Map.empty)
  }
}
