package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexOps

/** Structural invariants for the indexing/linkage operators beyond the
  * oracle hash-compare (which pins exact values at sf0.01).
  */
class IndexOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("q98: every dirty record links back at edit distance 1") {
    // the dirty side is one character deletion, the original name stays
    // in the catalog, and the q-gram bound keeps it in the candidates —
    // so the best match must sit at distance exactly 1 for every record
    val rows = IndexOps.q98FuzzyJoin(spark, dir).collect()
    assert(rows.length == 200) // one per part at sf0.001
    assert(rows.forall(_.getInt(3) == 1),
      s"unexpected distances: ${rows.filter(_.getInt(3) != 1).take(3).mkString}")
    assert(rows.forall(_.getLong(4) >= 1)) // n_matches counts the original
  }

  test("q97: postings are doc_id-ordered, df consistent with the list") {
    val rows = IndexOps.q97InvertedIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val postings = r.getString(3).split(",").toSeq
      val ids = postings.map(_.split(":")(0).toLong)
      assert(ids == ids.sorted, s"postings not doc-ordered for ${r.getString(0)}")
      assert(postings.size == math.min(df, IndexOps.PostingsCap.toLong),
        s"cap/df mismatch for ${r.getString(0)}: df=$df, materialized=${postings.size}")
    }
  }

  test("q95: the reported hitters exceed the exact n/k threshold") {
    val rows = IndexOps.q95HeavyHitters(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) * IndexOps.HeavyK > r.getLong(2),
        s"${r.getString(0)} reported below threshold")
    }
  }

  test("q100: salt factor levels the hottest key to the mean") {
    val rows = IndexOps.q100SkewReport(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (maxCnt, mean, salt) = (r.getLong(4), r.getDouble(5), r.getLong(7))
      assert(salt >= 1L)
      assert(salt * mean >= maxCnt - mean,
        s"salt too small for ${r.getString(0)}.${r.getString(1)}")
    }
  }
}
