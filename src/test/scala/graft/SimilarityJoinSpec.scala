package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityJoin

/** Unit coverage for the promoted [[SimilarityJoin.allPairs]] operator
  * (q147/q148 gate the corpus-wide no-false-negative property against
  * filter-free DuckDB oracles; this pins the small semantics directly).
  */
class SimilarityJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def docs(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "toks")
  }

  test("finds exactly the pairs meeting tau; jaccard exact") {
    val d = docs(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),   // J(1,2) = 3/5 = 0.6
      3L -> Seq("x", "y"),             // disjoint
      4L -> Seq("a", "b"))             // J(1,4) = J(2,4) = 2/4 = 0.5
    val out = SimilarityJoin.allPairs(d, "id", "toks", 1, 2, 1, 1)
      .orderBy("doc_a", "doc_b").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val j12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(j12.getAs[Double]("jaccard") == 0.6)
    // tighter tau drops the boundary pair
    val hi = SimilarityJoin.allPairs(d, "id", "toks", 3, 5, 1, 1).collect()
    assert(hi.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("tau = 1 matches only identical kept-token sets; duplicates collapse") {
    val d = docs(
      1L -> Seq("a", "b", "a"),        // set {a, b}
      2L -> Seq("b", "a"),
      3L -> Seq("a", "b", "c"))
    val out = SimilarityJoin.allPairs(d, "id", "toks", 1, 1, 1, 1).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("df cut removes ubiquitous tokens from the similarity universe") {
    // "t" is in all 3 docs; with df cut 1/2 it is dropped, leaving the
    // docs' informative tokens fully disjoint -> no pairs at all
    val d = docs(
      1L -> Seq("t", "p"),
      2L -> Seq("t", "q"),
      3L -> Seq("t", "r"))
    assert(SimilarityJoin.allPairs(d, "id", "toks", 1, 2, 1, 2).count() == 0)
    // without the cut, J = 1/3 < 1/2 still no pairs; at tau 1/3 all 3
    val loose = SimilarityJoin.allPairs(d, "id", "toks", 1, 3, 1, 1).collect()
    assert(loose.length == 3)
  }

  test("allPairsBetween emits only cross-side pairs and agrees with the self-join") {
    import spark.implicits._
    val d = docs(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("a", "b", "c"),
      4L -> Seq("a", "b"))
      .withColumn("is_b", col("id").isin(2L, 4L))
    val cross = SimilarityJoin.allPairsBetween(d, "id", "toks", "is_b", 1, 2, 1, 1)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSeq
    // every emitted pair is (standing, delta)
    assert(cross.forall { case (a, b, _) => Set(1L, 3L)(a) && Set(2L, 4L)(b) })
    // equals the self-join over the union restricted to cross-side pairs
    val self = SimilarityJoin.allPairs(d, "id", "toks", 1, 2, 1, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
      .flatMap { case (a, b, j) =>
        // normalize orientation to (standing, delta)
        if (Set(2L, 4L)(a) && Set(1L, 3L)(b)) Some((b, a, j))
        else if (Set(1L, 3L)(a) && Set(2L, 4L)(b)) Some((a, b, j))
        else None
      }.toSeq.sorted
    assert(cross.sorted == self)
    assert(cross.nonEmpty)
  }

  test("invalid rationals are rejected eagerly") {
    val d = docs(1L -> Seq("a"))
    intercept[IllegalArgumentException](
      SimilarityJoin.allPairs(d, "id", "toks", 0, 2, 1, 1))
    intercept[IllegalArgumentException](
      SimilarityJoin.allPairs(d, "id", "toks", 3, 2, 1, 1))
    intercept[IllegalArgumentException](
      SimilarityJoin.allPairs(d, "id", "toks", 1, 2, 0, 1))
  }

  test("spanUnion merges touching windows and counts hits") {
    import spark.implicits._
    // doc 1: windows at 0,2,4 with width 4 chain into one span [0,8);
    // window at 20 opens a second span [20,24)
    val hits = Seq((1L, 0L), (1L, 2L), (1L, 4L), (1L, 20L), (2L, 5L))
      .toDF("doc_id", "start0")
    val out = SimilarityJoin.spanUnion(hits, 4)
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getLong(0) == 1L)
    assert(d1.getAs[Long]("n_spans") == 2L)
    assert(d1.getAs[Long]("covered_tokens") == 12L) // 8 + 4
    assert(d1.getAs[Long]("longest_span") == 8L)
    assert(d1.getAs[Long]("n_hit_windows") == 4L)
    val d2 = out(1)
    assert(d2.getAs[Long]("n_spans") == 1L)
    assert(d2.getAs[Long]("covered_tokens") == 4L)
  }
}
