package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticsOps, LlmOps}

/** Semantic invariants of the analytics layer (q121–q128) that a
  * value-compare against the oracle cannot see — the properties a
  * USER of these operators assumes.
  */
class AnalyticsOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("q121: offset-0 retention is exactly 1.0 and cells never exceed cohort size") {
    val rows = AnalyticsOps.q121RetentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, active, size, ret) =
        (r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
          r.getAs[Long]("cohort_size"), r.getAs[Double]("retention"))
      assert(active <= size)
      if (off == 0) assert(ret == 1.0, "every cohort member is active in its own first week")
    }
  }

  test("q122: outgoing transition probabilities sum to ~1 per source type") {
    val rows = AnalyticsOps.q122MarkovTransitions(spark, sf).collect()
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-4, s"src=$src sums to $total")
    }
  }

  test("q125: shard manifest partitions the corpus exactly") {
    val rows = AnalyticsOps.q125ShardManifest(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = Engine.table(spark, sf, "documents").count()
    assert(total == docs)
    assert(rows.map(_.getAs[Long]("shard")).distinct.length == rows.length)
  }

  test("q126: arms partition the users and z is identical on both rows") {
    val rows = AnalyticsOps.q126AbTest(spark, sf).collect()
    assert(rows.length == 2)
    val users = Engine.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    assert(rows.map(_.getAs[Double]("z")).distinct.length == 1)
  }

  test("round-6 analytics are invariant to shuffle-partition count") {
    // the determinism discipline's operational claim: integer/decimal
    // sufficient statistics + one final double expression means the
    // SAME bytes under any parallelism — re-plan each query under
    // adversarial shuffle widths and require identical collected output
    val names = Seq("q121_retention_cohorts", "q122_markov_transitions",
      "q124_code_detect", "q125_shard_manifest", "q126_ab_test",
      "q128_decayed_engagement", "q131_rfm_segments", "q123_cms_sketch")
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] =
      names.map(n => n ->
        SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val narrow = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "37")
      val wide = runAll()
      names.foreach { n =>
        assert(narrow(n).nonEmpty, s"$n empty")
        assert(narrow(n) == wide(n), s"$n changed under repartitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("q127: containment dominates jaccard on every reported pair") {
    val jac = LlmOps.q45MinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    val cont = LlmOps.q127ContainmentDedup(spark, sf).collect()
    assert(cont.nonEmpty)
    cont.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val c = r.getAs[Double]("containment")
      assert(c >= graft.operators.LlmOps.ContainThreshold)
      // |A∩B|/min ≥ |A∩B|/|A∪B| — any banded pair scored by both must agree
      jac.get(key).foreach(j => assert(c >= j))
    }
  }
}
