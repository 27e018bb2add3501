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

  test("q169: under-filled sketches degrade to the exact answer") {
    // sf0.001's union key domain (~165 distinct) fits inside k=256, so
    // every estimate must EQUAL its exact column — the estimator's
    // under-fill branch is "the sketch IS the key set", and any
    // deviation means the sampling or multiplicity probe is wrong
    val r = IndexOps.q169JoinCardinality(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    def d(c: String) = row.getDouble(row.fieldIndex(c))
    def l(c: String) = row.getLong(row.fieldIndex(c))
    assert(l("nd_a") < l("k") && l("nd_b") < l("k"),
      "fixture outgrew k; under-fill branch no longer exercised")
    assert(d("nd_a_est") == l("nd_a").toDouble)
    assert(d("nd_b_est") == l("nd_b").toDouble)
    assert(d("nd_inter_est") == l("nd_inter_exact").toDouble)
    assert(d("join_est") == l("join_exact").toDouble)
    assert(d("rel_err") == 0.0)
    assert(l("n_sample_inter") == l("nd_inter_exact"))
  }

  test("q169: filled sketches estimate within the KMV error envelope") {
    // sf0.01's orders side (1500 keys) overflows k=256 while events
    // (150) under-fills — the mixed case:
    // estimates are no longer exact but must land within the standard
    // KMV relative-error envelope (~1/sqrt(k) ≈ 6.25%) times a 4x
    // safety factor — loose enough to never flake (the sketch is
    // deterministic), tight enough that a broken estimator (e.g. a
    // dropped branch returning k) cannot pass
    val r = IndexOps.q169JoinCardinality(spark, "/root/testdata/sf0.01")
      .collect().head
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    def l(c: String) = r.getLong(r.fieldIndex(c))
    assert(l("nd_b") > l("k"), "orders side should overflow k at sf0.01")
    val envelope = 4.0 / math.sqrt(IndexOps.JoinEstK.toDouble)
    assert(math.abs(d("nd_b_est") - l("nd_b")) / l("nd_b") <= envelope,
      s"nd_b_est ${d("nd_b_est")} vs ${l("nd_b")}")
    assert(d("rel_err") <= envelope,
      s"join estimate off by ${d("rel_err")} (> $envelope)")
  }

  test("q177: sketch merge is exact; q178 exposes the uniform assumption's skew gap") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // the mergeability theorem, value-checked: refreshed stats from
      // base+delta sketches equal the from-scratch ANALYZE
      val m = IndexOps.q177StatsMaintenance(spark, dir).collect()
      assert(m.length == 2 && m.forall(
        _.getLong(m.head.fieldIndex("merge_exact")) == 1L), s"$dir: $m")
      // the audit's point: the uniform 1/NDV estimate is tight on the
      // balanced event_type domain and visibly wrong on the skewed
      // lang domain — if this inverts, the fixture (or the estimator)
      // changed out from under the audit
      val a = IndexOps.q178SelectivityAudit(spark, dir).collect()
        .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("abs_err")))
        .toMap
      assert(a("eq_lang_en") > 5 * a("eq_event_view"),
        s"$dir: lang err ${a("eq_lang_en")} vs event ${a("eq_event_view")}")
    }
  }

  test("q153: scope keys never merge days from different months") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a synthetic frame STRADDLING a month boundary — including the
    // same-day-of-month trap (Mar 2 and Apr 2 both sit in "week 0" of
    // their months) and the short-week tail (Mar 29–31 = week 4)
    val days = Seq("2026-03-02", "2026-03-29", "2026-03-30", "2026-03-31",
      "2026-04-01", "2026-04-02", "2026-04-03")
    val scoped = days.toDF("d")
      .select(to_date(col("d")).as("day"))
      .select(col("day"), explode(IndexOps.rollupScopes("day")).as("scope"))
    // every scope key contains days of exactly ONE calendar month
    val monthsPerScope = scoped
      .groupBy(col("scope"))
      .agg(countDistinct(date_format(col("day"), "yyyy-MM")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(monthsPerScope.values.forall(_ == 1L),
      s"scope merged months: $monthsPerScope")
    // the trap pair lands in distinct month-qualified week scopes
    val wk = scoped.filter(col("scope").contains("_week_"))
      .collect().map(r => r.getDate(0).toString -> r.getString(1)).toMap
    assert(wk("2026-03-02") == "2026-03_week_0")
    assert(wk("2026-04-02") == "2026-04_week_0")
    assert(wk("2026-03-02") != wk("2026-04-02"))
    assert(wk("2026-03-31") == "2026-03_week_4")
    assert(wk("2026-04-01") == "2026-04_week_0")
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
