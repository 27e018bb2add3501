package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps

/** Structural invariants for the corpus-lifecycle operators beyond the
  * oracle hash-compare — above all the CROSS-CORPUS stability the
  * scaladocs claim: assignments that are pure functions of the doc id
  * must agree between two different corpora that share ids (the
  * "adding documents never moves an existing one" property that
  * rand()-based splits lack).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val small = "/root/testdata/sf0.001"
  private val big = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("q88 split/shard assignment is identical across corpora sharing ids") {
    def asMap(dir: String): Map[Long, (String, Long, Long)] =
      PipelineOps.q88DatasetSplit(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
    val a = asMap(small)
    val b = asMap(big)
    val shared = a.keySet intersect b.keySet
    assert(shared.nonEmpty)
    assert(shared.forall(id => a(id) == b(id)),
      "a doc's split/shard moved between corpora — the assignment is not id-pure")
    // the split is a real partition: every class non-empty at sf0.01
    assert(b.values.map(_._1).toSet == Set("train", "val", "test"))
  }

  test("q105 weighted sample is the true per-language top-k by A-ES key") {
    // (the key itself is content-derived via quality, so it is NOT
    // id-pure across corpora — only the uniform draw is; the id-purity
    // property is q88's, tested above)
    val rows = graft.operators.LlmOps.q105WeightedSample(spark, small).collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= graft.operators.LlmOps.WeightedSampleK)
      // ranks are 1..k and keys strictly ordered with them
      val ordered = rs.sortBy(_.getInt(4))
      assert(ordered.map(_.getInt(4)).toSeq == (1 to rs.length))
      val keys = ordered.map(_.getDouble(3))
      assert(keys.zip(keys.tail).forall { case (hi, lo) => hi >= lo },
        s"$lang: sample keys not descending with rank")
    }
    assert(byLang.size >= 4) // all fixture languages stratified
  }

  test("q87 CDC classes partition the id space per the modular rules") {
    val rows = PipelineOps.q87SnapshotDelta(spark, small).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, status) =>
      val inOld = id % 13 != 5
      val inNew = id % 11 != 7
      val expected =
        if (!inOld && inNew) "added"
        else if (inOld && !inNew) "deleted"
        else if (id % 7 == 0) "changed"
        else "unchanged"
      assert(status == expected, s"doc $id: got $status, expected $expected")
    }
    // every class is exercised by the fixture derivation
    assert(rows.values.toSet ==
      Set("added", "deleted", "changed", "unchanged"))
  }

  test("q120 winsorization clamps exactly to the cutoffs, nothing inside moves") {
    val rows = PipelineOps.q120Winsorize(spark, small).collect()
    val clipped = rows.filter(_.getLong(3) == 1L)
    val kept = rows.filter(_.getLong(3) == 0L)
    assert(clipped.nonEmpty && kept.nonEmpty)
    // unclipped rows pass through identically
    kept.foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
    // clipped rows land exactly on one of the two cutoffs
    val cutoffs = clipped.map(_.getDouble(2)).toSet
    assert(cutoffs.size == 2, s"expected two cutoff values, got $cutoffs")
    // ~10% of rows clip (5% per tail), within tolerance for ties
    val ratio = clipped.length.toDouble / rows.length
    assert(ratio > 0.05 && ratio < 0.15, s"clip ratio $ratio")
  }

  test("q110 interval form matches a brute-force per-user reference") {
    // independent single-threaded reference: for each user and grid
    // instant, scan the user's (pre-averaged) events for the bracketing
    // pair and apply the same interpolation arithmetic — pins the
    // interval rewrite's boundary semantics (exact-hit grid points,
    // before-first/after-last NULLs, same-instant averaging)
    import org.apache.spark.sql.functions._
    val hourUs = 3600000000L
    val ev = Engine.table(spark, small, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val byUs = rows.groupBy(_.getLong(1)).map { case (us, rs) =>
          val exact = rs.map(r => BigDecimal(r.getDouble(2))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
          us -> (exact / rs.length).toDouble
        }
        u -> byUs.toSeq.sortBy(_._1)
      }
    val g0 = ev.values.flatten.map(_._1).min / hourUs * hourUs
    val g1 = ev.values.flatten.map(_._1).max / hourUs * hourUs
    def interpAt(events: Seq[(Long, Double)], s: Long): Option[Double] = {
      val prev = events.filter(_._1 <= s).lastOption
      val next = events.find(_._1 > s)
      prev match {
        case Some((pu, pv)) if pu == s => Some(BigDecimal(pv)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        case Some((pu, pv)) => next.map { case (nu, nv) =>
          BigDecimal(pv + (nv - pv) * ((s - pu).toDouble / (nu - pu)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        case None => None
      }
    }
    val expected = (for {
      (u, events) <- ev
      s <- g0 to g1 by hourUs
    } yield (u, s) -> interpAt(events, s)).toMap
    val got = PipelineOps.q110Interpolate(spark, small).collect()
      .map { r =>
        val ts = r.getTimestamp(1)
        (r.getLong(0), ts.getTime * 1000L) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      }.toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size}")
    val diffs = expected.collect {
      case (k, e) if got.get(k).flatten != e && got.contains(k) => (k, e, got(k))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }

  test("q173: sampled boundaries keep every range partition within 2x of ideal") {
    for (dir <- Seq(small, big)) {
      val rows = PipelineOps.q173RangePlanner(spark, dir).collect()
      assert(rows.length == PipelineOps.RangeParts, s"$dir: ${rows.length}")
      // partitions are contiguous: each one's hi is the next one's lo
      rows.sortBy(_.getLong(0)).sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(2) == b.getLong(1),
          s"$dir: boundary gap between pid ${a.getLong(0)} and ${b.getLong(0)}")
      }
      // conservation + the balance the 512-row sample is sized to buy
      assert(rows.map(_.getLong(3)).sum == rows.head.getLong(4))
      rows.foreach { r =>
        val ratio = r.getDouble(6)
        assert(ratio > 0.5 && ratio < 2.0,
          s"$dir: pid ${r.getLong(0)} balance $ratio outside [0.5, 2.0]")
      }
    }
  }

  test("q173: degenerate inputs plan cleanly — empty table and sub-sample table") {
    import spark.implicits._
    // EMPTY input: the ADVICE r11 guard — n_sample = 0 must yield an
    // empty boundary list and an empty (zero-row) plan, not a NULL
    // boundary array or an ANSI element_at error
    val empty = Seq.empty[(Long, Long)].toDF("o_orderkey", "v")
    assert(PipelineOps.rangePlan(empty).collect().isEmpty)
    // sub-sample-size input (< 512 rows): the ADVICE r10 clamp —
    // boundaries repeat/coarsen but the plan stays exhaustive (row
    // conservation) and contiguous
    val tiny = (1L to 40L).map(i => (i, i * 100L)).toDF("o_orderkey", "v")
    val rows = PipelineOps.rangePlan(tiny).collect()
    assert(rows.map(_.getLong(3)).sum == 40L, "tiny plan must conserve rows")
    assert(rows.forall(r => !r.isNullAt(3)))
  }

  test("q170: zone maps never miss rows; z-order dominates the day/both predicates") {
    for (dir <- Seq(small, big)) {
      val rows = PipelineOps.q170ZorderLayout(spark, dir).collect()
        .map { r =>
          (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        }.toMap
      assert(rows.size == 6, s"$dir: ${rows.keySet}")
      // soundness: a zone-map scan may over-read but never under-read —
      // every predicate's matched rows lie inside its scanned rows
      rows.foreach { case ((lay, pred), (zt, zs, scanned, matched)) =>
        assert(zs <= zt && scanned >= matched,
          s"$dir $lay/$pred scanned=$scanned < matched=$matched")
      }
      // both layouts agree on the ground truth per predicate
      for (p <- Seq("user", "day", "both"))
        assert(rows(("linear", p))._4 == rows(("zorder", p))._4)
      // a single-key layout cannot skip anything for the other key:
      // linear/day must scan every occupied zone
      val (lzt, lzs, _, _) = rows(("linear", "day"))
      assert(lzs == lzt, s"$dir: linear/day scanned $lzs of $lzt zones")
      // the z-order claims: strictly fewer rows scanned for the
      // day-only predicate, and no worse for the conjunction
      assert(rows(("zorder", "day"))._3 < rows(("linear", "day"))._3,
        s"$dir: z-order did not beat linear on the day predicate")
      assert(rows(("zorder", "both"))._3 <= rows(("linear", "both"))._3,
        s"$dir: z-order lost the conjunctive predicate")
    }
  }
}
