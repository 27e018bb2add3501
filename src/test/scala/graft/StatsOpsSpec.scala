package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsOps

/** Statistical-soundness properties the oracle hash pins numerically
  * but can't express as invariants.
  */
class StatsOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("q172: the bootstrap interval covers the exact median at every fixture SF") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = StatsOps.q172BootstrapCi(spark, dir).collect()
      assert(r.length == 1)
      val row = r.head
      def l(c: String) = row.getLong(row.fieldIndex(c))
      assert(l("n_replicas") == StatsOps.BootB.toLong)
      // half-sample medians straddle the full-sample median: an
      // interval built from their 5%/95% ranks must contain it (a
      // broken replica membership or a flipped median definition
      // shifts the envelope off the point estimate)
      assert(l("ci_lo") <= l("median_exact") && l("median_exact") <= l("ci_hi"),
        s"$dir: CI [${l("ci_lo")}, ${l("ci_hi")}] misses median " +
          s"${l("median_exact")}")
      assert(l("ci_width") >= 0 && l("ci_width") == l("ci_hi") - l("ci_lo"))
    }
  }

  test("q174: recurrence self-consistent on the fixture; a level shift alarms after the shift only") {
    // fixture sanity: the recurrence is internally consistent (S >= 0,
    // alarm <=> S > h). Quietness is NOT asserted — at sf0.001 the
    // daily Poisson noise is a large fraction of the mean and the
    // fixed 1%-slack tuning is deliberately fast-detection-sensitive;
    // the oracle pins the exact behavior either way.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = StatsOps.q174CusumChangepoint(spark, dir).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (s0, h, a) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(s0 >= 0 && a == (if (s0 > h) 1L else 0L), s"$dir: $r")
      }
    }
    // synthetic corpus: 20 days x 100 events, then 10 days x 200 — the
    // crawler-doubled scenario the detector exists for
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cusum_fixture").toString
    (for {
      d <- 0 until 30
      i <- 0 until (if (d < 20) 100 else 200)
    } yield (d.toLong * 100000 + i,
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
      i.toLong, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = StatsOps.q174CusumChangepoint(spark, dir).collect()
    val alarmDays = out.filter(_.getLong(out.head.fieldIndex("is_alarm")) == 1L)
      .map(_.getDate(0).toString).sorted.toSeq
    assert(alarmDays.nonEmpty, "level shift raised no alarm")
    assert(alarmDays.forall(_ >= "2024-01-21"),
      s"alarm before the shift: $alarmDays")
    assert(alarmDays.contains("2024-01-30"),
      "alarm did not persist through the drifted tail")
  }
}
