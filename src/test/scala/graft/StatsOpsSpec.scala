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
}
