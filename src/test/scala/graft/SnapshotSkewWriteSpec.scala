package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotStore, SnapshotTableSource}

/** SKEW-SAFE identity-partitioned writes (VERDICT r16 what's-missing
  * 3): a hot partition value splits into multiple doc_id-RANGE files
  * through parallel tasks instead of serializing through one; every
  * file stays single-valued with tight id stats, the layout claim
  * survives, and metadata-answered GROUP BY still sums per-file rows
  * exactly.
  */
class SnapshotSkewWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("a 90%-one-value input writes multiple single-valued range files for the hot value") {
    val d = java.nio.file.Files.createTempDirectory("graft_skew_").toString
    val root = s"$d/t"
    // 10k rows: 90% lang=en, 10% spread over 3 cold values
    // an ISOLATED session for the conf knob: suites share the JVM, and
    // a session-global threshold would poison concurrently-building
    // fixtures of other suites
    val sess = spark.newSession()
    val df = sess.range(1L, 10001L).select(col("id").as("doc_id"),
      when(col("id") % 10 =!= 0, lit("en"))
        .otherwise(concat(lit("x"), (col("id") % 3).cast("string")))
        .as("lang"),
      (col("id") * 2L).as("n_chars"))
    sess.conf.set(SnapshotStore.PartitionSplitRowsKey, "2000")
    SnapshotStore.appendPartitioned(sess, root, df, "lang")
    val m = SnapshotStore.manifest(spark, root, 1L)
      .select("path", "part_val", "n_rows", "min_id", "max_id").collect()
    val hot = m.filter(_.getAs[String]("part_val") == "en")
    assert(hot.length >= 5,
      s"9000 en rows at 2000/file must split into >=5 files, got ${hot.length}")
    m.foreach { r =>
      // every file still single-valued (the write path asserts it from
      // the data; re-check from disk)
      val vals = spark.read.parquet(r.getAs[String]("path"))
        .select("lang").distinct().collect().map(_.getString(0)).toSeq
      assert(vals == Seq(r.getAs[String]("part_val")))
    }
    // range slicing, not hash salting: the hot value's files cover
    // near-disjoint id intervals (each strictly narrower than the
    // whole), so stats still prune
    val spans = hot.map(r =>
      (r.getAs[Long]("min_id"), r.getAs[Long]("max_id"))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"slices must be id-disjoint: ${spans.toSeq}")
      case _ => ()
    }
    // cold values stay compact (a range boundary may straddle one —
    // at most 2 files, never the hot value's fragmentation)
    val cold = m.filterNot(_.getAs[String]("part_val") == "en")
    assert(cold.groupBy(_.getAs[String]("part_val"))
      .forall(_._2.length <= 2), "cold values must not fragment")
    // the layout claim survives the split
    assert(SnapshotStore.partSpecOf(spark, root, 1L).contains("lang"))
    // reads: value pruning plans exactly the value's files; totals
    // right — via a SPEC-UNIQUE catalog (the shared graft_snap name
    // races across concurrently-running suites)
    spark.conf.set("spark.sql.catalog.graft_r17sk",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r17sk.base", d)
    val tbl = "graft_r17sk.`t`"
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE lang = 'en'")
      .head().getLong(0) == 9000L)
    assert(SnapshotTableSource.lastPlannedFiles.get(root) == hot.length,
      "value pruning must plan exactly the hot value's slice files")
    // metadata-answered GROUP BY sums per-file rows across the slices
    val got = spark.sql(
      s"SELECT lang, count(*) AS n FROM $tbl GROUP BY lang ORDER BY lang")
    val want = df.groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")
    assert(rows(got) == rows(want))
    assert(SnapshotTableSource.lastAggPushed.get(root),
      "the grouped aggregate still answers from the manifest")
    // and a range predicate WITHIN the hot value prunes to a subset of
    // its slices (the tight per-slice id stats at work)
    spark.sql(s"SELECT count(*) AS n FROM $tbl " +
      "WHERE lang = 'en' AND doc_id BETWEEN 1 AND 500").collect()
    assert(SnapshotTableSource.lastPlannedFiles.get(root) < hot.length,
      "id bounds must prune slices of the hot value")
  }

  test("default threshold: fixture-scale writes keep one file per value (no fragmentation regression)") {
    val d = java.nio.file.Files.createTempDirectory("graft_noskew_").toString
    val root = s"$d/t"
    val df = spark.range(1L, 1001L).select(col("id").as("doc_id"),
      concat(lit("v"), (col("id") % 4).cast("string")).as("tag"))
    SnapshotStore.appendPartitioned(spark, root, df, "tag")
    val m = SnapshotStore.manifest(spark, root, 1L).select("part_val").collect()
    assert(m.length == 4, "4 values, 4 files under the default threshold")
  }
}
