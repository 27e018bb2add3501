package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** MERGE-ON-READ SQL UPDATE / MERGE INTO (VERDICT r16 next-round
  * item 1): under `spark.graft.snapshot.updateMode/mergeMode =
  * merge-on-read`, an UPDATE / MERGE lands as ONE delta commit — a
  * position-delete file for the touched rows' old identities plus
  * ordinary data files for the post-images — with ZERO pre-existing
  * data files rewritten, and the read result is byte-identical to the
  * copy-on-write route's.
  *
  * MOR statements run through a DEDICATED session carrying the mode
  * confs, so concurrently-running suites (whose fixtures assert the
  * copy-on-write default) never see them.
  */
class SnapshotMorUpsertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  /** The merge-on-read session: same context, isolated SQL confs. */
  lazy val morSess: SparkSession = {
    val ss = spark.newSession()
    ss.conf.set(SnapshotStore.UpdateModeKey, "merge-on-read")
    ss.conf.set(SnapshotStore.MergeModeKey, "merge-on-read")
    ss
  }
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def ownCatalog(name: String, base: String): Unit =
    Seq(spark, morSess).foreach { ss =>
      ss.conf.set(s"spark.sql.catalog.$name",
        "graft.sources.SnapshotCatalog")
      ss.conf.set(s"spark.sql.catalog.$name.base", base)
    }

  private def dataPaths(root: String, k: Long): Set[String] =
    SnapshotStore.metaFiles(spark, root, k)
      .filter(col("kind") === "data")
      .select("path").collect().map(_.getString(0)).toSet

  test("MOR UPDATE: a 1-row SQL UPDATE rewrites ZERO data files and reads equal to COW") {
    import spark.implicits._
    def seed(dir: String): String = {
      val root = s"$dir/t"
      SnapshotStore.append(spark, root,
        (1L to 400L).map(i => (i, s"tag${i % 7}", i * 3L))
          .toDF("doc_id", "tag", "v"))
      root
    }
    val dMor = java.nio.file.Files.createTempDirectory("graft_moru_").toString
    val dCow = java.nio.file.Files.createTempDirectory("graft_cowu_").toString
    val rootMor = seed(dMor)
    val rootCow = seed(dCow)
    ownCatalog("graft_r17mu", dMor)
    ownCatalog("graft_r17cu", dCow)
    val before = dataPaths(rootMor, 1L)
    val upd = "SET v = v + 1000 WHERE doc_id = 17"
    morSess.sql(s"UPDATE graft_r17mu.t $upd")
    spark.sql(s"UPDATE graft_r17cu.t $upd") // the COW twin
    // the MOR commit: every pre-existing data file carried by
    // reference, plus a posdelete row and a post-image data file
    val m2 = SnapshotStore.metaFiles(spark, rootMor, 2L)
    val after = dataPaths(rootMor, 2L)
    assert(before.subsetOf(after),
      "a 1-row MOR UPDATE must rewrite zero data files")
    assert((after -- before).nonEmpty,
      "the post-image rows need a new data file")
    assert(m2.filter(col("kind") === "posdelete").count() >= 1L,
      "the old identity lands as a position delete")
    // ... while the COW twin rewrote (some original file replaced)
    assert(!dataPaths(rootCow, 1L).subsetOf(dataPaths(rootCow, 2L)),
      "the COW route rewrites the touched group")
    // MOR read == COW read, on every route
    assert(rows(spark.sql("SELECT * FROM graft_r17mu.t")) ==
      rows(spark.sql("SELECT * FROM graft_r17cu.t")),
      "merge-on-read result must equal copy-on-write")
    assert(spark.sql("SELECT v FROM graft_r17mu.t WHERE doc_id = 17")
      .head().getLong(0) == 17L * 3L + 1000L)
    // time travel: the pre-update snapshot is untouched
    assert(spark.sql(
      "SELECT v FROM graft_r17mu.t VERSION AS OF 1 WHERE doc_id = 17")
      .head().getLong(0) == 17L * 3L)
    // a broader MOR UPDATE composes on top of the delta commit
    morSess.sql("UPDATE graft_r17mu.t SET v = 0 WHERE tag = 'tag3'")
    spark.sql("UPDATE graft_r17cu.t SET v = 0 WHERE tag = 'tag3'")
    assert(rows(spark.sql("SELECT * FROM graft_r17mu.t")) ==
      rows(spark.sql("SELECT * FROM graft_r17cu.t")))
    assert(before.subsetOf(dataPaths(rootMor, 3L)),
      "the second MOR UPDATE still rewrites nothing")
  }

  test("MOR MERGE INTO: matched updates + not-matched inserts in one delta commit, equal to COW") {
    import spark.implicits._
    def seed(dir: String): String = {
      val root = s"$dir/t"
      SnapshotStore.append(spark, root,
        (1L to 300L).map(i => (i, s"tag${i % 5}", i * 2L))
          .toDF("doc_id", "tag", "v"))
      root
    }
    val dMor = java.nio.file.Files.createTempDirectory("graft_morm_").toString
    val dCow = java.nio.file.Files.createTempDirectory("graft_cowm_").toString
    val rootMor = seed(dMor)
    val rootCow = seed(dCow)
    ownCatalog("graft_r17mm", dMor)
    ownCatalog("graft_r17cm", dCow)
    // a small upsert batch: 3 updates, 2 inserts, 1 delete — the view
    // is session-scoped, so register it in BOTH sessions
    val srcRows = Seq((10L, "upd", 111L), (20L, "upd", 222L),
      (30L, "upd", 333L), (900L, "new", 900L), (901L, "new", 901L),
      (40L, "del", 0L))
    srcRows.toDF("doc_id", "tag", "v")
      .createOrReplaceTempView("mor_merge_src")
    locally {
      val mi = morSess.implicits
      import mi._
      srcRows.toDF("doc_id", "tag", "v")
        .createOrReplaceTempView("mor_merge_src")
    }
    val merge = (ss: SparkSession, tbl: String) => ss.sql(
      s"""MERGE INTO $tbl t USING mor_merge_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED AND s.tag = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
         |WHEN NOT MATCHED THEN INSERT (doc_id, tag, v)
         |  VALUES (s.doc_id, s.tag, s.v)""".stripMargin)
    val before = dataPaths(rootMor, 1L)
    merge(morSess, "graft_r17mm.t")
    merge(spark, "graft_r17cm.t") // the COW twin
    assert(SnapshotStore.currentSnapshot(spark, rootMor) == 2L,
      "the whole MERGE is ONE delta commit")
    assert(before.subsetOf(dataPaths(rootMor, 2L)),
      "MOR MERGE must rewrite zero data files")
    assert(SnapshotStore.metaFiles(spark, rootMor, 2L)
      .filter(col("kind") === "posdelete").count() >= 1L)
    assert(rows(spark.sql("SELECT * FROM graft_r17mm.t")) ==
      rows(spark.sql("SELECT * FROM graft_r17cm.t")),
      "merge-on-read MERGE must equal copy-on-write")
    // spot checks: update applied, inserts present, delete gone
    assert(spark.sql("SELECT v FROM graft_r17mm.t WHERE doc_id = 10")
      .head().getLong(0) == 111L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_r17mm.t WHERE doc_id >= 900")
      .head().getLong(0) == 2L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_r17mm.t WHERE doc_id = 40")
      .head().getLong(0) == 0L)
    // default mode: the same MERGE shape on a fresh store rewrites (COW)
    assert(SnapshotStore.metaFiles(spark, rootCow, 2L)
      .filter(col("kind") === "posdelete").count() == 0L,
      "the default MERGE mode stays copy-on-write")
  }

  test("MOR mutations compose with compaction and the change feed") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_morc_").toString
    val root = s"$d/t"
    SnapshotStore.append(spark, root,
      (1L to 100L).map(i => (i, i * 10L)).toDF("doc_id", "v"))
    ownCatalog("graft_r17mc", d)
    morSess.sql("UPDATE graft_r17mc.t SET v = -1 WHERE doc_id IN (5, 50)")
    // the change feed of the delta commit nets out to the logical diff:
    // applying (delete pre-images, insert post-images) to snapshot 1
    // yields snapshot 2 exactly
    val feed = SnapshotStore.changeFeedCompact(spark, root, 1L, 2L)
    val dels = feed.filter(col("change_type") === "delete")
      .select("doc_id", "v")
    val ins = feed.filter(col("change_type").isin("insert", "update"))
      .select("doc_id", "v")
    val applied = SnapshotStore.readSnapshot(spark, root, 1L)
      .join(dels.select(col("doc_id").as("__d")),
        col("doc_id") === col("__d"), "left_anti")
      .select("doc_id", "v")
      .unionByName(ins)
    assert(rows(applied) ==
      rows(SnapshotStore.readSnapshot(spark, root, 2L).select("doc_id", "v")),
      "feed(1,2) applied to snapshot 1 must reproduce snapshot 2")
    // compaction folds the delta commit away; the result is unchanged
    val want = rows(spark.sql("SELECT * FROM graft_r17mc.t"))
    SnapshotStore.compact(spark, root)
    assert(rows(spark.sql("SELECT * FROM graft_r17mc.t")) == want,
      "compaction must preserve the MOR-mutated result")
  }
}
