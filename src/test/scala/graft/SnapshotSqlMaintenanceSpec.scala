package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** The catalog's SQL maintenance surface: `CALL graft's system
  * procedures (compact / expire / vacuum / restore / fast_forward)
  * and `ALTER TABLE … RENAME COLUMN` — the store lifecycle without a
  * library link, the Iceberg operations shape.
  */
class SnapshotSqlMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  /** A suite-private catalog over a temp base — the shared graft_snap
    * catalog instance is pinned to the fixture base for the session,
    * so re-pointing it here would silently read the wrong stores.
    */
  private lazy val base: String = {
    val b = Files.createTempDirectory("graft_maint_").toString
    spark.conf.set("spark.sql.catalog.graft_maint",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_maint.base", b)
    b
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def seed(name: String, commits: Int = 3): String = {
    import spark.implicits._
    val root = s"$base/$name"
    (1 to commits).foreach { i =>
      SnapshotStore.append(spark, root,
        Seq((i.toLong, s"t$i", i * 10L)).toDF("doc_id", "tag", "v"))
    }
    root
  }

  test("CALL system.compact returns the compaction commit and preserves rows") {
    val root = seed("ctbl", commits = 6)
    val before = rows(SnapshotStore.readSnapshot(spark, root, 6L))
    val nFiles = SnapshotStore.manifest(spark, root, 6L).count()
    val out = spark.sql("CALL graft_maint.system.compact('ctbl')").collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L,
      s"compact must report its commit id: ${out.mkString}")
    val after = SnapshotStore.currentSnapshot(spark, root)
    assert(rows(SnapshotStore.readSnapshot(spark, root, after)) == before)
    assert(SnapshotStore.manifest(spark, root, after).count() < nFiles,
      "compaction must shrink the file count")
  }

  test("CALL system.restore rolls the table back through the commit protocol") {
    import spark.implicits._
    val root = seed("rtbl", commits = 2)
    val want = rows(SnapshotStore.readSnapshot(spark, root, 2L))
    SnapshotStore.deleteKeys(spark, root, Seq(1L).toDF("doc_id")) // commit 3
    assert(rows(SnapshotStore.readSnapshot(spark, root, 3L)) != want)
    val out = spark.sql("CALL graft_maint.system.restore('rtbl', 2)").collect()
    assert(out(0).getLong(0) == 4L, "restore commits ON TOP of history")
    assert(rows(SnapshotStore.readSnapshot(spark, root, 4L)) == want,
      "the restored table must read as snapshot 2 exactly")
    // the bad commit stays addressable — restore is a commit, not surgery
    assert(rows(SnapshotStore.readSnapshot(spark, root, 3L)) != want)
  }

  test("CALL system.expire + system.vacuum reclaim history behind the floor") {
    val root = seed("etbl", commits = 3)
    SnapshotStore.compact(spark, root) // commit 4 strands the old files
    val keep = rows(SnapshotStore.readSnapshot(spark, root, 4L))
    spark.sql("CALL graft_maint.system.expire('etbl', 4)").collect()
    // a crashed commit attempt's stray data — exactly what vacuum is
    // FOR (expire already reclaimed the de-referenced history above)
    spark.range(3).selectExpr("id AS doc_id")
      .write.parquet(s"$root/data/cstray")
    val removed =
      spark.sql("CALL graft_maint.system.vacuum('etbl', 0)").collect()
    assert(removed(0).getLong(0) >= 1L,
      "vacuum must reclaim the crashed attempt's unreferenced files")
    assert(rows(SnapshotStore.readSnapshot(spark, root, 4L)) == keep,
      "the surviving snapshot must be byte-identical after the sweep")
  }

  test("CALL system.create_tag pins a ref VERSION AS OF resolves; drop_tag releases it") {
    val root = seed("ttbl", commits = 2)
    spark.sql("CALL graft_maint.system.create_tag('ttbl', 'audited', 1)").collect()
    assert(rows(spark.sql(
      "SELECT * FROM graft_maint.ttbl VERSION AS OF 'audited'")) ==
      rows(SnapshotStore.readSnapshot(spark, root, 1L)),
      "the SQL-created tag must resolve through VERSION AS OF")
    spark.sql("CALL graft_maint.system.drop_tag('ttbl', 'audited')").collect()
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_maint.ttbl VERSION AS OF 'audited'")
        .collect()
    }
  }

  test("an unknown procedure fails loudly with the known names") {
    val e = intercept[Exception] {
      spark.sql("CALL graft_maint.system.frobnicate('x')").collect()
    }
    assert(e.getMessage.contains("frobnicate") ||
      Option(e.getCause).exists(_.getMessage.contains("frobnicate")))
  }

  test("ALTER TABLE RENAME COLUMN is the field-id rename commit; other ALTERs refuse") {
    val root = seed("atbl", commits = 2)
    spark.sql("ALTER TABLE graft_maint.atbl RENAME COLUMN tag TO label")
    assert(SnapshotStore.currentSnapshot(spark, root) == 3L,
      "the rename must land as one metadata commit")
    val df = SnapshotStore.readSnapshot(spark, root, 3L)
    assert(df.columns.toSeq == Seq("doc_id", "label", "v"))
    assert(rows(df.select(col("label"))) == Seq("[t1]", "[t2]"),
      "files written under the old name must serve the new one")
    // the SQL route and the library route are the same commit shape
    val viaSql = rows(spark.sql("SELECT doc_id, label, v FROM graft_maint.atbl"))
    assert(viaSql == rows(df.select("doc_id", "label", "v")))
    // type changes / drops stay refused — no sound lazy-read story
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_maint.atbl DROP COLUMN v")
    }
  }

  test("ALTER TABLE ADD COLUMN is a metadata-only commit; old files read NULL, old snapshots keep their schema") {
    import spark.implicits._
    val root = seed("addtbl", commits = 2)
    spark.sql("ALTER TABLE graft_maint.addtbl ADD COLUMN score BIGINT")
    assert(SnapshotStore.currentSnapshot(spark, root) == 3L,
      "ADD COLUMN must land as one metadata commit")
    // zero data moved: snapshot 3 lists exactly snapshot 2's files
    assert(SnapshotStore.manifest(spark, root, 3L)
      .select("path").collect().map(_.getString(0)).toSet ==
      SnapshotStore.manifest(spark, root, 2L)
        .select("path").collect().map(_.getString(0)).toSet)
    // existing rows read the new column as NULL
    val df = spark.sql("SELECT doc_id, tag, v, score FROM graft_maint.addtbl")
    assert(df.columns.toSeq == Seq("doc_id", "tag", "v", "score"))
    assert(df.collect().forall(_.isNullAt(3)),
      "pre-evolution files must read the added column as NULL")
    // the next INSERT carries real values; old rows stay NULL
    spark.sql("INSERT INTO graft_maint.addtbl " +
      "SELECT CAST(9 AS BIGINT), 'new', CAST(90 AS BIGINT), CAST(7 AS BIGINT)")
    val got = spark.sql(
      "SELECT doc_id, score FROM graft_maint.addtbl ORDER BY doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == Seq((1L, -1L), (2L, -1L), (9L, 7L)))
    // time travel: the pre-ALTER snapshot still has the narrow schema
    assert(spark.sql(
      "SELECT * FROM graft_maint.addtbl VERSION AS OF 2").columns.toSeq ==
      Seq("doc_id", "tag", "v"))
    // the catalog surfaces the widened schema (DESCRIBE reads
    // loadTable's schema — the same sidecar the commit wrote)
    assert(spark.sql("DESCRIBE TABLE graft_maint.addtbl")
      .collect().map(_.getString(0)).contains("score"),
      "DESCRIBE must show the added column")
    // a duplicate add refuses; rename composes with the added column
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_maint.addtbl ADD COLUMN score BIGINT")
    }
    spark.sql("ALTER TABLE graft_maint.addtbl RENAME COLUMN score TO quality")
    assert(spark.sql("SELECT quality FROM graft_maint.addtbl WHERE doc_id = 9")
      .head().getLong(0) == 7L)
  }
}
