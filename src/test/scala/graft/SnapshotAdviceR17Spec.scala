package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotReaderFactory, SnapshotStore}

/** Round-17 ADVICE fixes, pinned:
  *   1. CREATE TABLE with more than one partition transform refuses at
  *      DDL time instead of silently keeping the LAST transform.
  *   2. The layout sidecar lands only AFTER the CREATE commit succeeds
  *      — a CREATE that loses the claim race leaves no declaration.
  *   3. The reader's broadcast Hadoop conf re-broadcasts when a folded
  *      session conf changes (was: first caller's values forever).
  *   4. SELECT-path pushed strict bounds at the domain extremes
  *      (`> Long.MaxValue`, `< Long.MinValue`) select NOTHING — the ±1
  *      tighten arithmetic must not wrap into a full-range bound.
  *  (5. CDC spill-dir namespacing is pinned in SnapshotCdcSourceSpec's
  *      concurrent-streams test.)
  */
class SnapshotAdviceR17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("CREATE TABLE refuses multi-transform partition specs instead of keeping the last") {
    val d = java.nio.file.Files.createTempDirectory("graft_mtx_").toString
    spark.conf.set("spark.sql.catalog.graft_r17mtx",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r17mtx.base", d)
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // two identity transforms
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_r17mtx.t1 (doc_id BIGINT, a STRING, " +
        "b STRING) PARTITIONED BY (a, b)")
    }
    assert(chainMsg(e1).contains("at most one identity"),
      s"two identity columns must refuse loudly: ${chainMsg(e1)}")
    // two bucket transforms (distinct columns — Spark itself refuses a
    // duplicate-column spec before the catalog sees it)
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_r17mtx.t2 (doc_id BIGINT, a STRING, " +
        "v BIGINT) PARTITIONED BY (bucket(4, doc_id), bucket(8, v))")
    }
    assert(chainMsg(e2).contains("at most one bucket"))
    // neither refused CREATE may have left an addressable table or a
    // layout declaration behind
    val f = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(s"$d/t1/manifests")) &&
      !f.exists(new Path(s"$d/t2/manifests")),
      "a refused CREATE must not leave table metadata")
    // the single-transform shape still works
    spark.sql("CREATE TABLE graft_r17mtx.t3 (doc_id BIGINT, a STRING) " +
      "PARTITIONED BY (a)")
    assert(SnapshotStore.declaredPart(spark, s"$d/t3").contains("a"))
  }

  test("a CREATE that loses the claim race leaves no layout sidecar") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_losct_").toString
    val root = s"$d/store"
    // the table already has commits: createTable must fail its
    // require(prev == 0) — and, post-fix, must NOT have written the
    // layout declaration first (which would silently re-layout every
    // future write of the existing table)
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("doc_id", "tag"))
    intercept[Exception] {
      SnapshotStore.createTable(spark, root,
        Seq((1L, "a")).toDF("doc_id", "tag").schema,
        partition = Some("tag"))
    }
    assert(SnapshotStore.declaredPart(spark, root).isEmpty,
      "a failed CREATE must not leave a layout declaration")
    assert(SnapshotStore.declaredBucket(spark, root).isEmpty)
  }

  test("confBroadcast re-broadcasts when a folded session conf changes") {
    val b0 = SnapshotReaderFactory.confBroadcast(spark)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val b1 = SnapshotReaderFactory.confBroadcast(spark)
      assert(b1.value.value.get("spark.sql.session.timeZone") ==
        "America/New_York",
        "a changed session timezone must reach the broadcast conf")
      assert(!(b0 eq b1), "a changed folded conf must re-broadcast")
      // stable confs keep the single-broadcast fast path
      val b2 = SnapshotReaderFactory.confBroadcast(spark)
      assert(b1 eq b2, "unchanged confs must reuse the cached broadcast")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("SELECT with strict bounds at the domain extremes returns nothing (no ±1 wrap)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_xbnd_").toString
    val root = s"$d/store"
    SnapshotStore.append(spark, root,
      Seq((1L, "a"), (2L, "b"), (Long.MaxValue, "hi"), (Long.MinValue, "lo"))
        .toDF("doc_id", "tag"))
    spark.conf.set("spark.sql.catalog.graft_r17xb",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.graft_r17xb.base", d)
    val tbl = "graft_r17xb.`store`"
    def n(where: String): Long =
      spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE $where").head().getLong(0)
    // pre-fix these wrapped into consumed full-range bounds → 4 rows
    assert(n(s"doc_id > ${Long.MaxValue}L") == 0L,
      "> Long.MaxValue selects nothing")
    assert(n(s"doc_id < ${Long.MinValue}L") == 0L,
      "< Long.MinValue selects nothing")
    // the non-strict edges still select exactly the edge rows
    assert(n(s"doc_id >= ${Long.MaxValue}L") == 1L)
    assert(n(s"doc_id <= ${Long.MinValue}L") == 1L)
    // and ordinary strict bounds are unchanged
    assert(n("doc_id > 1L") == 2L, "(2, MaxValue) — MinValue excluded")
  }
}
