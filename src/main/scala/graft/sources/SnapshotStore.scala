package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-manifest table store — the mini table format that swaps
  * content-scan freshness for an O(1) snapshot id.
  *
  * Every standing artifact in this engine keys freshness on a corpus
  * CONTENT signature — one map-side-combinable aggregate, cheap but
  * still a full scan. Its own scaladoc has said from the start that
  * "at 100 TB a table-format engine swaps this content scan for the
  * snapshot id its catalog already maintains" (StandingIndex.corpusSig).
  * This store IS that swap, built from scratch on plain parquet the
  * way Iceberg/Delta build it: immutable data files, a MANIFEST per
  * snapshot listing the table's full file set, and a commit protocol
  * where the manifest write is the commit point.
  *
  * Layout under the artifact root:
  * {{{
  *   data/c<k>/part-*.parquet   -- commit k's immutable data files
  *   manifests/m<k>/            -- snapshot k: (path, commit_id, n_rows)
  *                                 one row PER FILE, parquet, _SUCCESS
  *                                 is the commit marker
  *   meta/                      -- the store's own build signature
  * }}}
  *
  * Invariants the protocol buys (all spec-pinned):
  *   - APPEND-ONLY + MANIFEST-LAST: data files land first; the
  *     manifest naming them is written last, so a crash mid-commit
  *     leaves orphan files that NO reader ever lists — readers see
  *     the previous snapshot, never a torn one.
  *   - TIME TRAVEL is free: manifest `m<k>` permanently names
  *     snapshot k's exact file set; reading "as of k" is reading that
  *     list, no directory walk, no tombstones.
  *   - SNAPSHOT DIFF is file-level: append-only means rows added
  *     between snapshots j < k are exactly the files with
  *     `commit_id > j` in manifest k — CDC without comparing a single
  *     row (q87's row-level CDC remains for stores that update).
  *   - O(1) FRESHNESS: an artifact derived from this table validates
  *     against the CURRENT SNAPSHOT ID — a directory listing of
  *     `manifests/`, zero data read — instead of re-hashing the
  *     corpus. At 100 TB that is the difference between a metadata
  *     lookup and a full scan before every reuse decision.
  *
  * Scale shape: manifests are O(#files) rows of metadata — the
  * Iceberg manifest-file shape; reading a snapshot hands Spark the
  * explicit file list the way a table-format planner does. The
  * fixture store is seeded from `documents` in two deterministic
  * commits (initial load, late arrivals) so time travel and diff have
  * exact DuckDB oracles over the raw table.
  */
object SnapshotStore {

  /** Store layout version, folded into the build signature. Bumped to
    * 2 when manifests gained per-file (min_id, max_id) stats and the
    * seed commits became range-clustered on doc_id (older stored
    * stores rebuild once).
    */
  private val SnapLayout = 2L

  /** Files per commit in the seeded store — each commit is
    * range-clustered on doc_id across this many files, so the per-file
    * stats in the manifest are disjoint and a doc_id range predicate
    * can actually skip files. Production sizes this as
    * commit_bytes / target_file_bytes.
    */
  val CommitFiles = 4

  private[graft] def snapRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snap")

  private[graft] def snapSig(s: SparkSession, dir: String): (Long, Long) = {
    val (n, sg) = StandingIndex.tableSig(s, dir, "documents",
      graft.Engine.table(s, dir, "documents").columns.toSeq)
    (n, Math.floorMod(sg + SnapLayout, StandingIndex.SigMod))
  }

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The CURRENT snapshot id: max k over committed manifests — a
    * single directory listing of `manifests/`, never a data read.
    * A manifest counts only with its `_SUCCESS` marker (a torn
    * manifest write is not a commit). 0 = empty table (no commits).
    */
  def currentSnapshot(s: SparkSession, root: String): Long = {
    val mdir = new Path(s"$root/manifests")
    val f = fs(s, root)
    if (!f.exists(mdir)) return 0L
    f.listStatus(mdir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("m") &&
        f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(1).toLong)
      .foldLeft(0L)(math.max)
  }

  /** Manifest k as a DataFrame: one (path, commit_id, n_rows) row per
    * data file in snapshot k. Metadata scale — O(#files) rows.
    */
  def manifest(s: SparkSession, root: String, k: Long): DataFrame =
    s.read.parquet(s"$root/manifests/m$k")

  /** COMMIT: append `df` as snapshot `current + 1`. Data files land
    * under an immutable per-commit directory FIRST — range-clustered
    * on `doc_id` across [[CommitFiles]] files, so the per-file stats
    * below are tight; the new manifest (previous file set + the new
    * files, each with its (min_id, max_id, n_rows) stats) is written
    * LAST — the commit point. Returns the new snapshot id. Not
    * thread-safe across writers by design (single-writer, like a bare
    * Delta log without a lock service); readers are always safe.
    *
    * The per-file stats pass reads each new file's (min, max, count)
    * once at commit time — a driver loop over the COMMIT's files
    * (never the table's), each a footer-sized aggregate; a production
    * writer lifts these from the parquet footer statistics it just
    * wrote instead of re-reading.
    */
  def append(s: SparkSession, root: String, df: DataFrame): Long = {
    import s.implicits._
    val prev = currentSnapshot(s, root)
    val k = prev + 1
    val dataDir = s"$root/data/c$k"
    // overwrite: if a PREVIOUS attempt at commit k tore (data written,
    // no manifest), its orphan files are unreferenced by every
    // manifest — replacing them is the retry path, not a conflict
    df.repartitionByRange(CommitFiles, col("doc_id"))
      .write.mode("overwrite").parquet(dataDir)
    val files = fs(s, root).listStatus(new Path(dataDir)).toSeq
      .map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
    require(files.nonEmpty, s"commit $k wrote no data files")
    val added = files.map { p =>
      val st = s.read.parquet(p)
        .agg(count(lit(1)).cast("long"), min(col("doc_id")).cast("long"),
          max(col("doc_id")).cast("long")).head()
      (p, k, st.getLong(0), st.getLong(1), st.getLong(2))
    }.toDF("path", "commit_id", "n_rows", "min_id", "max_id")
    val full = if (prev == 0L) added
      else manifest(s, root, prev).unionByName(added)
    // manifest LAST = the commit: a crash before this line leaves
    // orphan data files no reader ever lists; overwrite because a
    // torn manifest dir (no _SUCCESS — not a commit) must be
    // retryable, and this store is single-writer by contract
    full.coalesce(1).write.mode("overwrite")
      .parquet(s"$root/manifests/m$k")
    k
  }

  /** TIME TRAVEL: the table as of snapshot k — exactly the files
    * manifest k names, handed to the scan as an explicit list (the
    * table-format planner shape; no directory walk, so orphaned or
    * later files are invisible by construction).
    */
  def readSnapshot(s: SparkSession, root: String, k: Long): DataFrame = {
    val paths = manifest(s, root, k).select("path")
      .collect().map(_.getString(0)) // metadata scale: one row per file
    s.read.parquet(paths.toIndexedSeq: _*)
  }

  /** The file paths a doc_id range [lo, hi] can possibly touch in
    * snapshot k — manifest rows whose [min_id, max_id] intersect the
    * range. A driver-side filter over O(#files) metadata rows: the
    * Iceberg shape where the planner prunes the FILE LIST from
    * manifest stats before the engine ever sees a path.
    */
  private[graft] def prunedPaths(s: SparkSession, root: String, k: Long,
      lo: Long, hi: Long): Seq[String] =
    manifest(s, root, k)
      .filter(col("max_id") >= lo && col("min_id") <= hi)
      .select("path").collect().map(_.getString(0)).toIndexedSeq

  /** MANIFEST-PRUNED RANGE READ: rows of snapshot k with doc_id in
    * [lo, hi], scanning only the files whose manifest stats intersect
    * the range. Two skipping layers compose: the manifest prunes
    * whole FILES here (commits are range-clustered, so most files
    * miss most ranges), and the residual row filter pushes into the
    * surviving parquet scans' row groups as usual. Distinct from
    * [[ClusteredStore]]'s zone pruning: these stats live IN the
    * snapshot manifest (per file, per commit, maintained by `append`
    * itself), not in a separately-built stats artifact — new data is
    * prunable the moment its commit lands.
    */
  def readRange(s: SparkSession, root: String, k: Long,
      lo: Long, hi: Long): DataFrame = {
    val paths = prunedPaths(s, root, k, lo, hi)
    if (paths.isEmpty)
      return readSnapshot(s, root, k).filter(lit(false))
    s.read.parquet(paths: _*)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
  }

  /** SNAPSHOT DIFF: rows appended after snapshot j, as of snapshot k
    * (j < k) — append-only makes this the files with `commit_id > j`
    * in manifest k; no row is compared.
    */
  def readDiff(s: SparkSession, root: String, j: Long, k: Long): DataFrame = {
    val paths = manifest(s, root, k)
      .filter(col("commit_id") > j).select("path")
      .collect().map(_.getString(0))
    s.read.parquet(paths.toIndexedSeq: _*)
  }

  private val builtCache = new graft.SessionCache

  /** Seed the fixture snapshot table: TWO deterministic commits over
    * `documents` — the initial load (`doc_id % 3 != 0`) then the late
    * arrivals (`doc_id % 3 == 0`) — so snapshot 1, snapshot 2, and
    * their diff all have exact raw-table DuckDB oracles. The seed
    * itself is content-signature-guarded (a driver fixture regen
    * rebuilds the store); everything DERIVED from the store validates
    * by snapshot id alone.
    */
  def ensure(s: SparkSession, dir: String): String = {
    builtCache.getOrElseUpdate(s, dir) {
      ensureValidated(s, dir)
      s.emptyDataFrame
    }
    snapRoot(dir)
  }

  private[graft] def ensureValidated(s: SparkSession, dir: String): Unit = {
    val root = snapRoot(dir)
    val sig = snapSig(s, dir)
    if (!StandingIndex.metaFresh(s, root, sig)) {
      val f = fs(s, root)
      f.delete(new Path(root), true)
      val docs = graft.Engine.table(s, dir, "documents")
      append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
      append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      StandingIndex.writeMeta(s, root, sig)
    }
  }

  // ---- an artifact VALIDATED BY SNAPSHOT ID (the O(1) swap) --------

  /** Derived-aggregate layout version. */
  private val SnapAggLayout = 1L

  private[graft] def aggRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snagg")

  private val aggBuiltCache = new graft.SessionCache

  /** Per-lang aggregate of the snapshot table's CURRENT snapshot,
    * persisted and validated by (snapshot id, layout) ONLY — the O(1)
    * freshness check every content-signed artifact in this engine has
    * documented as the 100 TB endgame. Reuse/rebuild needs one
    * `manifests/` directory listing: no corpus scan, no hash. A new
    * commit moves the snapshot id and invalidates; nothing else can,
    * because data files are immutable (SnapshotStoreSpec pins reuse
    * with an mtime witness and rebuild-on-commit with a value check).
    */
  def ensureSnapshotAgg(s: SparkSession, storeRoot: String, dir: String): String = {
    aggBuiltCache.getOrElseUpdate(s, dir) {
      ensureSnapshotAggValidated(s, storeRoot, dir)
      s.emptyDataFrame
    }
    s"${aggRoot(dir)}/agg"
  }

  /** The validation+build step a NEW session runs (spec hook): ONE
    * `manifests/` listing + one meta-row read decide reuse — no data
    * is scanned unless the snapshot id moved.
    */
  private[graft] def ensureSnapshotAggValidated(s: SparkSession,
      storeRoot: String, dir: String): Unit = {
    val root = aggRoot(dir)
    val snap = currentSnapshot(s, storeRoot)
    val want = (snap, SnapAggLayout)
    if (!StandingIndex.metaFresh(s, root, want)) {
      readSnapshot(s, storeRoot, snap)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/agg")
      StandingIndex.writeMeta(s, root, want)
    }
  }

  /** q203: TIME TRAVEL — the per-lang aggregate of snapshot 1, read
    * from manifest 1's exact file list while the table is already at
    * snapshot 2. Oracle = the raw table under the commit-1 predicate:
    * time travel is correct iff "as of 1" equals what was loaded
    * first, byte for byte.
    */
  val q203SnapshotTimeTravel: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    readSnapshot(s, root, 1L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q204: SNAPSHOT DIFF — rows appended between snapshot 1 and 2,
    * resolved at FILE level (commit_id > 1 in manifest 2; append-only
    * CDC with zero row comparisons), aggregated per lang. Oracle =
    * the complement predicate on the raw table.
    */
  val q204SnapshotDiff: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    readDiff(s, root, 1L, 2L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q205: the O(1)-FRESHNESS artifact answering — the stored
    * per-lang aggregate, validated against the snapshot id (one
    * directory listing) instead of a corpus content scan. Current
    * snapshot = both commits = the whole table, so the oracle is the
    * verbatim raw-table aggregate.
    */
  val q205SnapshotAgg: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    s.read.parquet(ensureSnapshotAgg(s, root, dir))
      .orderBy(col("lang"))
  }

  /** q206: MANIFEST-PRUNED range read — a doc_id window answered by
    * scanning only the files whose per-file manifest stats intersect
    * it (SnapshotStoreSpec proves files ARE skipped, not just that
    * values match). The pruning layer the format maintains for free
    * at every commit; oracle = the raw-table BETWEEN predicate.
    */
  val q206SnapshotRange: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    readRange(s, root, currentSnapshot(s, root), 100L, 250L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q203_snapshot_time_travel" -> q203SnapshotTimeTravel,
      "q204_snapshot_diff" -> q204SnapshotDiff,
      "q205_snapshot_agg" -> q205SnapshotAgg,
      "q206_snapshot_range" -> q206SnapshotRange)

  val oracles: Map[String, String] = Map(
    "q203_snapshot_time_travel" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q204_snapshot_diff" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q205_snapshot_agg" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q206_snapshot_range" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 250
        |GROUP BY lang ORDER BY lang""".stripMargin)
}
