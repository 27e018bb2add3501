package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

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
  * Layout under the artifact root (the MANIFEST-LIST shape — the
  * Iceberg split of snapshot metadata into immutable manifest files
  * plus a tiny per-snapshot list that REUSES them):
  * {{{
  *   data/c<token>/part-*.parquet -- one commit attempt's immutable
  *                                   data files (token-unique, so
  *                                   concurrent attempts never collide)
  *   manifests/f<token>/          -- an immutable MANIFEST FILE:
  *                                   (path, commit_id, n_rows, min_id,
  *                                   max_id[, min_chars, max_chars],
  *                                   mpath) rows, one per data file;
  *                                   written once, shared by every
  *                                   snapshot whose list names it
  *   manifests/m<k>/              -- snapshot k's MANIFEST LIST: one
  *                                   (mpath) row per manifest file;
  *                                   _SUCCESS is the commit marker
  *   manifests/s<k>.json          -- snapshot k's table schema (JSON),
  *                                   so an EMPTY snapshot stays readable
  *   manifests/claim<k>           -- commit k's claim marker: the CAS
  *                                   that serializes concurrent writers
  *   meta/                        -- the store's own build signature
  * }}}
  *
  * Why the indirection: with m<k> holding the full data-file row set
  * (the pre-round-15 shape), a ONE-FILE append onto a 10⁶-file table
  * rewrites a million metadata rows every commit — O(#live files)
  * write amplification on the metadata path. With the list shape, an
  * append writes ONE new manifest file with O(|commit|) rows plus a
  * list of O(#manifest files) path strings; every prior manifest file
  * is reused BY REFERENCE. Rewrite commits (delete/merge) rewrite only
  * the manifest files that actually reference a replaced data file;
  * [[restore]] is pure list reuse (zero manifest rows written).
  *
  * Invariants the protocol buys (all spec-pinned):
  *   - APPEND-ONLY + MANIFEST-LAST: data files land first; the
  *     manifest naming them is written last, so a crash mid-commit
  *     leaves orphan files that NO reader ever lists — readers see
  *     the previous snapshot, never a torn one.
  *   - OPTIMISTIC CONCURRENCY: commit k is guarded by an ATOMIC
  *     create of `claim<k>` (O_EXCL on a local filesystem;
  *     `create(overwrite = false)` on HDFS; a conditional PUT on an
  *     object store). A writer may only claim `current + 1`, so
  *     commits are strictly serialized: the loser of a race waits for
  *     the winner's manifest, re-reads the new current state, REBASES
  *     (appends re-union the new manifest; rewrites recompute from the
  *     new snapshot), and retries with the next id. Two concurrent
  *     writers can never silently clobber each other — the round-13
  *     single-writer caveat, closed (VERDICT r13 item 1).
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
    * 3 when commits gained the claim-file CAS protocol, per-snapshot
    * schema sidecars, and token-unique data directories; to 4 when
    * snapshots gained the MANIFEST-LIST shape (m<k> names immutable
    * manifest FILES instead of repeating every data-file row), so
    * commit metadata cost is O(|commit|), not O(#live files) (older
    * stored stores rebuild once).
    */
  private val SnapLayout = 4L

  /** Files per commit in the seeded store — each commit is
    * range-clustered on doc_id across this many files, so the per-file
    * stats in the manifest are disjoint and a doc_id range predicate
    * can actually skip files. Production sizes this as
    * commit_bytes / target_file_bytes.
    */
  val CommitFiles = 4

  /** Conf key: how long a commit attempt waits for a CONTESTED claim's
    * manifest before failing loudly (ms). A claim whose writer died
    * mid-commit blocks the id forever by design — the store never
    * guesses a writer dead and clobbers it (production adds a
    * lease/heartbeat); [[breakClaim]] is the explicit operator
    * recovery, the `FSCK` of this format.
    */
  val ClaimWaitKey = "spark.graft.snapshot.claimWaitMs"

  /** Conf key: SQL row-level DELETE write mode — "cow" (default; the
    * group-based rewrite, merge-free reads) or "merge-on-read" (a
    * position-delete file per statement, zero data rewrites — the
    * Iceberg `write.delete.mode` shape).
    */
  val DeleteModeKey = "spark.graft.snapshot.deleteMode"

  /** Conf keys: SQL UPDATE / MERGE INTO write modes — same values as
    * [[DeleteModeKey]] (the Iceberg `write.update.mode` /
    * `write.merge.mode` shape). Under "merge-on-read" an UPDATE/MERGE
    * lands as ONE delta commit: a position-delete file for the touched
    * rows' physical identities plus ordinary data files for the
    * post-images — write amplification O(|changed rows|), never
    * O(|touched files|), which is what an hourly small-upsert pipeline
    * against a 100 TB table needs (the r16 VERDICT's top item).
    */
  val UpdateModeKey = "spark.graft.snapshot.updateMode"
  val MergeModeKey = "spark.graft.snapshot.mergeMode"

  /** Conf key: total live delete-file rows (equality keys or delete
    * positions, decided per kind from manifest `n_rows` alone) above
    * which every delete-resolution structure switches from its
    * driver/broadcast form to the DISTRIBUTED form (VERDICT r16
    * what's-wrong 1): affected-file planning goes through the
    * granule-summary range join, and scans resolve deletes PER TASK —
    * each reader re-reads the delete files bounded to its own data
    * file's key range / path (the Iceberg per-task delete-apply
    * shape), so no driver or broadcast structure is ever O(|keys|).
    * Below the threshold the collected/broadcast fast path stays — a
    * CDC-sized delete set is cheaper to ship once than to re-read per
    * task.
    */
  val DeleteMapThresholdKey = "spark.graft.snapshot.deleteMapThreshold"

  private[graft] def deleteMapThreshold(s: SparkSession): Long =
    s.conf.getOption(DeleteMapThresholdKey).map(_.toLong).getOrElse(262144L)

  /** Conf key: rows per file above which an identity-partitioned write
    * SPLITS a hot partition value into multiple doc_id-range files
    * (VERDICT r16 what's-missing 3). Without it, `repartition(value)`
    * serializes a 90%-one-value corpus through ONE task and ONE file
    * at write time; with it, a value with n rows writes ceil(n/split)
    * single-valued files through that many tasks, each covering a
    * tight id subrange (stats still prune). The manifest and
    * [[partSpecOf]] already tolerate many files per value — this knob
    * only governs the writer. Production sizes this by bytes; rows are
    * the deterministic proxy the fixtures can pin.
    */
  val PartitionSplitRowsKey = "spark.graft.snapshot.partitionSplitRows"

  private[graft] def partitionSplitRows(s: SparkSession): Long =
    s.conf.getOption(PartitionSplitRowsKey).map(_.toLong).getOrElse(4000000L)

  /** Conf key: change-set row count at which [[mergeInto]] switches
    * from the collected-key interval check to the DISTRIBUTED
    * granule-summary range join (VERDICT r13 item 3) — the affected-
    * file decision never collects a large change set to the driver.
    */
  val MergeJoinThresholdKey = "spark.graft.snapshot.mergeJoinThreshold"

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
      .filter(p => p.getName.startsWith("m") && p.getName.drop(1).forall(_.isDigit) &&
        f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(1).toLong)
      .foldLeft(0L)(math.max)
  }

  /** JVM-wide memo of COMMITTED manifest metadata, keyed (root, k) and
    * validated per lookup by [[mlistToken]] — the m<k> directory's own
    * listing. A committed manifest list is immutable (commits only add
    * ids; [[breakClaim]] refuses committed ones), so the memo turns the
    * per-query manifest-list resolution — a parquet schema inference
    * plus a collect JOB on every snapshot read (VERDICT r17 next-round
    * item 1) — into one driver-local `listStatus`. The token check (file
    * names carry write-unique part UUIDs, plus mtime/len) catches every
    * way an entry can go stale: [[expire]] deleting m<k> (token = None →
    * uncached read → the same error surface as before), and a fixture
    * builder deleting the whole store root and re-seeding a DIFFERENT
    * store at the same path (fresh part names → token mismatch →
    * re-read). Values are O(#manifest files) strings / O(#files) rows —
    * driver metadata scale, bounded by the clear-on-overflow cap.
    */
  private val mlistMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Long), (String, Seq[String])]
  private val mrowsMemo = scala.collection.concurrent.TrieMap
    .empty[(String, Long), (String, StructType, Seq[org.apache.spark.sql.Row])]
  private val MemoCap = 2048

  /** Immutability token of a committed m<k>: the directory listing's
    * (name, mtime, len) triples — None when the directory or its
    * `_SUCCESS` marker is missing (torn or expired ⇒ never memoized).
    */
  private def mlistToken(s: SparkSession, root: String, k: Long): Option[String] =
    try {
      val st = fs(s, root).listStatus(new Path(s"$root/manifests/m$k"))
      if (!st.exists(_.getPath.getName == "_SUCCESS")) None
      else Some(st.map(x => s"${x.getPath.getName}:${x.getModificationTime}:${x.getLen}")
        .sorted.mkString(","))
    } catch { case _: Exception => None }

  /** Snapshot k's MANIFEST LIST: the manifest-file paths composing it.
    * One tiny read of m<k> (O(#manifest files) strings) — memoized per
    * (root, k) behind the token check above, so repeat resolutions cost
    * a directory listing instead of a Spark job. A pre-list store
    * (legacy: m<k> holds the data rows directly) reads as a
    * single-entry list naming its own directory, so every reader
    * below handles both shapes through one code path.
    */
  private[graft] def listOf(s: SparkSession, root: String, k: Long): Seq[String] = {
    if (k == 0L) return Nil
    val tok = mlistToken(s, root, k)
    tok.flatMap(t => mlistMemo.get((root, k)).collect {
      case (`t`, paths) => paths
    }).getOrElse {
      val m = s.read.parquet(s"$root/manifests/m$k")
      val paths =
        if (m.columns.contains("mpath"))
          m.select("mpath").collect().map(_.getString(0)).toIndexedSeq
        else Seq(s"$root/manifests/m$k")
      tok.foreach { t =>
        if (mlistMemo.size >= MemoCap) mlistMemo.clear()
        mlistMemo.put((root, k), (t, paths))
      }
      paths
    }
  }

  /** The manifest-row schema of an EMPTY snapshot (a whole-table
    * delete leaves a list naming one zero-row manifest file, but a
    * fully-expired edge can leave none).
    */
  private def emptyManifest(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(String, Long, Long, Long, Long, String)]
      .toDF("path", "commit_id", "n_rows", "min_id", "max_id", "mpath")
  }

  /** Manifest k WITH each row's owning manifest-file path (`mpath`) —
    * the column rewrite commits group by to decide which manifest
    * files they must rewrite vs carry by reference. LAZY — commit
    * bodies stream these rows into filters and manifest writes; only
    * the read-path metadata collects go through the memoized
    * [[manifestRowsOf]] (an eager collect here measurably hurt every
    * mutation path — a per-call driver job their write pipeline never
    * needed).
    */
  private[graft] def manifestFull(s: SparkSession, root: String, k: Long): DataFrame = {
    val mpaths = listOf(s, root, k)
    if (mpaths.isEmpty) return emptyManifest(s)
    val rows = s.read.option("mergeSchema", "true").parquet(mpaths: _*)
    if (rows.columns.contains("mpath")) rows
    else rows.withColumn("mpath", lit(mpaths.head)) // legacy single-dir shape
  }

  /** Snapshot k's COLLECTED manifest rows (schema, rows) WITH the
    * `kind` column normalized (missing column / NULL → "data") and
    * `mpath` dropped — the metadata row set every snapshot READ
    * consumes. Memoized per (root, k) behind the same [[mlistToken]]
    * immutability check as [[listOf]]: a committed snapshot's manifest
    * row set is a pure function of its m<k> plus the immutable
    * manifest files it names, so repeat reads skip both the
    * mergeSchema footer pass and the collect job (VERDICT r17
    * next-round item 1 — this was 1-2 Spark jobs on EVERY
    * snapshot-family query).
    */
  private[graft] def manifestRowsOf(s: SparkSession, root: String, k: Long):
      (StructType, Seq[org.apache.spark.sql.Row]) = {
    val tok = mlistToken(s, root, k)
    tok.flatMap(t => mrowsMemo.get((root, k)).collect {
      case (`t`, schema, rows) => (schema, rows)
    }).getOrElse {
      val df = withKind(manifestFull(s, root, k)).drop("mpath")
      val rows = df.collect().toIndexedSeq
      tok.foreach { t =>
        if (mrowsMemo.size >= MemoCap) mrowsMemo.clear()
        mrowsMemo.put((root, k), (t, df.schema, rows))
      }
      (df.schema, rows)
    }
  }

  /** Manifest k as a DataFrame: one (path, commit_id, n_rows, min_id,
    * max_id) row per data file in snapshot k — resolved through the
    * manifest list. Metadata scale — O(#files) rows.
    */
  def manifest(s: SparkSession, root: String, k: Long): DataFrame =
    manifestFull(s, root, k).drop("mpath")

  /** Write one immutable MANIFEST FILE (token-unique, like data
    * files) and return its path. Each row carries `mpath` = the
    * file's own directory, so [[manifestFull]] can group rows by
    * owner without path-normalization games. O(rows) — for an append,
    * O(|commit files|), never O(#live files).
    */
  private def writeManifestFile(s: SparkSession, root: String,
      rows: DataFrame): String = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    // QUALIFIED path (scheme + authority), so list entries compare
    // byte-equal with `listStatus` output in expire/vacuum sweeps
    val dir = fs(s, root)
      .makeQualified(new Path(s"$root/manifests/f$token")).toString
    rows.withColumn("mpath", lit(dir))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  // ---- the commit protocol: claim CAS + manifest-last ---------------

  private def claimPath(root: String, k: Long) = new Path(s"$root/manifests/claim$k")

  /** Atomically claim commit id k — true iff THIS writer created the
    * claim marker. Local filesystems get true O_EXCL atomicity via
    * NIO `createFile`; other filesystems use Hadoop's
    * `create(overwrite = false)` (atomic on HDFS; object-store
    * deployments swap in a conditional PUT — the claim is the one
    * pluggable primitive in the protocol).
    */
  private def tryClaim(s: SparkSession, root: String, k: Long): Boolean =
    tryClaimAt(s, root, claimPath(root, k))

  /** The CAS primitive over an arbitrary claim path — shared by the
    * main commit protocol and the per-branch one.
    */
  private def tryClaimAt(s: SparkSession, root: String, p: Path): Boolean = {
    val f = fs(s, root)
    f.mkdirs(p.getParent)
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try { java.nio.file.Files.createFile(local); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  /** Wait (bounded) for a CONTESTED claim's manifest to commit, so the
    * losing writer can rebase on it. A timeout means the claimant died
    * mid-commit: fail loudly with the recovery procedure — never guess
    * the writer dead and clobber a possibly in-flight commit.
    */
  private def awaitCommit(s: SparkSession, root: String, k: Long): Unit = {
    val waitMs = s.conf.getOption(ClaimWaitKey).map(_.toLong).getOrElse(60000L)
    val marker = new Path(s"$root/manifests/m$k/_SUCCESS")
    val f = fs(s, root)
    val deadline = System.nanoTime() + waitMs * 1000000L
    while (!f.exists(marker)) {
      if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"commit $k is claimed but its manifest never landed within ${waitMs}ms " +
            s"— the claimant likely died mid-commit; verify no writer is alive, " +
            s"then run SnapshotStore.breakClaim(root, $k) to release the id")
      Thread.sleep(20L)
    }
  }

  /** Operator recovery for a TORN CLAIM (claimant died between claim
    * and manifest): releases commit id k by deleting the claim marker
    * and any partial manifest. Refuses if k actually committed.
    */
  def breakClaim(s: SparkSession, root: String, k: Long): Unit = {
    val f = fs(s, root)
    require(!f.exists(new Path(s"$root/manifests/m$k/_SUCCESS")),
      s"commit $k is COMMITTED — breaking it would destroy a snapshot")
    f.delete(new Path(s"$root/manifests/m$k"), true)
    // recursive: a sidecar path poisoned into a directory (fault
    // injection, operator error) must still release cleanly
    f.delete(new Path(s"$root/manifests/s$k.json"), true)
    f.delete(new Path(s"$root/manifests/i$k.json"), true)
    f.delete(new Path(s"$root/manifests/t$k"), true)
    f.delete(claimPath(root, k), false)
  }

  /** The optimistic-concurrency commit loop every mutation routes
    * through. `body(prev)` computes candidate commit `prev + 1`'s
    * MANIFEST LIST (the manifest-file paths — carried ones by
    * reference, new ones written by the body itself, token-unique so
    * attempts never collide) and table schema, reading only immutable
    * state (manifest `prev` and older); the claim CAS then decides the
    * race. A losing writer waits for the winner's manifest, re-reads
    * the new current snapshot, and re-runs `body` against it — appends
    * re-list the newer manifest files, rewrites recompute their file
    * selection — so no commit is ever silently lost (SnapshotStoreSpec
    * pins two interleaved writers committing with zero lost rows, and
    * the torn-claim failure path). A losing attempt's freshly-written
    * manifest file is an orphan no list ever names ([[vacuum]]
    * reclaims it, same story as orphaned data files).
    */
  private def commitRetry(s: SparkSession, root: String,
      txn: Option[String] = None)(
      body: Long => (Seq[String], StructType)): Long =
    commitRetryIds(s, root, txn) { prev =>
      val (mpaths, schema) = body(prev); (mpaths, schema, None)
    }

  /** [[commitRetry]] with an explicit field-id map — only
    * [[renameColumn]] needs one; every other commit evolves the
    * previous map additively (fresh ids for new fields).
    */
  private def commitRetryIds(s: SparkSession, root: String,
      txn: Option[String] = None)(
      body: Long => (Seq[String], StructType, Option[Map[Long, String]])): Long = {
    var attempts = 0
    while (attempts < 64) {
      val prev = currentSnapshot(s, root)
      val k = prev + 1
      val (mpaths, schema, idsOpt) = body(prev)
      val ids = idsOpt.getOrElse(
        evolvedIdMap(readIdMap(s, root, prev), schema))
      if (tryClaim(s, root, k)) {
        // Self-release on a RECOVERABLE post-claim failure: the claim
        // holder knows its own commit failed, so it cleans up (partial
        // manifest + sidecars + claim) before rethrowing instead of
        // leaving the table blocked until a human runs [[breakClaim]]
        // — that path is reserved for writers that DIED (ADVICE r14).
        // If `_SUCCESS` already landed the commit is durable and must
        // never be destroyed by its own error handling.
        try {
          writeSchema(s, root, k, schema)
          writeIdMap(s, root, k, ids)
          writeCommitTime(s, root, k)
          // TRANSACTION MARKER inside the commit (the Delta txn-action
          // shape): the marker (naming k) lands BEFORE the `_SUCCESS`
          // that makes k durable, so "marker exists AND its snapshot
          // committed" is exactly "this (queryId, epoch) landed" — no
          // crash window between commit and marker (ADVICE r15 medium)
          txn.foreach { name =>
            val out = fs(s, root).create(new Path(s"$root/manifests/$name"), true)
            try out.write(k.toString.getBytes("UTF-8")) finally out.close()
          }
          commitManifest(s, root, k, mpaths)
        } catch {
          case t: Throwable =>
            if (!fs(s, root).exists(new Path(s"$root/manifests/m$k/_SUCCESS"))) {
              try breakClaim(s, root, k) catch { case c: Throwable => t.addSuppressed(c) }
              txn.foreach { name =>
                try fs(s, root).delete(new Path(s"$root/manifests/$name"), false)
                catch { case c: Throwable => t.addSuppressed(c) }
              }
            }
            throw t
        }
        return k
      }
      // lost the race: rebase on the winner's commit and retry
      awaitCommit(s, root, k)
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit on $root lost ${attempts} consecutive claim races — livelock guard")
  }

  /** COMMIT: append `df` as snapshot `current + 1` through the claim
    * CAS. Data files land ONCE under an immutable token-unique
    * directory — range-clustered on `doc_id` across [[CommitFiles]]
    * files, so the per-file stats below are tight. The commit's
    * metadata is ONE new manifest file with O(|commit files|) rows
    * plus the list — every prior manifest file carries by REFERENCE
    * (the incremental-manifest shape; on a lost race only the cheap
    * manifest file + list are rebased, the data files are immutable
    * and commit-id-agnostic). Returns the new snapshot id.
    */
  def append(s: SparkSession, root: String, df: DataFrame): Long = {
    val added = writeDataFiles(s, root, df)
    commitRetry(s, root) { prev =>
      val k = prev + 1
      val mf = writeManifestFile(s, root, manifestRows(s, added, k))
      (listOf(s, root, prev) :+ mf,
        mergedSchema(tableSchema(s, root, prev), df.schema))
    }
  }

  /** APPEND-COMMIT of files some OTHER writer already produced — the
    * driver half of the DSv2 write path ([[SnapshotTableSource]]):
    * executors wrote the data files and shipped back per-file
    * (path, n_rows, min_id, max_id) stats as commit messages; this
    * turns them into one manifest file + list through the same claim
    * CAS as [[append]]. The at-scale division of labor every table
    * format uses: data moves on executors, the commit is O(|commit|)
    * driver metadata.
    */
  private[graft] def commitAppendStats(s: SparkSession, root: String,
      stats: Seq[(String, Long, Long, Long, Long)], schema: StructType,
      txn: Option[String] = None): Long = {
    val fstats = stats.map { case (p, n, mn, mx, nn) =>
      FileStat(p, n, mn, mx, Some(nn)) }
    commitRetry(s, root, txn) { prev =>
      val mf = writeManifestFile(s, root, manifestRows(s, fstats, prev + 1))
      (listOf(s, root, prev) :+ mf,
        mergedSchema(tableSchema(s, root, prev), schema))
    }
  }

  /** The landing half of a SQL `INSERT OVERWRITE` — truncate + append
    * as ONE snapshot: the new manifest list names exactly the written
    * files (empty input ⇒ the empty table, per OVERWRITE semantics),
    * so no reader ever observes an intermediate empty state and time
    * travel keeps the pre-overwrite snapshots.
    */
  private[graft] def commitOverwriteStats(s: SparkSession, root: String,
      stats: Seq[(String, Long, Long, Long, Long)], schema: StructType,
      txn: Option[String] = None): Long = {
    val fstats = stats.map { case (p, n, mn, mx, nn) =>
      FileStat(p, n, mn, mx, Some(nn)) }
    commitRetry(s, root, txn) { prev =>
      require(prev > 0, "INSERT OVERWRITE on an uncommitted store")
      // the empty overwrite still merges the WRITE's schema — an
      // `INSERT OVERWRITE … SELECT <empty with new columns>` evolves
      // the table exactly like its non-empty twin (ADVICE r15 low)
      if (fstats.isEmpty) (Nil, mergedSchema(tableSchema(s, root, prev), schema))
      else (Seq(writeManifestFile(s, root, manifestRows(s, fstats, prev + 1))),
        mergedSchema(tableSchema(s, root, prev), schema))
    }
  }

  /** The BUCKETED DSv2 landing — manifest rows carry each file's
    * bucket id, so a SQL `INSERT INTO` (or streaming epoch) against a
    * bucket-clustered table PRESERVES the layout claim instead of
    * silently voiding it: the next storage-partitioned join still
    * sees every data file honoring the spec.
    */
  private[graft] def commitAppendStatsBucketed(s: SparkSession, root: String,
      stats: Seq[(String, Long, Long, Long, Long, Int)], schema: StructType,
      nBuckets: Int, by: String, txn: Option[String] = None): Long =
    commitRetry(s, root, txn) { prev =>
      (listOf(s, root, prev) :+ writeManifestFile(s, root,
        bucketedManifestRows(s, stats, prev + 1, nBuckets, by)),
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  /** Bucketed `INSERT OVERWRITE`: one atomic snapshot whose manifest
    * list is exactly the new bucket-split files.
    */
  private[graft] def commitOverwriteStatsBucketed(s: SparkSession,
      root: String, stats: Seq[(String, Long, Long, Long, Long, Int)],
      schema: StructType, nBuckets: Int, by: String,
      txn: Option[String] = None): Long =
    commitRetry(s, root, txn) { prev =>
      require(prev > 0, "INSERT OVERWRITE on an uncommitted store")
      if (stats.isEmpty) (Nil, mergedSchema(tableSchema(s, root, prev), schema))
      else (Seq(writeManifestFile(s, root,
        bucketedManifestRows(s, stats, prev + 1, nBuckets, by))),
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  /** The identity-partitioned DSv2 landing — the [[
    * commitAppendStatsBucketed]] twin for partition values.
    */
  private[graft] def commitAppendStatsPartitioned(s: SparkSession,
      root: String, stats: Seq[(String, Long, Long, Long, Long, String)],
      schema: StructType, by: String, txn: Option[String] = None): Long =
    commitRetry(s, root, txn) { prev =>
      (listOf(s, root, prev) :+ writeManifestFile(s, root,
        partitionedManifestRows(s, stats, prev + 1, by)),
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  private[graft] def commitOverwriteStatsPartitioned(s: SparkSession,
      root: String, stats: Seq[(String, Long, Long, Long, Long, String)],
      schema: StructType, by: String, txn: Option[String] = None): Long =
    commitRetry(s, root, txn) { prev =>
      require(prev > 0, "INSERT OVERWRITE on an uncommitted store")
      if (stats.isEmpty) (Nil, mergedSchema(tableSchema(s, root, prev), schema))
      else (Seq(writeManifestFile(s, root,
        partitionedManifestRows(s, stats, prev + 1, by))),
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  private[graft] def commitAppendStatsComposed(s: SparkSession,
      root: String, stats: Seq[(String, Long, Long, Long, Long, String, Int)],
      schema: StructType, partBy: String, nBuckets: Int, bucketBy: String,
      txn: Option[String] = None): Long =
    commitRetry(s, root, txn) { prev =>
      (listOf(s, root, prev) :+ writeManifestFile(s, root,
        composedManifestRows(s, stats, prev + 1, partBy, nBuckets, bucketBy)),
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  private[graft] def commitOverwriteStatsComposed(s: SparkSession,
      root: String, stats: Seq[(String, Long, Long, Long, Long, String, Int)],
      schema: StructType, partBy: String, nBuckets: Int, bucketBy: String,
      txn: Option[String] = None): Long =
    commitRetry(s, root, txn) { prev =>
      require(prev > 0, "INSERT OVERWRITE on an uncommitted store")
      if (stats.isEmpty) (Nil, mergedSchema(tableSchema(s, root, prev), schema))
      else (Seq(writeManifestFile(s, root,
        composedManifestRows(s, stats, prev + 1, partBy, nBuckets, bucketBy))),
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  /** One data file's manifest stats. `nNulls` = null-key rows (the
    * Iceberg null_value_counts shape — what lets readers DECIDE
    * null-path work from metadata alone); None = the writer did not
    * count, so readers must stay conservative.
    */
  private final case class FileStat(path: String, nRows: Long, minId: Long,
    maxId: Long, nNulls: Option[Long] = None)

  /** Write one commit attempt's immutable, range-clustered data files
    * and return their stats. The directory is token-unique
    * (`data/c<token>`) so concurrent commit attempts never collide;
    * files of an attempt that loses its claim race permanently are
    * orphans no manifest ever lists (production GC reclaims them —
    * same story as a crashed attempt). Zero-row files are dropped (and
    * deleted), so an empty input contributes no manifest rows.
    *
    * The per-file stats pass reads each new file's (min, max, count)
    * once at commit time — a driver loop over the COMMIT's files
    * (never the table's), each a footer-sized aggregate; a production
    * writer lifts these from the parquet footer statistics it just
    * wrote instead of re-reading.
    */
  private def writeDataFiles(s: SparkSession, root: String,
      df: DataFrame): Seq[FileStat] =
    writeDataFilesN(s, root, df, CommitFiles)

  private def writeDataFilesN(s: SparkSession, root: String,
      df: DataFrame, nFiles: Int): Seq[FileStat] = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/c$token"
    df.repartitionByRange(nFiles, col("doc_id"))
      .write.mode("overwrite").parquet(dataDir)
    val f = fs(s, root)
    val files = f.listStatus(new Path(dataDir)).toSeq
      .map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
    files.flatMap { p =>
      val st = s.read.parquet(p)
        .agg(count(lit(1)).cast("long"), min(col("doc_id")).cast("long"),
          max(col("doc_id")).cast("long"),
          count(col("doc_id")).cast("long")).head()
      val nulls = Some(st.getLong(0) - st.getLong(3))
      if (st.getLong(0) == 0L) { f.delete(new Path(p), false); None }
      // a file of all-null ids can never be stats-pruned: open interval
      else if (st.isNullAt(1))
        Some(FileStat(p, st.getLong(0), Long.MinValue, Long.MaxValue, nulls))
      else Some(FileStat(p, st.getLong(0), st.getLong(1), st.getLong(2), nulls))
    }
  }

  /** A committed file's on-disk length, recorded into its manifest row
    * at commit time (the Iceberg `file_size_in_bytes` shape) — one
    * driver `getFileStatus` per COMMIT file, so readers never pay a
    * per-file RPC again: `estimateStatistics` and scan-split sizing
    * read the manifest instead of the filesystem (VERDICT r15
    * what's-missing 7). -1 = unknown (the stat failed; readers fall
    * back to a filesystem call).
    */
  private def fileLenOf(s: SparkSession, p: String): Long =
    try {
      val hp = new Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getFileStatus(hp).getLen
    } catch { case _: java.io.IOException => -1L }

  private def manifestRows(s: SparkSession, stats: Seq[FileStat], k: Long): DataFrame = {
    import s.implicits._
    stats.map(st => (st.path, k, st.nRows, st.minId, st.maxId, st.nNulls,
        fileLenOf(s, st.path)))
      .toDF("path", "commit_id", "n_rows", "min_id", "max_id", "n_nulls",
        "n_bytes")
  }

  /** Write manifest LIST k — the commit point (only ever called by the
    * writer holding claim k, so the target is uncontended): a crash
    * before the committer's `_SUCCESS` leaves a torn list no reader
    * counts. O(#manifest files) strings — the tiny file that replaced
    * the full O(#live files) row rewrite.
    */
  private def commitManifest(s: SparkSession, root: String, k: Long,
      mpaths: Seq[String]): Unit = {
    import s.implicits._
    mpaths.toDF("mpath").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/manifests/m$k")
  }

  /** Persist snapshot k's table schema next to its manifest — the
    * metadata a real table format keeps so an EMPTY snapshot (a
    * whole-table delete) stays readable (VERDICT r13 what's-wrong 1),
    * and the anchor additive evolution merges into.
    */
  private def writeSchema(s: SparkSession, root: String, k: Long,
      schema: StructType): Unit = {
    val out = fs(s, root).create(new Path(s"$root/manifests/s$k.json"), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  // ---- FIELD-ID mapping: rename-capable schema evolution -----------

  /** Read the whole content of a tiny sidecar file as UTF-8. */
  private def readSidecar(s: SparkSession, p: Path): Option[String] = {
    val f = fs(s, p.toString)
    if (!f.exists(p)) return None
    val in = f.open(p)
    try {
      val b = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { b.write(buf, 0, n); n = in.read(buf) }
      Some(b.toString("UTF-8"))
    } finally in.close()
  }

  /** Snapshot k's FIELD-ID map (`manifests/i<k>.json`): stable id →
    * current column name — the Iceberg mechanism that makes RENAME a
    * metadata operation: a renamed column keeps its id (old files'
    * data surfaces under the new name), a re-added name gets a FRESH
    * id (old data never leaks into it). Written by every commit;
    * stores from before the sidecar read as empty (no renames ever
    * happened there, so identity is fine).
    */
  private[graft] def readIdMap(s: SparkSession, root: String,
      k: Long): Map[Long, String] =
    readSidecar(s, new Path(s"$root/manifests/i$k.json")).map { json =>
      // one flat string map, written by writeIdMap — parse without a
      // JSON library: "id":"name" pairs (names are column identifiers,
      // no quotes/escapes inside by construction — writeIdMap asserts)
      """"(\d+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(json)
        .map(m => m.group(1).toLong -> m.group(2)).toMap
    }.getOrElse(Map.empty)

  private def writeIdMap(s: SparkSession, root: String, k: Long,
      idMap: Map[Long, String]): Unit = {
    require(idMap.values.forall(n => !n.contains("\"") && !n.contains("\\")),
      "column names with quotes/backslashes are not supported by the id sidecar")
    val json = idMap.toSeq.sortBy(_._1)
      .map { case (id, n) => s""""$id":"$n"""" }.mkString("{", ",", "}")
    val out = fs(s, root).create(new Path(s"$root/manifests/i$k.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** The id map commit k writes by default: the previous map, plus a
    * fresh id (max + 1 …) for every field the new schema introduces —
    * first-appearance order, deterministic.
    */
  private def evolvedIdMap(prev: Map[Long, String],
      schema: StructType): Map[Long, String] = {
    val have = prev.values.toSet
    var next = if (prev.isEmpty) 1L else prev.keys.max + 1L
    prev ++ schema.fieldNames.filterNot(have).map { n =>
      val id = next; next += 1L; id -> n
    }
  }

  /** The renames to apply when snapshot k reads files written by
    * commit `cid`: every id whose name changed between the two maps.
    * Empty for any store that never renamed (missing sidecars).
    */
  private[graft] def renamesFor(s: SparkSession, root: String, k: Long,
      cid: Long): Seq[(String, String)] = {
    if (cid == k) return Nil
    val mk = readIdMap(s, root, k)
    if (mk.isEmpty) return Nil
    val mc = readIdMap(s, root, cid)
    mc.toSeq.flatMap { case (id, oldN) =>
      mk.get(id).filter(_ != oldN).map(oldN -> _)
    }
  }

  /** RENAME a column — pure metadata, the field-id way: commit
    * `current + 1` reuses the file list verbatim and changes ONLY the
    * schema + id map (same id, new name). Every read of the new
    * snapshot surfaces old files' data under the new name; time travel
    * to pre-rename snapshots still reads the old name — both from the
    * per-commit sidecars, no data touched. Refuses the table key
    * (`doc_id` anchors stats, deletes and merges) and collisions with
    * a live name.
    */
  def renameColumn(s: SparkSession, root: String,
      oldName: String, newName: String): Long =
    commitRetryIds(s, root) { prev =>
      require(prev > 0, "renameColumn on an empty table")
      require(oldName != "doc_id", "the table key cannot be renamed")
      val schema = tableSchema(s, root, prev)
      require(schema.fieldNames.contains(oldName), s"no column $oldName")
      require(!schema.fieldNames.contains(newName), s"column $newName exists")
      val renamed = StructType(schema.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
      val ids = evolvedIdMap(readIdMap(s, root, prev), schema)
      val newIds = ids.map { case (id, n) =>
        id -> (if (n == oldName) newName else n)
      }
      (listOf(s, root, prev), renamed, Some(newIds))
    }

  /** ADD COLUMN as a METADATA-ONLY commit (VERDICT r16 what's-missing
    * 4): snapshot `current + 1` carries the same file list with the
    * widened schema — zero data moves, and every existing file reads
    * the new column as NULL through the ordinary schema-union path
    * (the q212 additive-evolution semantics, now reachable from SQL
    * `ALTER TABLE … ADD COLUMN` via [[SnapshotCatalog.alterTable]]).
    * The new column gets a FRESH field id, so a later re-add of a
    * previously-renamed-away name never resurrects stale data. Old
    * snapshots keep their era's schema — time travel is unaffected.
    */
  def addColumn(s: SparkSession, root: String, name: String,
      dataType: DataType): Long =
    commitRetryIds(s, root) { prev =>
      require(prev > 0, "addColumn on an empty table")
      val schema = tableSchema(s, root, prev)
      require(!schema.fieldNames.contains(name), s"column $name exists")
      val widened = StructType(schema.fields :+
        StructField(name, dataType, nullable = true))
      // evolve the id map so the new name owns a fresh field id
      val ids = evolvedIdMap(readIdMap(s, root, prev), schema)
      val nextId = if (ids.isEmpty) 1L else ids.keys.max + 1L
      (listOf(s, root, prev), widened, Some(ids + (nextId -> name)))
    }

  private def readStoredSchema(s: SparkSession, root: String, k: Long): Option[StructType] = {
    val p = new Path(s"$root/manifests/s$k.json")
    val f = fs(s, root)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val json = try {
      val b = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { b.write(buf, 0, n); n = in.read(buf) }
      b.toString("UTF-8")
    } finally in.close()
    Some(DataType.fromJson(json).asInstanceOf[StructType])
  }

  /** Record commit k's wall-clock timestamp (`manifests/t<k>`, epoch
    * millis) — written by the claim holder before the manifest, so a
    * committed snapshot always has one; the metadata behind
    * `AS OF TIMESTAMP` time travel ([[snapshotAsOf]]).
    */
  private def writeCommitTime(s: SparkSession, root: String, k: Long): Unit = {
    val out = fs(s, root).create(new Path(s"$root/manifests/t$k"), true)
    try out.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Commit k's recorded wall-clock time, falling back to the manifest
    * directory's mtime for stores written before the sidecar existed.
    */
  def commitTimeOf(s: SparkSession, root: String, k: Long): Long = {
    val p = new Path(s"$root/manifests/t$k")
    val f = fs(s, root)
    if (f.exists(p)) {
      val in = f.open(p)
      try new String({
        val b = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n >= 0) { b.write(buf, 0, n); n = in.read(buf) }
        b.toByteArray
      }, "UTF-8").trim.toLong
      finally in.close()
    } else f.getFileStatus(new Path(s"$root/manifests/m$k")).getModificationTime
  }

  /** `AS OF TIMESTAMP` resolution: the LATEST committed snapshot whose
    * commit time is ≤ `tsMillis` — 0 (the empty table) when every
    * commit is later. One `manifests/` listing plus one tiny sidecar
    * read per committed snapshot; commit times are monotone in k
    * because commits serialize through the claim CAS, so the answer is
    * well-defined. Wall-clock metadata is inherently
    * environment-dependent, so this carries a spec (resolution at,
    * between, before and after the recorded instants) rather than a
    * DuckDB-oracled query.
    */
  def snapshotAsOf(s: SparkSession, root: String, tsMillis: Long): Long = {
    val mdir = new Path(s"$root/manifests")
    val f = fs(s, root)
    if (!f.exists(mdir)) return 0L
    f.listStatus(mdir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("m") && p.getName.drop(1).forall(_.isDigit) &&
        f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(1).toLong)
      .filter(k => commitTimeOf(s, root, k) <= tsMillis)
      .foldLeft(0L)(math.max)
  }

  /** Snapshot k's schema: the stored sidecar, falling back to the
    * union of its files' schemas (pre-sidecar stores). Snapshot 0 (the
    * empty table before any commit) has no schema by definition.
    */
  private def tableSchema(s: SparkSession, root: String, k: Long): StructType = {
    if (k == 0L) return new StructType()
    readStoredSchema(s, root, k).getOrElse {
      val paths = manifest(s, root, k).select("path")
        .collect().map(_.getString(0))
      if (paths.isEmpty) new StructType()
      else s.read.option("mergeSchema", "true").parquet(paths.toIndexedSeq: _*).schema
    }
  }

  /** Additive schema merge: previous snapshot's fields, plus any field
    * the new data introduces (the q212 evolution); an evolved column
    * reads as NULL on pre-evolution files via the schema-merging scan.
    */
  private def mergedSchema(prev: StructType, next: StructType): StructType = {
    val have = prev.fieldNames.toSet
    StructType(prev.fields ++ next.fields.filterNot(f => have(f.name)))
  }

  // ---- MERGE-ON-READ deletes: equality-delete files ----------------

  /** Manifest rows with the `kind` discriminator normalized: stores
    * that never committed a delete file have no `kind` column (and
    * manifest files written before a store's first delete read it as
    * NULL through the merging scan) — both mean `data`.
    */
  private def withKind(m: DataFrame): DataFrame =
    if (m.columns.contains("kind"))
      m.withColumn("kind", coalesce(col("kind"), lit("data")))
    else m.withColumn("kind", lit("data"))

  /** Snapshot k's manifest split into (data files with their commit
    * ids, equality-delete files with theirs, position-delete file
    * paths, equality-delete row count, position-delete row count).
    * One metadata read.
    */
  private def splitManifest(s: SparkSession, root: String, k: Long):
      (Seq[(String, Long)], Seq[(String, Long)], Seq[(String, Long)], Long, Long) = {
    val (dat, del, pos, nDel, nPos, _) = splitManifestNulls(s, root, k)
    (dat, del, pos, nDel, nPos)
  }

  /** [[splitManifest]] plus each data file's recorded null-key count
    * (None = a pre-`n_nulls` writer — readers must stay conservative)
    * — the SAME single metadata collect, so callers that consult the
    * null counts pay nothing extra.
    */
  private def splitManifestNulls(s: SparkSession, root: String, k: Long):
      (Seq[(String, Long)], Seq[(String, Long)], Seq[(String, Long)], Long, Long,
        Map[String, Option[Long]]) = {
    // memoized metadata rows + driver-side splitting: no collect job,
    // no manifest-footer re-read on repeat resolutions (see
    // [[manifestRowsOf]])
    val (schema, rows) = manifestRowsOf(s, root, k)
    val hasNulls = schema.fieldNames.contains("n_nulls")
    val dat = rows.filter(_.getAs[String]("kind") == "data")
    val del = rows.filter(_.getAs[String]("kind") == "delete")
    val pos = rows.filter(_.getAs[String]("kind") == "posdelete")
    (dat.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
      del.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
      pos.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
      del.map(_.getAs[Long]("n_rows")).sum,
      pos.map(_.getAs[Long]("n_rows")).sum,
      dat.map(r => r.getAs[String]("path") ->
        (if (!hasNulls || r.isNullAt(r.fieldIndex("n_nulls"))) None
         else Some(r.getAs[Long]("n_nulls")))).toMap)
  }

  /** Normalize a file path for identity comparison across producers:
    * manifest rows record `FileSystem.listStatus` paths
    * (`file:/tmp/x`) while the parquet reader's `_metadata.file_path`
    * is a fully-qualified URI (`file:///tmp/x`) — scheme and empty
    * authority strip to the same `/tmp/x`. A position delete joins on
    * this form.
    */
  private def normPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.\\-]*:/+", "/")

  /** Driver-side twin of [[normPath]]. */
  private[graft] def normPathStr(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.\\-]*:/+", "/")

  /** Read a set of data files with their delete files applied under
    * the SEQUENCE RULE: an equality-delete file (commit d) removes a
    * key only from data files committed BEFORE it (commit c < d) — a
    * later re-insert of the same key survives, exactly the Iceberg
    * sequence-number semantics. Data rows are tagged with their
    * file's commit id (one reader per commit group — commit counts
    * between compactions are small, and [[compact]] folds every
    * delete file away), then one LEFT ANTI join against the delete
    * keys drops the dead rows; the delete side broadcasts when the
    * manifest's n_rows total says it is small (the common case — the
    * whole point of MOR is that deletes are tiny next to data). A
    * NULL key matches no delete key — null-id rows are never
    * MOR-deleted, consistent with [[deleteRange]]'s SQL semantics.
    */
  private def readWithDeletes(s: SparkSession, root: String, k: Long,
      dataFiles: Seq[(String, Long)], deleteFiles: Seq[(String, Long)],
      posFiles: Seq[String] = Nil, deleteRows: Long = 0L,
      posRows: Long = 0L, keepPos: Boolean = false): DataFrame = {
    if (dataFiles.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        tableSchema(s, root, k))
    // field-id renames per commit era (empty for any store that never
    // renamed — one tiny sidecar read per distinct commit id)
    val renames: Map[Long, Seq[(String, String)]] =
      dataFiles.map(_._2).distinct
        .map(c => c -> renamesFor(s, root, k, c)).toMap
    val anyRename = renames.values.exists(_.nonEmpty)
    val needPos = keepPos || posFiles.nonEmpty
    if (deleteFiles.isEmpty && !anyRename && !needPos)
      return s.read.option("mergeSchema", "true")
        .parquet(dataFiles.map(_._1): _*)
    val data = dataFiles.groupBy(_._2).toSeq.map { case (cid, fs) =>
      val raw = s.read.option("mergeSchema", "true").parquet(fs.map(_._1): _*)
      // a position delete addresses the physical row: (file, ordinal)
      // from the reader's metadata columns — no table column needed
      val base = (if (needPos)
          raw.withColumn("__path", normPath(col("_metadata.file_path")))
            .withColumn("__pos", col("_metadata.row_index"))
        else raw).withColumn("__cid", lit(cid))
      // rename BEFORE the union, so a pre-rename file's column lands
      // under its field id's CURRENT name and a re-added old name
      // (fresh id) reads as NULL on old files, never their stale data
      renames(cid).foldLeft(base) { case (d, (o, n)) =>
        d.withColumnRenamed(o, n)
      }
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    val eqApplied =
      if (deleteFiles.isEmpty) data
      else {
        val dels = deleteFiles.groupBy(_._2).toSeq.map { case (cid, fs) =>
          s.read.parquet(fs.map(_._1): _*)
            .select(col("doc_id").as("__dk")).withColumn("__dcid", lit(cid))
        }.reduce(_ unionByName _)
        val delSide = if (deleteRows <= 4000000L) broadcast(dels) else dels
        data.join(delSide,
          col("doc_id") === col("__dk") && col("__dcid") > col("__cid"),
          "left_anti")
      }
    // position deletes join on physical identity (normalized path,
    // row ordinal) — no sequence rule needed: a path names exactly one
    // immutable file, and a delete against a since-compacted file is
    // inert by construction
    val posApplied =
      if (posFiles.isEmpty) eqApplied
      else {
        val pd = s.read.parquet(posFiles: _*)
          .select(normPath(col("path")).as("__pp"), col("pos").as("__ppos"))
          .distinct()
        val pdSide = if (posRows <= 4000000L) broadcast(pd) else pd
        eqApplied.join(pdSide,
          col("__path") === col("__pp") && col("__pos") === col("__ppos"),
          "left_anti")
      }
    val out = posApplied.drop("__cid")
    if (keepPos) out else out.drop("__path", "__pos")
  }

  /** MERGE-ON-READ DELETE: commit the given keys as an EQUALITY-DELETE
    * FILE — a tiny parquet of doc_ids plus one `kind = delete`
    * manifest row; ZERO data files are read or rewritten (the
    * write-amplification complement to [[deleteRange]]'s copy-on-
    * write: a 1-row correction costs 1 metadata row, not a file
    * rewrite). Readers anti-join the delete keys under the sequence
    * rule ([[readWithDeletes]]); [[compact]] folds every delete file
    * into the data and drops it. Returns the new snapshot id.
    */
  def deleteKeys(s: SparkSession, root: String, keys: DataFrame): Long = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dir = s"$root/data/d$token"
    keys.select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id").isNotNull).distinct()
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val f = fs(s, root)
    val file = f.listStatus(new Path(dir)).toSeq.map(_.getPath.toString)
      .filter(_.endsWith(".parquet")).head
    val st = s.read.parquet(file)
      .agg(count(lit(1)).cast("long"), min(col("doc_id")).cast("long"),
        max(col("doc_id")).cast("long")).head()
    require(st.getLong(0) > 0, "deleteKeys with an empty key set")
    commitRetry(s, root) { prev =>
      require(prev > 0, "deleteKeys on an empty table")
      val k = prev + 1
      import s.implicits._
      val row = Seq((file, k, st.getLong(0), st.getLong(1), st.getLong(2), "delete"))
        .toDF("path", "commit_id", "n_rows", "min_id", "max_id", "kind")
      (listOf(s, root, prev) :+ writeManifestFile(s, root, row),
        tableSchema(s, root, prev))
    }
  }

  /** MERGE-ON-READ DELETE BY PREDICATE: commit a POSITION-DELETE FILE
    * — (normalized file path, row ordinal) pairs identifying the live
    * rows matching `cond` — plus one `kind = posdelete` manifest row;
    * ZERO data files are rewritten. This is the delete shape an engine
    * emits when the predicate is NOT key-ranged (equality-delete files
    * carry keys; a predicate on any other column has no key set):
    * physical row identity comes free from the parquet reader's
    * `_metadata` columns, needs no sequence rule (a path names exactly
    * one immutable file; a later re-insert lands in a NEW file), and
    * can even delete NULL-key rows, which key-based MOR never can.
    * Positions are computed INSIDE the commit retry against the
    * claim-time snapshot, so a raced writer's concurrent append is
    * never missed or double-counted. [[compact]] folds every position
    * file into data and drops it. Returns the new snapshot id.
    */
  def deleteWhere(s: SparkSession, root: String,
      cond: org.apache.spark.sql.Column): Long =
    commitRetry(s, root) { prev =>
      require(prev > 0, "deleteWhere on an empty table")
      val (dat, del, pos, nDel, nPos) = splitManifest(s, root, prev)
      val hits = readWithDeletes(s, root, prev, dat, del, pos.map(_._1), nDel, nPos,
          keepPos = true)
        .filter(cond)
        .select(col("__path").as("path"), col("__pos").as("pos"))
      val token = java.util.UUID.randomUUID().toString.take(12)
      val dirp = s"$root/data/p$token"
      hits.coalesce(1).write.mode("overwrite").parquet(dirp)
      val f = fs(s, root)
      val file = f.listStatus(new Path(dirp)).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".parquet")).head
      val n = s.read.parquet(file).count()
      require(n > 0, "deleteWhere matched no rows")
      val k = prev + 1
      import s.implicits._
      // open-interval id stats: a position delete is keyless, so it
      // must never be stats-pruned
      val row = Seq((file, k, n, Long.MinValue, Long.MaxValue, "posdelete"))
        .toDF("path", "commit_id", "n_rows", "min_id", "max_id", "kind")
      (listOf(s, root, prev) :+ writeManifestFile(s, root, row),
        tableSchema(s, root, prev))
    }

  /** TIME TRAVEL: the table as of snapshot k — exactly the files
    * manifest k names, handed to the scan as an explicit list (the
    * table-format planner shape; no directory walk, so orphaned or
    * later files are invisible by construction). An EMPTY snapshot
    * (every row deleted) reads as zero rows of the STORED schema
    * instead of erroring. Live equality-delete files apply as the
    * anti-join ([[readWithDeletes]]); the fast path (no delete files
    * — every store until its first [[deleteKeys]], and again after
    * each [[compact]]) is the plain merged scan.
    */
  def readSnapshot(s: SparkSession, root: String, k: Long): DataFrame = {
    // mergeSchema: the snapshot's schema is the UNION across its
    // files, so an additive evolution (q212) surfaces as NULLs on
    // pre-evolution files instead of being silently dropped — the
    // table-format read contract (a no-op on uniform-schema stores).
    // The read then ALIGNS to the stored schema sidecar: a column no
    // file carries yet (a metadata-only `ALTER TABLE ADD COLUMN`)
    // reads as NULL, in the declared order.
    val (dat, del, pos, nDel, nPos) = splitManifest(s, root, k)
    alignToSchema(
      readWithDeletes(s, root, k, dat, del, pos.map(_._1), nDel, nPos),
      tableSchema(s, root, k))
  }

  /** Project `df` onto the snapshot's declared schema: missing columns
    * null-fill (typed), order follows the declaration. A no-op
    * projection when the file union already matches.
    */
  private def alignToSchema(df: DataFrame, schema: StructType): DataFrame = {
    if (schema.isEmpty || df.columns.toSeq == schema.fieldNames.toSeq) return df
    val have = df.columns.toSet
    df.select(schema.fields.map(f =>
      if (have(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  /** The file paths a doc_id range [lo, hi] can possibly touch in
    * snapshot k — manifest rows whose [min_id, max_id] intersect the
    * range. A driver-side filter over O(#files) metadata rows: the
    * Iceberg shape where the planner prunes the FILE LIST from
    * manifest stats before the engine ever sees a path.
    */
  private[graft] def prunedPaths(s: SparkSession, root: String, k: Long,
      lo: Long, hi: Long): Seq[String] = {
    val (_, rows) = manifestRowsOf(s, root, k)
    rows.filter(r => r.getAs[String]("kind") == "data" &&
        !r.isNullAt(r.fieldIndex("max_id")) && !r.isNullAt(r.fieldIndex("min_id")) &&
        r.getAs[Long]("max_id") >= lo && r.getAs[Long]("min_id") <= hi)
      .map(_.getAs[String]("path")).toIndexedSeq
  }

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
    val (dat, del, pos, nDel, nPos) = splitManifest(s, root, k)
    val pruned = {
      val hitSet = prunedPaths(s, root, k, lo, hi).toSet
      dat.filter(p => hitSet(p._1))
    }
    if (pruned.isEmpty)
      return readSnapshot(s, root, k).filter(lit(false))
    readWithDeletes(s, root, k, pruned, del, pos.map(_._1), nDel, nPos)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
  }

  /** SNAPSHOT DIFF: rows appended after snapshot j, as of snapshot k
    * (j < k) — append-only makes this the files with `commit_id > j`
    * in manifest k; no row is compared. An empty diff (j == k) reads
    * as zero rows of the snapshot schema.
    */
  def readDiff(s: SparkSession, root: String, j: Long, k: Long): DataFrame = {
    val (dat, del, pos, nDel, nPos) = splitManifest(s, root, k)
    val window = dat.filter(_._2 > j)
    if (window.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        tableSchema(s, root, k))
    // deletes with commit id ≤ a window file's never apply under the
    // sequence rule, so passing ALL delete files is exact; position
    // deletes address physical files, exact by identity
    readWithDeletes(s, root, k, window, del, pos.map(_._1), nDel, nPos)
  }

  // ---- lifecycle: copy-on-write delete, merge, compaction, expiration

  /** COPY-ON-WRITE DELETE of doc_id ∈ [lo, hi] as commit
    * `current + 1`: the manifest stats decide which files the range
    * can touch — UNTOUCHED files carry over into the new manifest
    * verbatim (their bytes never move, their old commit_id stays);
    * only the AFFECTED files are read back (schema-merged, so an
    * evolved column survives the rewrite — ADVICE r13), filtered, and
    * rewritten as this commit's files. Old snapshots still name the
    * old files, so time travel reads the PRE-delete table forever — a
    * delete in this format is just a new manifest; a whole-table
    * delete commits an EMPTY manifest whose snapshot reads as zero
    * rows of the stored schema. At 100 TB the stats pruning is the
    * whole economics: a narrow delete rewrites the handful of files it
    * intersects, never the table. Note diff semantics: [[readDiff]]'s
    * `commit_id > j` reading is APPEND-ONLY history's; a rewrite
    * commit carries surviving OLD rows under the new commit_id.
    */
  def deleteRange(s: SparkSession, root: String, lo: Long, hi: Long): Long =
    commitRetry(s, root) { prev =>
      require(prev > 0, "deleteRange on an empty table")
      val k = prev + 1
      val mfull = withKind(manifestFull(s, root, prev))
      // only DATA files rewrite; live equality-delete files carry, and
      // the affected rows are read THROUGH them (a MOR-deleted row
      // must not resurrect into this commit's k-id files, where older
      // delete files no longer apply)
      val hit = col("kind") === "data" &&
        col("max_id") >= lo && col("min_id") <= hi
      val affRows = mfull.filter(hit).select("path", "commit_id", "mpath").collect()
      val affected = affRows.map(_.getAs[String]("path")).toIndexedSeq
      val schema = tableSchema(s, root, prev)
      // manifest-file granularity: only the manifest files that
      // reference an affected data file are rewritten (their surviving
      // rows + this commit's new files move into ONE new manifest
      // file); every other manifest file carries by reference —
      // metadata cost O(touched), never O(#live files)
      val touchedM = affRows.map(_.getAs[String]("mpath")).toSet
      val carried = listOf(s, root, prev).filterNot(touchedM)
      if (affected.isEmpty) (carried, schema) // no-op delete: pure list reuse
      else {
        val delFiles = mfull.filter(col("kind") === "delete")
          .select("path", "commit_id", "n_rows").collect()
        val posFiles = mfull.filter(col("kind") === "posdelete")
          .select("path", "n_rows").collect()
        // NULL-SAFE keep predicate: `!between` alone evaluates to NULL
        // (dropped) for NULL doc_id — and all-null-id files are always
        // "affected" (their stats are the open interval), so a plain
        // range delete would erase every null-id row it touches. SQL
        // DELETE semantics: a NULL key satisfies no range predicate,
        // so null-id rows are KEPT (ADVICE r14 medium).
        val rewritten = writeDataFiles(s, root,
          readWithDeletes(s, root, prev,
            affRows.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
            delFiles.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
            posFiles.map(_.getAs[String]("path")).toIndexedSeq,
            delFiles.map(_.getAs[Long]("n_rows")).sum,
            posFiles.map(_.getAs[Long]("n_rows")).sum)
            .filter(col("doc_id").isNull || !col("doc_id").between(lo, hi)))
        val survivors = mfull
          .filter(col("mpath").isin(touchedM.toSeq: _*) && !hit).drop("mpath")
        val mf = writeManifestFile(s, root, survivors.unionByName(
          manifestRows(s, rewritten, k), allowMissingColumns = true))
        (carried :+ mf, schema)
      }
    }

  /** The distributed affected-file decision for [[mergeInto]]: the
    * change keys summarize into CONTIGUOUS GRANULES (key div 1024 →
    * per-granule min/max — O(keyspan/1024) rows however many keys),
    * and a range join against the manifest stats picks every file some
    * granule interval intersects. A SUPERSET of the exact affected set
    * (a granule can straddle a file without holding a key inside it),
    * which is sound — extra files rewrite to identical rows — and
    * never collects a key to the driver (VERDICT r13 item 3).
    */
  private def affectedByJoin(s: SparkSession, m: DataFrame,
      changes: DataFrame): Set[String] = {
    val granules = changes
      .select(col("doc_id").cast("long").as("k"))
      .groupBy((col("k") - pmod(col("k"), lit(1024L))).as("g"))
      .agg(min(col("k")).as("gmin"), max(col("k")).as("gmax"))
    m.join(granules,
        col("max_id") >= col("gmin") && col("min_id") <= col("gmax"),
        "left_semi")
      .select("path").collect().map(_.getString(0)).toSet
  }

  /** The driver-side decision for CDC-sized change sets: collect the
    * distinct keys (sorted) and binary-search each file's stats
    * interval — exact, O(#files · log #keys) driver work.
    */
  private def affectedByCollect(s: SparkSession, m: DataFrame,
      changes: DataFrame): Set[String] = {
    val keys = changes.select(col("doc_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted
    m.collect().filter { r =>
      val (mn, mx) = (r.getAs[Long]("min_id"), r.getAs[Long]("max_id"))
      val i = java.util.Arrays.binarySearch(keys, mn)
      val next = if (i >= 0) i else -(i + 1)
      next < keys.length && keys(next) <= mx
    }.map(_.getString(0)).toSet
  }

  /** COPY-ON-WRITE MERGE (upsert) of `changes` keyed by doc_id, as
    * commit `current + 1`: rows whose key exists in the table are
    * REPLACED by their change row, keys absent from the table are
    * INSERTED — the MERGE INTO the delete/append pair implies. File
    * selection is stats-driven like [[deleteRange]]: a file is
    * affected iff its [min_id, max_id] contains ANY changed key;
    * unaffected files carry over verbatim, which is sound because a
    * key inside an unaffected file's range would have made it
    * affected — so every key the table holds lives in an affected
    * file. The rewrite is then one anti-join:
    * `affected_rows ⟕̸ changes ∪ changes` (replaced rows drop out,
    * every change row lands exactly once, inserts included with no
    * separate existence check). The affected-file decision runs
    * driver-side for CDC-sized batches and switches to the
    * [[affectedByJoin]] granule range join above
    * [[MergeJoinThresholdKey]] rows — large upserts never collect
    * their key set.
    */
  def mergeInto(s: SparkSession, root: String, changes: DataFrame): Long = {
    // The change set is read by the path decision AND the rewrite (and
    // again per claim-race retry) — but `changes` is caller-supplied
    // and may be an arbitrarily expensive unmaterialized plan, so it
    // is CACHED for the merge's duration and its input plan computes
    // exactly ONCE (spec-witnessed with a side-effect-counting
    // source; ADVICE/VERDICT r14). The cache is O(|commit|), never
    // O(table) — the same bound as the data files the merge writes.
    val cached = changes.persist()
    try {
      val nChanges = cached.count() // materializes the cache
      require(nChanges > 0, "mergeInto with an empty change set")
      val threshold = changes.sparkSession.conf
        .getOption(MergeJoinThresholdKey).map(_.toLong).getOrElse(100000L)
      commitRetry(s, root) { prev =>
        require(prev > 0, "mergeInto on an empty table")
        val k = prev + 1
        val mfull = withKind(manifestFull(s, root, prev))
        val dataOnly = mfull.filter(col("kind") === "data")
        val affected =
          if (nChanges >= threshold) affectedByJoin(s, dataOnly, cached)
          else affectedByCollect(s, dataOnly, cached)
        val base =
          if (affected.isEmpty) cached
          else {
            // affected rows read THROUGH live delete files — see
            // [[deleteRange]]: MOR-deleted rows must not resurrect
            val affRows = dataOnly
              .filter(col("path").isin(affected.toSeq: _*))
              .select("path", "commit_id").collect()
              .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
            val delFiles = mfull.filter(col("kind") === "delete")
              .select("path", "commit_id", "n_rows").collect()
            val posFiles = mfull.filter(col("kind") === "posdelete")
              .select("path", "n_rows").collect()
            readWithDeletes(s, root, prev, affRows,
              delFiles.map(r => (r.getString(0), r.getLong(1))).toIndexedSeq,
              posFiles.map(_.getAs[String]("path")).toIndexedSeq,
              delFiles.map(_.getAs[Long]("n_rows")).sum,
              posFiles.map(_.getAs[Long]("n_rows")).sum)
              .join(cached.select("doc_id"), Seq("doc_id"), "left_anti")
              .unionByName(cached, allowMissingColumns = true)
          }
        // manifest-file granularity, as in [[deleteRange]]: rewrite
        // only the manifest files referencing an affected data file
        val isAffected = col("kind") === "data" &&
          col("path").isin(affected.toSeq: _*)
        val touchedM = mfull.filter(isAffected).select("mpath").distinct()
          .collect().map(_.getString(0)).toSet
        val carried = listOf(s, root, prev).filterNot(touchedM)
        val survivors = mfull
          .filter(col("mpath").isin(touchedM.toSeq: _*) && !isAffected)
          .drop("mpath")
        val mf = writeManifestFile(s, root, survivors.unionByName(
          manifestRows(s, writeDataFiles(s, root, base), k),
          allowMissingColumns = true))
        (carried :+ mf,
          mergedSchema(tableSchema(s, root, prev), changes.schema))
      }
    } finally cached.unpersist(false)
  }

  /** COMPACTION as commit `current + 1`: the current snapshot's whole
    * file set rewritten into [[CommitFiles]] range-clustered files —
    * rows identical, small files gone, stats tight again. The old
    * files stay on disk for the old snapshots until [[expire]] drops
    * them; zone-local/content-defined compaction of a CLUSTERED store
    * is q193's — this is the table-format variant where compaction is
    * just another commit and readers never notice.
    */
  def compact(s: SparkSession, root: String): Long = {
    // a Z-clustered store must not be flattened back to the 1-D
    // layout by an unsuspecting maintenance job — delegate
    if (isZStore(s, root, currentSnapshot(s, root)))
      return compactZ(s, root)
    // a COMPOSED store re-lays BOTH levels — checked first, because a
    // composed store also satisfies each single-level claim and a
    // single-level rewrite would silently halve the layout
    if (composedSpecOf(s, root, currentSnapshot(s, root)).isDefined)
      return compactComposed(s, root)
    // likewise a bucketed store: compaction re-lays the SAME buckets
    // (voiding the claim would silently cost every SPJ its alignment)
    if (bucketSpecOf(s, root, currentSnapshot(s, root)).isDefined)
      return compactBucketed(s, root)
    // and an identity-partitioned store re-lays its partition values
    if (partSpecOf(s, root, currentSnapshot(s, root)).isDefined)
      return compactPartitioned(s, root)
    commitRetry(s, root) { prev =>
      require(prev > 0, "compact on an empty table")
      val k = prev + 1
      val rewritten = writeDataFiles(s, root, readSnapshot(s, root, prev))
      // every file replaced → ONE fresh manifest file, nothing carried
      (Seq(writeManifestFile(s, root, manifestRows(s, rewritten, k))),
        tableSchema(s, root, prev))
    }
  }

  /** BIN-PACKING COMPACTION as commit `current + 1`: rewrite ONLY the
    * data files under `minRows` into ~`targetRows`-sized range-
    * clustered files; every file already at size carries over verbatim
    * (same bytes, same commit id, its manifest file reused by
    * REFERENCE when untouched). This is the maintenance shape a
    * streaming or frequently-committing table needs at 100 TB: a table
    * taking thousands of small commits accumulates thousands of small
    * files, and full [[compact]] — O(table) — cannot run after every
    * burst; `binPack` is O(small tail) in both data and metadata.
    * Rewritten rows are read THROUGH live delete files (their new
    * commit id postdates every delete, so folded deletes never
    * re-apply and MOR-deleted rows never resurrect — the
    * [[deleteRange]] argument); untouched files keep their delete
    * files live. Returns the new snapshot id (prev when nothing to
    * pack — no empty commits).
    */
  def binPack(s: SparkSession, root: String, minRows: Long,
      targetRows: Long): Long = {
    require(targetRows >= minRows && minRows > 0,
      s"binPack needs 0 < minRows ($minRows) <= targetRows ($targetRows)")
    // no-op pre-check: fewer than two undersized files → nothing to
    // pack, NO empty commit (a racing writer making new small files
    // after this read simply leaves them for the next binPack)
    val pre = currentSnapshot(s, root)
    require(pre > 0, "binPack on an empty table")
    val nSmallPre = manifestRowsOf(s, root, pre)._2
      .count(r => r.getAs[String]("kind") == "data" &&
        r.getAs[Long]("n_rows") < minRows)
    if (nSmallPre < 2) return pre
    commitRetry(s, root) { prev =>
      val k = prev + 1
      val mfull = withKind(manifestFull(s, root, prev))
      val small = col("kind") === "data" && col("n_rows") < minRows
      val smallRows = mfull.filter(small)
        .select("path", "commit_id", "n_rows", "mpath").collect()
      val schema = tableSchema(s, root, prev)
      // a racing writer can shrink the small set below 2 before our
      // claim lands — commit the list-reuse snapshot (rare, harmless)
      if (smallRows.length < 2) (listOf(s, root, prev), schema)
      else {
        val delFiles = mfull.filter(col("kind") === "delete")
          .select("path", "commit_id", "n_rows").collect()
        val posFiles = mfull.filter(col("kind") === "posdelete")
          .select("path", "n_rows").collect()
        val total = smallRows.map(_.getAs[Long]("n_rows")).sum
        val nOut = math.max(1L, (total + targetRows - 1L) / targetRows).toInt
        val packedDf = readWithDeletes(s, root, prev,
          smallRows.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
          delFiles.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
          posFiles.map(_.getAs[String]("path")).toIndexedSeq,
          delFiles.map(_.getAs[Long]("n_rows")).sum,
          posFiles.map(_.getAs[Long]("n_rows")).sum)
        // a Z store packs ALONG THE INTERLEAVE (both dims' stats
        // re-recorded), a bucketed store ALONG ITS BUCKETS (ids
        // re-recorded), so maintenance never degrades 2-D pruning or
        // voids the SPJ layout claim
        val packedRows =
          if (isZStore(s, root, prev))
            zManifestRows(s, writeZDataFiles(s, root, packedDf), k)
          else composedSpecOf(s, root, prev) match {
            case Some((pc, nb, bc)) => composedManifestRows(s,
              writeComposedDataFiles(s, root, packedDf, pc, nb, bc), k,
              pc, nb, bc)
            case None => bucketSpecOf(s, root, prev) match {
              case Some((nb, by)) => bucketedManifestRows(s,
                writeBucketedDataFiles(s, root, packedDf, nb, by), k, nb, by)
              case None => partSpecOf(s, root, prev) match {
                case Some(by) => partitionedManifestRows(s,
                  writePartitionedDataFiles(s, root, packedDf, by), k, by)
                case None =>
                  manifestRows(s, writeDataFilesN(s, root, packedDf, nOut), k)
              }
            }
          }
        // manifest-file granularity, as in [[deleteRange]]
        val touchedM = smallRows.map(_.getAs[String]("mpath")).toSet
        val carried = listOf(s, root, prev).filterNot(touchedM)
        val survivors = mfull
          .filter(col("mpath").isin(touchedM.toSeq: _*) && !small).drop("mpath")
        val mf = writeManifestFile(s, root, survivors.unionByName(
          packedRows, allowMissingColumns = true))
        (carried :+ mf, schema)
      }
    }
  }

  /** DELETE-FILE FOLD (minor compaction) as commit `current + 1`:
    * apply every live equality/position delete file to ONLY the data
    * files it can touch, rewrite those, and drop the delete files —
    * the read path returns to the plain no-anti-join scan while every
    * untouched data file carries verbatim. The affected set is exact
    * and metadata-priced: equality deletes collect their key sets
    * (tiny by the format's design) and binary-search each file's
    * [min_id, max_id] under the sequence rule (`dcid > cid`); position
    * deletes name their target paths outright. A key the stats say no
    * file holds — or one whose only candidate files PREdate nothing —
    * folds away for free. This is the complement of [[binPack]]:
    * together they bound BOTH accumulation channels (small files,
    * delete files) without ever paying [[compact]]'s O(table) rewrite.
    * Returns the current snapshot unchanged (no empty commit) when no
    * delete file is live.
    */
  def foldDeletes(s: SparkSession, root: String): Long = {
    val pre = currentSnapshot(s, root)
    require(pre > 0, "foldDeletes on an empty table")
    if (!manifestRowsOf(s, root, pre)._2
      .exists(_.getAs[String]("kind") != "data")) return pre
    commitRetry(s, root) { prev =>
      val k = prev + 1
      val mfull = withKind(manifestFull(s, root, prev))
      val schema = tableSchema(s, root, prev)
      val delRows = mfull.filter(col("kind") === "delete")
        .select("path", "commit_id", "n_rows", "mpath").collect()
      val posRows = mfull.filter(col("kind") === "posdelete")
        .select("path", "n_rows", "mpath").collect()
      if (delRows.isEmpty && posRows.isEmpty) (listOf(s, root, prev), schema)
      else {
        // position targets: the (normalized) paths the delete names —
        // a distinct-path collect, bounded by #data files however many
        // positions the delete files hold
        val posTargets: Set[String] =
          if (posRows.isEmpty) Set.empty
          else s.read.parquet(posRows.map(_.getAs[String]("path")).toIndexedSeq: _*)
            .select("path").distinct().collect().map(_.getString(0)).toSet
        val dataRows = mfull.filter(col("kind") === "data")
          .select("path", "commit_id", "min_id", "max_id", "mpath").collect()
        // equality targets: a data file is hit iff some key lands in
        // its stats interval AND the delete postdates it (the sequence
        // rule). Below the threshold the keys collect (sorted) and
        // binary-search each file's interval — exact, driver-cheap for
        // CDC-sized sets. ABOVE it (a large MOR SQL DELETE — VERDICT
        // r16 what's-wrong 1) the decision runs as the DISTRIBUTED
        // granule-summary range join: per-(granule, delete-commit)
        // min/max rows — O(keyspan/1024 · #delete commits), never
        // O(|keys|) on the driver — range-joined against the manifest
        // stats under the same sequence rule. A sound SUPERSET, like
        // [[affectedByJoin]]: extra files rewrite to identical rows.
        val totalEqRows = delRows.map(_.getAs[Long]("n_rows")).sum
        val eqAffected: Set[String] =
          if (delRows.isEmpty) Set.empty
          else if (totalEqRows <= deleteMapThreshold(s)) {
            val keysByCid: Seq[(Long, Array[Long])] =
              delRows.groupBy(_.getAs[Long]("commit_id")).toSeq.map { case (cid, fs) =>
                cid -> s.read.parquet(fs.map(_.getAs[String]("path")).toIndexedSeq: _*)
                  .select(col("doc_id")).collect().map(_.getLong(0)).sorted
              }
            dataRows.filter { r =>
              val (mn, mx) = (r.getAs[Long]("min_id"), r.getAs[Long]("max_id"))
              val cid = r.getAs[Long]("commit_id")
              keysByCid.exists { case (dcid, keys) =>
                dcid > cid && keys.nonEmpty && {
                  val i = java.util.Arrays.binarySearch(keys, mn)
                  val next = if (i >= 0) i else -(i + 1)
                  next < keys.length && keys(next) <= mx
                }
              }
            }.map(_.getAs[String]("path")).toSet
          } else {
            val delDf = delRows.groupBy(_.getAs[Long]("commit_id")).toSeq
              .map { case (cid, fs) =>
                s.read.parquet(fs.map(_.getAs[String]("path")).toIndexedSeq: _*)
                  .select(col("doc_id").cast("long").as("dk"))
                  .withColumn("dcid", lit(cid))
              }.reduce(_ unionByName _)
            val granules = delDf
              .groupBy((col("dk") - pmod(col("dk"), lit(1024L))).as("g"),
                col("dcid"))
              .agg(min(col("dk")).as("gmin"), max(col("dk")).as("gmax"))
            import s.implicits._
            val dataDf = dataRows.map(r => (r.getAs[String]("path"),
                r.getAs[Long]("commit_id"), r.getAs[Long]("min_id"),
                r.getAs[Long]("max_id")))
              .toSeq.toDF("path", "fcid", "fmin", "fmax")
            dataDf.join(granules,
                col("fmax") >= col("gmin") && col("fmin") <= col("gmax") &&
                  col("dcid") > col("fcid"), "left_semi")
              .select("path").collect().map(_.getString(0)).toSet
          }
        val affRows = dataRows.filter(r => eqAffected(r.getAs[String]("path")) ||
          posTargets(normPathStr(r.getAs[String]("path"))))
        val affected = affRows.map(_.getAs[String]("path")).toSet
        // rewrite the affected files with every delete applied; new
        // rows land under commit id k, so nothing re-applies — along
        // the Morton interleave on a Z store (2-D stats preserved)
        val foldedDf =
          if (affRows.isEmpty) None
          else Some(readWithDeletes(s, root, prev,
            affRows.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
            delRows.map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq,
            posRows.map(_.getAs[String]("path")).toIndexedSeq,
            delRows.map(_.getAs[Long]("n_rows")).sum,
            posRows.map(_.getAs[Long]("n_rows")).sum))
        // every manifest file naming an affected data file OR any
        // delete file rewrites its surviving rows; the rest carry
        val touchedM = affRows.map(_.getAs[String]("mpath")).toSet ++
          delRows.map(_.getAs[String]("mpath")) ++
          posRows.map(_.getAs[String]("mpath"))
        val carried = listOf(s, root, prev).filterNot(touchedM)
        val dead = col("kind") =!= "data" ||
          col("path").isin(affected.toSeq: _*)
        val survivors = mfull
          .filter(col("mpath").isin(touchedM.toSeq: _*) && !dead).drop("mpath")
        val newRows = foldedDf match {
          case None => manifestRows(s, Nil, k)
          case Some(df) if isZStore(s, root, prev) =>
            zManifestRows(s, writeZDataFiles(s, root, df), k)
          case Some(df) => composedSpecOf(s, root, prev) match {
            case Some((pc, nb, bc)) => composedManifestRows(s,
              writeComposedDataFiles(s, root, df, pc, nb, bc), k, pc, nb, bc)
            case None => bucketSpecOf(s, root, prev) match {
              case Some((nb, by)) => bucketedManifestRows(s,
                writeBucketedDataFiles(s, root, df, nb, by), k, nb, by)
              case None => partSpecOf(s, root, prev) match {
                case Some(by) => partitionedManifestRows(s,
                  writePartitionedDataFiles(s, root, df, by), k, by)
                case None => manifestRows(s, writeDataFiles(s, root, df), k)
              }
            }
          }
        }
        val mf = writeManifestFile(s, root, survivors.unionByName(
          newRows, allowMissingColumns = true))
        (carried :+ mf, schema)
      }
    }
  }

  /** REPLACE-FILES commit — the landing half of a SQL row-level
    * operation (UPDATE / MERGE INTO / predicate DELETE through the
    * connector's group-based copy-on-write): data files `replaced`
    * leave the manifest, `written` (stats from the executor writers)
    * enter under the new commit id, with the usual manifest-file
    * granularity (only manifest files naming a replaced file rewrite;
    * live delete-file rows in them survive — they never apply to the
    * new commit's files). OPTIMISTIC CONCURRENCY at statement scope:
    * the operation scanned snapshot `scanSnapshot`, so any commit
    * landed since makes the scanned file set stale — fail loudly and
    * let the user re-run, never splice a rewrite over someone else's
    * commit (the Iceberg validation contract).
    */
  private[graft] def commitReplaceFiles(s: SparkSession, root: String,
      scanSnapshot: Long, replaced: Seq[String],
      written: Seq[(String, Long, Long, Long, Long)], schema: StructType): Long =
    commitRetry(s, root) { prev =>
      if (prev != scanSnapshot)
        throw new IllegalStateException(
          s"concurrent commit detected: the row-level operation read snapshot " +
            s"$scanSnapshot but the table is now at $prev — re-run the statement")
      val k = prev + 1
      val mfull = withKind(manifestFull(s, root, prev))
      val isReplaced = col("kind") === "data" &&
        col("path").isin(replaced: _*)
      val touchedM = mfull.filter(isReplaced).select("mpath").distinct()
        .collect().map(_.getString(0)).toSet
      val carried = listOf(s, root, prev).filterNot(touchedM)
      val survivors = mfull
        .filter(col("mpath").isin(touchedM.toSeq: _*) && !isReplaced)
        .drop("mpath")
      val stats = written.map { case (p, n, lo, hi, nn) =>
        FileStat(p, n, lo, hi, Some(nn)) }
      val mf = writeManifestFile(s, root, survivors.unionByName(
        manifestRows(s, stats, k), allowMissingColumns = true))
      (carried :+ mf, mergedSchema(tableSchema(s, root, prev), schema))
    }

  /** The landing half of a DELTA-BASED (merge-on-read) SQL DELETE
    * ([[SnapshotDeltaWrite]]): the executor-written position-delete
    * files enter the manifest as `kind = posdelete` rows (open-
    * interval id stats — keyless, never stats-pruned), every prior
    * manifest file carried by reference. Statement-scoped OCC: the
    * operation scanned `scanSnapshot`, so any commit since makes its
    * (file, pos) identities potentially stale — fail loudly, exactly
    * like [[commitReplaceFiles]].
    */
  private[graft] def commitPositionDeleteFiles(s: SparkSession, root: String,
      scanSnapshot: Long, files: Seq[(String, Long)]): Long =
    commitRetry(s, root) { prev =>
      if (prev != scanSnapshot)
        throw new IllegalStateException(
          s"concurrent commit detected: the row-level DELETE read snapshot " +
            s"$scanSnapshot but the table is now at $prev — re-run the statement")
      val k = prev + 1
      import s.implicits._
      val rows = files.map { case (p, n) =>
        (p, k, n, Long.MinValue, Long.MaxValue, "posdelete")
      }.toDF("path", "commit_id", "n_rows", "min_id", "max_id", "kind")
      (listOf(s, root, prev) :+ writeManifestFile(s, root, rows),
        tableSchema(s, root, prev))
    }

  /** The landing half of a DELTA-BASED (merge-on-read) SQL UPDATE /
    * MERGE INTO ([[SnapshotDeltaWrite]] under `Command.UPDATE/MERGE`):
    * ONE commit carrying both halves of the mutation — the executor-
    * written position-delete files (`kind = posdelete`, the touched
    * rows' old physical identities) AND ordinary data files (the
    * post-image / not-matched-insert rows, exact per-file stats from
    * the writers). Every prior manifest file carries by reference, so
    * the commit is O(|changed rows|) data + O(1) metadata — never the
    * COW path's O(|touched files|) rewrite. Statement-scoped OCC,
    * exactly like [[commitReplaceFiles]].
    */
  private[graft] def commitDeltaMutation(s: SparkSession, root: String,
      scanSnapshot: Long, posFiles: Seq[(String, Long)],
      written: Seq[(String, Long, Long, Long, Long)],
      schema: StructType): Long =
    commitRetry(s, root) { prev =>
      if (prev != scanSnapshot)
        throw new IllegalStateException(
          s"concurrent commit detected: the row-level operation read snapshot " +
            s"$scanSnapshot but the table is now at $prev — re-run the statement")
      val k = prev + 1
      import s.implicits._
      val posRows = posFiles.map { case (p, n) =>
        (p, k, n, Long.MinValue, Long.MaxValue, "posdelete")
      }.toDF("path", "commit_id", "n_rows", "min_id", "max_id", "kind")
      val dataRows = manifestRows(s, written.map { case (p, n, lo, hi, nn) =>
        FileStat(p, n, lo, hi, Some(nn)) }, k)
      val mf = writeManifestFile(s, root,
        posRows.unionByName(dataRows.withColumn("kind", lit("data")),
          allowMissingColumns = true))
      (listOf(s, root, prev) :+ mf,
        mergedSchema(tableSchema(s, root, prev), schema))
    }

  /** TRUNCATE: the whole-table delete as a PURE-METADATA commit —
    * snapshot `current + 1` is the empty manifest list (no file read,
    * no rewrite; [[deleteRange]]'s whole-key-space spelling rewrites
    * null-id files and cannot remove null-id rows — SQL TRUNCATE
    * removes everything). The stored schema rides the commit, so the
    * empty snapshot stays readable; history stays addressable; the
    * table revives on the next append. This is also what the
    * connector's SQL `DELETE FROM t` (no residual predicate) routes
    * to. Returns the new snapshot id.
    */
  def truncate(s: SparkSession, root: String): Long =
    commitRetry(s, root) { prev =>
      require(prev > 0, "truncate on an empty table")
      (Nil, tableSchema(s, root, prev))
    }

  // ---- CREATE TABLE / CTAS: the first commit from pure SQL ---------

  /** CREATE a fresh store as snapshot 1 — an EMPTY commit carrying the
    * declared schema (and optional layout claim) through the ordinary
    * claim CAS, so a table is reachable from pure SQL `CREATE TABLE` /
    * CTAS without a library call or a seed write (VERDICT r15
    * what's-missing 2). The layout claim rides a sidecar
    * (`manifests/layout.json`): an empty table has no data files to
    * carry it, yet the FIRST `INSERT INTO` must already cluster — the
    * write path consults the declaration until real manifest rows
    * take over ([[declaredBucket]]/[[declaredPart]]).
    */
  def createTable(s: SparkSession, root: String, schema: StructType,
      bucket: Option[(Int, String)] = None,
      partition: Option[String] = None): Long = {
    require(schema.fieldNames.contains("doc_id") &&
      schema("doc_id").dataType == org.apache.spark.sql.types.LongType,
      "graft snapshot tables need a LONG doc_id column (the stats key)")
    bucket.foreach { case (n, by) =>
      require(n > 0 && schema.fieldNames.contains(by),
        s"bucket($n, $by): unknown column or non-positive count")
    }
    partition.foreach { by =>
      require(schema.fieldNames.contains(by) &&
        (schema(by).dataType == org.apache.spark.sql.types.StringType ||
          schema(by).dataType == org.apache.spark.sql.types.LongType ||
          schema(by).dataType == org.apache.spark.sql.types.IntegerType),
        s"identity($by): partition column must be an existing STRING/LONG/INT column")
    }
    val k = commitRetry(s, root) { prev =>
      require(prev == 0L,
        s"createTable: $root already has commits (current snapshot $prev)")
      (Nil, schema)
    }
    // the layout sidecar lands only AFTER the empty commit succeeds
    // (ADVICE r16 low): a CREATE that loses the claim race (concurrent
    // first append, racing CREATE with a different layout) must not
    // leave a declaration that silently re-layouts future writes of a
    // table whose creation never committed. Declaring BOTH transforms
    // is the COMPOSED layout (identity × bucket) — one sidecar carries
    // both claims.
    (bucket, partition) match {
      case (Some((n, bc)), Some(p)) => writeLayoutSidecar(s, root,
        s"""{"part_col":"$p","bucket_n":$n,"bucket_col":"$bc"}""")
      case (Some((n, bc)), None) => writeLayoutSidecar(s, root,
        s"""{"bucket_n":$n,"bucket_col":"$bc"}""")
      case (None, Some(p)) => writeLayoutSidecar(s, root,
        s"""{"part_col":"$p"}""")
      case (None, None) => ()
    }
    k
  }

  /** The DDL-declared composed layout, if both claims ride the
    * sidecar.
    */
  private[graft] def declaredComposed(s: SparkSession,
      root: String): Option[(String, Int, String)] =
    for {
      p <- declaredPart(s, root)
      nb <- declaredBucket(s, root)
    } yield (p, nb._1, nb._2)

  private def layoutPath(root: String) = new Path(s"$root/manifests/layout.json")

  private def writeLayoutSidecar(s: SparkSession, root: String,
      json: String): Unit = {
    val f = fs(s, root)
    f.mkdirs(layoutPath(root).getParent)
    val out = f.create(layoutPath(root), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** The DDL-declared bucket layout, if any — consulted by the WRITE
    * path only until data files exist to carry the claim themselves.
    */
  private[graft] def declaredBucket(s: SparkSession,
      root: String): Option[(Int, String)] =
    readSidecar(s, layoutPath(root)).flatMap { j =>
      val n = "\"bucket_n\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(j).map(_.group(1).toInt)
      val c = "\"bucket_col\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(j).map(_.group(1))
      for (nn <- n; cc <- c) yield (nn, cc)
    }

  /** The DDL-declared identity-partition layout, if any. */
  private[graft] def declaredPart(s: SparkSession, root: String): Option[String] =
    readSidecar(s, layoutPath(root)).flatMap { j =>
      "\"part_col\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(j).map(_.group(1))
    }

  /** ROLLBACK: re-commit snapshot k's exact file list as
    * `current + 1` through the same claim CAS — the recovery from a
    * bad merge/delete that completes the lifecycle: the table returns
    * to byte-identity with snapshot k while the bad commits REMAIN
    * addressable history (time travel still reads them; [[expire]]
    * eventually reclaims them). No data moves — a restore is pure
    * metadata, O(#files) manifest rows; the carried rows keep their
    * ORIGINAL commit ids, so append-only diffs against pre-restore
    * snapshots stay meaningful, and [[changeFeed]] (path-set
    * semantics) reports the restore as the INVERSE of the rolled-back
    * mutation.
    */
  def restore(s: SparkSession, root: String, k: Long): Long =
    commitRetry(s, root) { prev =>
      require(k >= 1 && k <= prev, s"restore($k): snapshot must be committed (current $prev)")
      require(fs(s, root).exists(new Path(s"$root/manifests/m$k/_SUCCESS")),
        s"restore($k): snapshot $k is not addressable (expired or torn)")
      // pure LIST reuse: zero manifest rows written, zero data moved
      (listOf(s, root, k), tableSchema(s, root, k))
    }

  /** SNAPSHOT EXPIRATION: drop every manifest with id < `keepFrom`,
    * then physically delete data files referenced by NO retained
    * manifest — reference counting as ONE DataFrame set difference
    * over the unioned manifest path lists (O(#files) metadata, never a
    * data read, no per-manifest driver loop — VERDICT r13 item 9).
    * The one operation in this store that destroys history: snapshots
    * < keepFrom stop being addressable, everything ≥ keepFrom is
    * bit-identical before and after (spec-pinned). Dropped manifests'
    * schema sidecars and claim markers go with them (committed ids
    * below the horizon can never be re-claimed — new claims are always
    * above the current snapshot).
    */
  def expire(s: SparkSession, root: String, keepFrom: Long): Unit = {
    // the current snapshot is never expirable — a horizon beyond it
    // would leave the table with no readable state at all
    require(keepFrom <= currentSnapshot(s, root),
      s"expire(keepFrom=$keepFrom) would drop the current snapshot " +
        s"${currentSnapshot(s, root)}")
    val f = fs(s, root)
    // NAMED REFS pin their snapshots across the horizon: a tagged id
    // below keepFrom survives the sweep (the Iceberg retain-refs
    // contract) — dropping the tag first is the explicit opt-out.
    // Branch BASES pin the same way: a zero-commit branch resolves its
    // list through m<base>, and a staged branch's diff-vs-base
    // semantics need the base addressable until the branch drops.
    val pinned = tags(s, root).values.toSet ++
      branches(s, root).values.map(_._1)
    // COMMITTED manifests only (`_SUCCESS`) — the same filter every
    // reader applies: a torn in-flight manifest (id current+1) must
    // not land in `kept`, where reading its partial/empty directory
    // could fail expire mid-sweep; its new files are protected by the
    // committed predecessor and reclaimed by vacuum/breakClaim
    // (ADVICE r14 low).
    val all = f.listStatus(new Path(s"$root/manifests")).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("m") && p.getName.drop(1).forall(_.isDigit) &&
        f.exists(new Path(p, "_SUCCESS")))
    val (dropped, kept) = all.partition { p =>
      val id = p.getName.drop(1).toLong
      id < keepFrom && !pinned(id)
    }
    if (dropped.isEmpty) return
    // reference counting at BOTH levels of the list shape: a manifest
    // FILE survives while any kept list names it; a data file survives
    // while any kept manifest file names it. Both diffs are O(metadata)
    val mpathsOf = (ms: Seq[Path]) =>
      ms.flatMap(p => listOf(s, root, p.getName.drop(1).toLong)).toSet
    // staged-branch lists keep referencing manifest files too (their
    // bases are pinned above, but a staged list can also reuse files
    // of snapshots BETWEEN the base and the horizon)
    val keptM = mpathsOf(kept) ++
      branchListRoots(s, root).flatMap(d =>
        s.read.parquet(d).select("mpath").collect().map(_.getString(0)))
    val deadM = mpathsOf(dropped) -- keptM
    if (deadM.nonEmpty) {
      val dPaths = s.read.option("mergeSchema", "true")
        .parquet(deadM.toIndexedSeq: _*).select("path")
      val orphans = (if (keptM.isEmpty) dPaths.distinct()
        else dPaths.except(s.read.option("mergeSchema", "true")
          .parquet(keptM.toIndexedSeq: _*).select("path")))
        .collect().map(_.getString(0))
      orphans.foreach(p => f.delete(new Path(p), false))
      deadM.foreach(p => f.delete(new Path(p), true))
    }
    dropped.foreach { p =>
      val id = p.getName.drop(1).toLong
      f.delete(p, true)
      f.delete(new Path(s"$root/manifests/s$id.json"), false)
      f.delete(new Path(s"$root/manifests/i$id.json"), false)
      f.delete(new Path(s"$root/manifests/t$id"), false)
      f.delete(claimPath(root, id), false)
    }
  }

  // ---- INSPECTION: the metadata tables an operator reads ------------

  /** `snapshots` metadata table — one row per ADDRESSABLE snapshot:
    * (snapshot_id, committed_at_ms, n_data_files, n_rows,
    * n_delete_files, n_delete_rows). The inspection surface a real
    * table format exposes (Iceberg's `db.tbl.snapshots`), here a
    * library call. Driver cost is O(#snapshots) manifest-list reads —
    * metadata scale; expired ids are simply absent.
    */
  def metaSnapshots(s: SparkSession, root: String): DataFrame = {
    import s.implicits._
    val f = fs(s, root)
    val cur = currentSnapshot(s, root)
    (1L to cur).flatMap { k =>
      if (!f.exists(new Path(s"$root/manifests/m$k/_SUCCESS"))) None
      else {
        val (_, rowsArr) = manifestRowsOf(s, root, k)
        val dat = rowsArr.filter(_.getAs[String]("kind") == "data")
        val del = rowsArr.filterNot(_.getAs[String]("kind") == "data")
        Some((k, commitTimeOf(s, root, k), dat.length.toLong,
          dat.map(_.getAs[Long]("n_rows")).sum, del.length.toLong,
          del.map(_.getAs[Long]("n_rows")).sum))
      }
    }.toDF("snapshot_id", "committed_at_ms", "n_data_files", "n_rows",
      "n_delete_files", "n_delete_rows")
  }

  /** `files` metadata table — manifest k with its kind column
    * normalized: what an operator reads to see file sizes-in-rows,
    * stats spans, and live delete files before planning a compaction.
    */
  def metaFiles(s: SparkSession, root: String, k: Long): DataFrame =
    withKind(manifest(s, root, k))

  /** `refs` metadata table — (name, snapshot_id) per tag. */
  def metaRefs(s: SparkSession, root: String): DataFrame = {
    val s2 = s
    import s2.implicits._
    tags(s, root).toSeq.toDF("name", "snapshot_id")
  }

  // ---- NAMED REFS: tags over snapshot ids ---------------------------

  private def tagPath(root: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9._\\-]+"), s"invalid tag name: $name")
    new Path(s"$root/refs/$name")
  }

  /** TAG snapshot k under `name` — a durable, human-meaningful name a
    * reader resolves instead of a raw id ("the validated training
    * corpus", "audit-2026-08"). A tiny metadata file; re-tagging the
    * same name retargets it (last write wins — tags name HISTORY, they
    * are not a concurrency primitive). A tagged snapshot is PINNED
    * across [[expire]] horizons until the tag is dropped.
    */
  def tag(s: SparkSession, root: String, name: String, k: Long): Unit = {
    require(k >= 1 && k <= currentSnapshot(s, root),
      s"tag($name → $k): snapshot must be committed")
    require(fs(s, root).exists(new Path(s"$root/manifests/m$k/_SUCCESS")),
      s"tag($name → $k): snapshot $k is not addressable (expired or torn)")
    val out = fs(s, root).create(tagPath(root, name), true)
    try out.write(k.toString.getBytes("UTF-8")) finally out.close()
  }

  def dropTag(s: SparkSession, root: String, name: String): Unit =
    fs(s, root).delete(tagPath(root, name), false)

  /** Every tag of the store: name → snapshot id. O(#tags) metadata. */
  def tags(s: SparkSession, root: String): Map[String, Long] = {
    val f = fs(s, root)
    val dir = new Path(s"$root/refs")
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).toSeq.flatMap { st =>
      readSidecar(s, st.getPath).flatMap(_.trim.toLongOption)
        .map(st.getPath.getName -> _)
    }.toMap
  }

  def resolveTag(s: SparkSession, root: String, name: String): Long =
    tags(s, root).getOrElse(name,
      throw new IllegalArgumentException(s"unknown tag: $name"))

  /** The table as of the tagged snapshot. */
  def readTag(s: SparkSession, root: String, name: String): DataFrame =
    readSnapshot(s, root, resolveTag(s, root, name))

  // ---- WRITABLE BRANCHES: write-audit-publish ------------------------
  //
  // A branch stages APPEND commits invisibly to main readers, then
  // publishes them atomically — the WAP (write-audit-publish) pattern a
  // production ingest runs: land the day's crawl on `audit`, run the
  // quality gates against the branch, fast-forward main only when they
  // pass. Shape: the branch head is a per-branch commit sequence
  // (`manifests/b_<name>_<j>`, its own claim CAS), each branch commit a
  // manifest LIST = the previous branch list + one new manifest file —
  // the same incremental-manifest economics as main. Staged rows carry
  // commit ids in a reserved high band (BranchCidBase + j), so (a) main
  // deletes committed while the branch was staged never kill staged
  // rows (sequence rule: staged cid > every main dcid), matching WAP
  // visibility — staged rows did not exist for those deletes — and (b)
  // no field-id sidecar collision is possible. [[fastForward]]
  // re-stamps the staged manifest rows under the PUBLISH commit id (an
  // O(|staged files|) metadata rewrite, data immutable), so append-only
  // diff/change-feed semantics see the published rows exactly once, at
  // publish. Only appends stage on a branch — audit gates read, they
  // do not mutate; a failed audit drops the branch and [[vacuum]]
  // reclaims its files.

  /** Staged branch rows' commit-id band — above any realistic main
    * commit id, below the Long.MaxValue sentinels.
    */
  private[graft] val BranchCidBase = 1L << 40

  private def branchHeadPath(root: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9.\\-]+"),
      s"invalid branch name: $name (letters, digits, dot, dash)")
    new Path(s"$root/heads/$name")
  }

  private def branchListDir(root: String, name: String, j: Long): String =
    s"$root/manifests/b_${name}_$j"

  /** CREATE a branch at snapshot k — one tiny head file recording the
    * base. Refuses to clobber a live branch.
    */
  def createBranch(s: SparkSession, root: String, name: String, k: Long): Unit = {
    require(k >= 1 && k <= currentSnapshot(s, root),
      s"createBranch($name @ $k): snapshot must be committed")
    val p = branchHeadPath(root, name)
    val f = fs(s, root)
    require(!f.exists(p), s"branch $name already exists")
    val out = f.create(p, false)
    try out.write(k.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The branch's base snapshot (where it forked from main). */
  def branchBase(s: SparkSession, root: String, name: String): Long =
    readSidecar(s, branchHeadPath(root, name))
      .flatMap(_.trim.toLongOption)
      .getOrElse(throw new IllegalArgumentException(s"unknown branch: $name"))

  /** The branch's committed sequence head (0 = no staged commits). */
  private[graft] def branchSeq(s: SparkSession, root: String, name: String): Long = {
    val f = fs(s, root)
    val mdir = new Path(s"$root/manifests")
    if (!f.exists(mdir)) return 0L
    val prefix = s"b_${name}_"
    f.listStatus(mdir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(prefix) &&
        p.getName.drop(prefix.length).forall(_.isDigit) &&
        f.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(prefix.length).toLong)
      .foldLeft(0L)(math.max)
  }

  /** Every live branch: name → (base snapshot, staged commit count). */
  def branches(s: SparkSession, root: String): Map[String, (Long, Long)] = {
    val f = fs(s, root)
    val dir = new Path(s"$root/heads")
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      readSidecar(s, st.getPath).flatMap(_.trim.toLongOption)
        .map(base => name -> (base, branchSeq(s, root, name)))
    }.toMap
  }

  /** The branch head's manifest LIST: the base snapshot's list plus
    * every staged commit's manifest file.
    */
  private[graft] def branchList(s: SparkSession, root: String,
      name: String): Seq[String] = {
    val j = branchSeq(s, root, name)
    if (j == 0L) listOf(s, root, branchBase(s, root, name))
    else s.read.parquet(branchListDir(root, name, j))
      .select("mpath").collect().map(_.getString(0)).toIndexedSeq
  }

  /** STAGE an append on the branch — same protocol as main
    * ([[append]]): data files land once under a token-unique dir, the
    * branch's claim CAS arbitrates concurrent stagers, losers rebase
    * on the winner's branch list and retry. Invisible to every main
    * reader until [[fastForward]]. Returns the branch sequence number.
    */
  def appendBranch(s: SparkSession, root: String, name: String,
      df: DataFrame): Long = {
    val base = branchBase(s, root, name) // fails fast on unknown branch
    val added = writeDataFiles(s, root, df)
    val f = fs(s, root)
    var attempts = 0
    while (attempts < 64) {
      val j = branchSeq(s, root, name) + 1
      val prevList =
        if (j == 1L) listOf(s, root, base) else branchList(s, root, name)
      val mf = writeManifestFile(s, root,
        manifestRows(s, added, BranchCidBase + j))
      val claim = new Path(s"$root/manifests/claimb_${name}_$j")
      if (tryClaimAt(s, root, claim)) {
        import s.implicits._
        (prevList :+ mf).toDF("mpath").coalesce(1).write
          .mode("overwrite").parquet(branchListDir(root, name, j))
        // the staged schema rides a sidecar so publish can merge it
        val out = f.create(new Path(s"$root/manifests/bs_${name}_$j.json"), true)
        try out.write(mergedSchema(
            if (j == 1L) tableSchema(s, root, base)
            else readBranchSchema(s, root, name, j - 1L)
              .getOrElse(tableSchema(s, root, base)),
            df.schema).json.getBytes("UTF-8"))
        finally out.close()
        return j
      }
      // lost the race: wait for the winner's list, rebase, retry
      val marker = new Path(s"${branchListDir(root, name, j)}/_SUCCESS")
      // same conf-read as [[awaitCommit]] — one knob for both paths
      val waitMs = s.conf.getOption(ClaimWaitKey).map(_.toLong).getOrElse(60000L)
      val deadline = System.nanoTime() + waitMs * 1000000L
      while (!f.exists(marker)) {
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"branch commit $name/$j is claimed but never landed — " +
              s"verify no stager is alive, then delete claimb_${name}_$j")
        Thread.sleep(20L)
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"appendBranch($name) lost $attempts consecutive claim races")
  }

  private def readBranchSchema(s: SparkSession, root: String, name: String,
      j: Long): Option[StructType] =
    readSidecar(s, new Path(s"$root/manifests/bs_${name}_$j.json"))
      .map(DataType.fromJson(_).asInstanceOf[StructType])

  /** Read the BRANCH HEAD — base rows plus every staged append, under
    * the base snapshot's delete files (staged rows postdate them, so
    * they are never killed — WAP visibility).
    */
  def readBranch(s: SparkSession, root: String, name: String): DataFrame = {
    val base = branchBase(s, root, name)
    val mpaths = branchList(s, root, name)
    if (mpaths.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        tableSchema(s, root, base))
    val rows = withKind(s.read.option("mergeSchema", "true").parquet(mpaths: _*))
      .select("path", "commit_id", "kind", "n_rows").collect()
    val dat = rows.filter(_.getAs[String]("kind") == "data")
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq
    val del = rows.filter(_.getAs[String]("kind") == "delete")
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("commit_id"))).toIndexedSeq
    val pos = rows.filter(_.getAs[String]("kind") == "posdelete")
    readWithDeletes(s, root, base, dat, del,
      pos.map(_.getAs[String]("path")).toIndexedSeq,
      rows.filter(_.getAs[String]("kind") == "delete")
        .map(_.getAs[Long]("n_rows")).sum,
      pos.map(_.getAs[Long]("n_rows")).sum)
  }

  /** PUBLISH the branch to main — the audit passed. Commits
    * `main current + 1` through the ordinary claim CAS with the
    * branch's staged manifest rows RE-STAMPED under the publish commit
    * id (one O(|staged files|) manifest file; data files move nowhere).
    * Because branches stage only appends, the publish composes with
    * ANY main commits that landed while the branch was open (the
    * append-only rebase: main's current list + the staged delta) —
    * a true fast-forward when main never moved, a rebase otherwise.
    * The branch stays live (re-publish is a no-op only if nothing new
    * staged — callers normally [[dropBranch]] after). Returns the new
    * main snapshot id.
    */
  def fastForward(s: SparkSession, root: String, name: String): Long = {
    val base = branchBase(s, root, name)
    val baseList = listOf(s, root, base).toSet
    val staged = branchList(s, root, name).filterNot(baseList)
    require(staged.nonEmpty, s"fastForward($name): nothing staged")
    val stagedRows = s.read.option("mergeSchema", "true")
      .parquet(staged: _*).drop("mpath")
    val branchSchema = readBranchSchema(s, root, name,
      branchSeq(s, root, name)).getOrElse(tableSchema(s, root, base))
    // IDEMPOTENCE: if every staged data file is already in main's
    // manifest, this staged set was published by an earlier call that
    // crashed before consuming the branch — finish the cleanup, never
    // re-publish (which would double every staged row)
    val stagedPaths = stagedRows.select("path").collect()
      .map(_.getString(0)).toSet
    val cur = currentSnapshot(s, root)
    val mainPaths = manifestRowsOf(s, root, cur)._2
      .filter(_.getAs[String]("kind") == "data")
      .map(_.getAs[String]("path")).toSet
    val k =
      if (stagedPaths.subsetOf(mainPaths)) cur
      else commitRetry(s, root) { prev =>
        val kk = prev + 1
        val mf = writeManifestFile(s, root,
          stagedRows.withColumn("commit_id", lit(kk)))
        (listOf(s, root, prev) :+ mf,
          mergedSchema(tableSchema(s, root, prev), branchSchema))
      }
    // CONSUME the published staging: the branch ref survives, now
    // based at the publish commit with zero staged work — the next
    // appendBranch stages fresh, the next fastForward publishes ONLY
    // it. The staged lists become orphans (vacuum reclaims; the data
    // files live on under main's re-stamped manifest).
    val f = fs(s, root)
    val mdir = new Path(s"$root/manifests")
    val pats = Seq(s"b_${name}_", s"claimb_${name}_", s"bs_${name}_")
    f.listStatus(mdir).toSeq.map(_.getPath)
      .filter(p => pats.exists(p.getName.startsWith))
      .foreach(p => f.delete(p, true))
    val out = f.create(branchHeadPath(root, name), true)
    try out.write(k.toString.getBytes("UTF-8")) finally out.close()
    k
  }

  /** DROP the branch: head, staged lists, schema sidecars, claims.
    * The staged manifest/data files become unreferenced; [[vacuum]]
    * reclaims them behind its age floor.
    */
  def dropBranch(s: SparkSession, root: String, name: String): Unit = {
    val f = fs(s, root)
    f.delete(branchHeadPath(root, name), false)
    val mdir = new Path(s"$root/manifests")
    if (!f.exists(mdir)) return
    val pats = Seq(s"b_${name}_", s"claimb_${name}_", s"bs_${name}_")
    f.listStatus(mdir).toSeq.map(_.getPath)
      .filter(p => pats.exists(p.getName.startsWith))
      .foreach(p => f.delete(p, true))
  }

  /** Committed branch manifest LISTS across all branches — the extra
    * reference roots [[vacuum]] and [[expire]] must honor so a staged
    * branch's files survive maintenance.
    */
  private def branchListRoots(s: SparkSession, root: String): Seq[String] = {
    val f = fs(s, root)
    branches(s, root).keys.toSeq.flatMap { name =>
      val j = branchSeq(s, root, name)
      if (j == 0L) Nil
      else Some(branchListDir(root, name, j))
        .filter(d => f.exists(new Path(s"$d/_SUCCESS")))
    }
  }

  // ---- the Z-CLUSTERED snapshot table (q227): 2-D stats pruning -----

  /** Z-store layout version (2: manifest-list shape). */
  private val ZsLayout = 2L

  private[graft] def zsRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapz")

  /** Files per Z-clustered commit — finer than [[CommitFiles]] so the
    * 2-D skipping is observable at fixture scale; production sizes
    * this as commit_bytes / target_file_bytes exactly as the 1-D path.
    */
  val ZCommitFiles = 8

  /** APPEND with Z-ORDER clustering — the `OPTIMIZE ZORDER BY` write
    * path fused into the commit: rows are laid out along the Morton
    * interleave of (doc_id, n_chars) 16×16 grid coordinates (grid
    * normalized by the COMMIT's own min/max — deterministic in the
    * input, no global state), so every file covers a bounded range in
    * BOTH dimensions, and the manifest carries both dimensions'
    * per-file (min,max). q170 measured this layout's pruning through
    * simulated zone maps; here the table format MAINTAINS it: a
    * conjunctive predicate prunes the FILE LIST on both intervals at
    * plan time ([[readRange2D]]), where the 1-D range-clustered store
    * can prune on doc_id alone. Same commit protocol (claim CAS,
    * manifest-last, schema sidecar) — clustering is a property of the
    * WRITE, invisible to the protocol.
    */
  /** Write one Z-ORDERED commit attempt's data files and return their
    * 2-D stats — the shared write path of [[appendZ]] and [[compactZ]]
    * (clustering is a property of the WRITE; the commit protocol never
    * sees it). Grid normalized by the INPUT's own min/max —
    * deterministic, no global state.
    */
  private def writeZDataFiles(s: SparkSession, root: String,
      df: DataFrame): Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/c$token"
    val dom = df.agg(
      min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long"),
      min(col("n_chars")).cast("long"), max(col("n_chars")).cast("long")).head()
    val (i0, i1, c0, c1) = (dom.getLong(0), dom.getLong(1),
      dom.getLong(2), dom.getLong(3))
    def grid(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      least(lit(15L), floor(((c.cast("long") - lo) * 16L) /
        lit(math.max(1L, hi - lo + 1L))).cast("long"))
    val gu = grid(col("doc_id"), i0, i1)
    val gc = grid(col("n_chars"), c0, c1)
    // 4-bit × 4-bit Morton interleave (the q170 bit pattern, one level deeper)
    val zval = (shiftright(gu, 3) % 2) * 128 + (shiftright(gc, 3) % 2) * 64 +
      (shiftright(gu, 2) % 2) * 32 + (shiftright(gc, 2) % 2) * 16 +
      (shiftright(gu, 1) % 2) * 8 + (shiftright(gc, 1) % 2) * 4 +
      (gu % 2) * 2 + (gc % 2)
    df.withColumn("__graft_z", zval)
      .repartitionByRange(ZCommitFiles, col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(dataDir)
    val f = fs(s, root)
    val files = f.listStatus(new Path(dataDir)).toSeq
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    files.flatMap { p =>
      val st = s.read.parquet(p).agg(count(lit(1)).cast("long"),
        min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long"),
        min(col("n_chars")).cast("long"), max(col("n_chars")).cast("long"),
        count(col("doc_id")).cast("long")).head()
      if (st.getLong(0) == 0L) { f.delete(new Path(p), false); None }
      else Some((p, st.getLong(0), st.getLong(1), st.getLong(2),
        st.getLong(3), st.getLong(4), st.getLong(0) - st.getLong(5)))
    }
  }

  private def zManifestRows(s: SparkSession,
      stats: Seq[(String, Long, Long, Long, Long, Long, Long)], k: Long): DataFrame = {
    import s.implicits._
    stats.map { case (p, n, a, b, c, d, nn) =>
        (p, k, n, a, b, c, d, nn, fileLenOf(s, p)) }
      .toDF("path", "commit_id", "n_rows", "min_id", "max_id",
        "min_chars", "max_chars", "n_nulls", "n_bytes")
  }

  def appendZ(s: SparkSession, root: String, df: DataFrame): Long = {
    val stats = writeZDataFiles(s, root, df)
    commitRetry(s, root) { prev =>
      (listOf(s, root, prev) :+
        writeManifestFile(s, root, zManifestRows(s, stats, prev + 1)),
        mergedSchema(tableSchema(s, root, prev), df.schema))
    }
  }

  /** True iff snapshot k's manifest carries the 2-D stats — the mark
    * of a Z-clustered store, which [[compact]] must not flatten.
    */
  private def isZStore(s: SparkSession, root: String, k: Long): Boolean =
    k > 0 && manifestRowsOf(s, root, k)._1.fieldNames.contains("min_chars")

  /** Z-PRESERVING COMPACTION: the current snapshot rewritten ALONG THE
    * SAME MORTON INTERLEAVE, both dimensions' stats re-recorded — so
    * small files merge without degrading [[readRange2D]]'s 2-D pruning
    * back to the 1-D layout (the r14 gap: plain [[compact]] routed
    * through the doc_id range writer and silently destroyed the Z
    * layout). Re-laying the WHOLE snapshot through one interleave can
    * only tighten the per-file boxes relative to per-commit grids
    * (spec pins fraction preserved-or-improved).
    */
  def compactZ(s: SparkSession, root: String): Long =
    commitRetry(s, root) { prev =>
      require(prev > 0, "compactZ on an empty table")
      val stats = writeZDataFiles(s, root, readSnapshot(s, root, prev))
      (Seq(writeManifestFile(s, root, zManifestRows(s, stats, prev + 1))),
        tableSchema(s, root, prev))
    }

  /** 2-D MANIFEST-PRUNED READ: rows with doc_id ∈ [iLo, iHi] AND
    * n_chars ∈ [cLo, cHi], scanning only files whose manifest stats
    * intersect BOTH intervals — the read the Z layout exists for.
    */
  def readRange2D(s: SparkSession, root: String, k: Long,
      iLo: Long, iHi: Long, cLo: Long, cHi: Long): DataFrame = {
    // NULL char-stats = the OPEN interval, never a prune: a mixed
    // store (a plain append or a 1-D maintenance rewrite landing on a
    // Z table) records no n_chars bounds for those files — they must
    // still scan, or their rows silently vanish from 2-D reads
    val paths = {
      val (_, rows) = manifestRowsOf(s, root, k)
      def lv(r: org.apache.spark.sql.Row, f: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))
      // driver-side mirror of the old SQL filter, NULL-for-NULL: a null
      // id bound drops the row (SQL null predicate), null char stats =
      // the open interval
      rows.filter { r =>
        lv(r, "max_id").exists(_ >= iLo) && lv(r, "min_id").exists(_ <= iHi) &&
          (lv(r, "min_chars").isEmpty ||
            (lv(r, "max_chars").exists(_ >= cLo) && lv(r, "min_chars").exists(_ <= cHi)))
      }.map(_.getAs[String]("path")).toIndexedSeq
    }
    if (paths.isEmpty) return readSnapshot(s, root, k).filter(lit(false))
    s.read.option("mergeSchema", "true").parquet(paths: _*)
      .filter(col("doc_id").between(iLo, iHi) &&
        col("n_chars").between(cLo, cHi))
  }

  private val zsBuiltCache = new graft.SessionCache

  /** Seed the Z-clustered fixture table: the q203 two-commit split,
    * each commit Z-ordered on (doc_id, n_chars).
    */
  def ensureZ(s: SparkSession, dir: String): String = {
    zsBuiltCache.getOrElseUpdate(s, dir) {
      val root = zsRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + ZsLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        appendZ(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        appendZ(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    zsRoot(dir)
  }

  /** The q227 predicate windows — integer constants mirrored verbatim
    * by the oracle; chosen inside every gate SF's domain so both
    * intervals are selective.
    */
  val ZIdLo = 100L; val ZIdHi = 400L
  val ZChLo = 150L; val ZChHi = 350L

  /** q227: the CONJUNCTIVE 2-D range read over the Z-clustered table —
    * both predicate dimensions prune the file list from the manifest's
    * 2-D stats before Spark sees a path (SnapshotStoreSpec proves the
    * Z store scans strictly fewer files for this conjunction than the
    * 1-D range-clustered store at equal file counts — the q170
    * experiment, graduated from simulated zone maps to a real layout
    * the format maintains at every commit). Oracle = the verbatim
    * two-interval predicate on the raw table.
    */
  val q227SnapshotZRead: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureZ(s, dir)
    readRange2D(s, root, currentSnapshot(s, root), ZIdLo, ZIdHi, ZChLo, ZChHi)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q230: the DSv2 SQL READ — the q206 range predicate expressed as
    * PLAIN SQL over `spark.read.format("graft.sources
    * .SnapshotTableSource")`, where the connector (not the caller)
    * prunes the file list from the manifest stats and consumes the
    * pushed range (SnapshotTableSourceSpec pins the pruned file count
    * and the filter leaving the plan). Oracle = q206's raw-table
    * BETWEEN.
    */
  val q230SnapshotSqlRead: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    val v = s"graft_snap_sql_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView(v)
    s.sql(
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
         |FROM $v WHERE doc_id BETWEEN 100 AND 250
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** q231: the DSv2 SQL read of the Z-CLUSTERED store — q227's 2-D
    * conjunction as plain SQL; the connector prunes on BOTH manifest
    * dimensions (`min_chars`/`max_chars` ride the same pushdown).
    * Oracle = q227's.
    */
  val q231SnapshotSqlZRead: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureZ(s, dir)
    val v = s"graft_snap_sqlz_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView(v)
    s.sql(
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
         |FROM $v WHERE doc_id BETWEEN $ZIdLo AND $ZIdHi
         |  AND n_chars BETWEEN $ZChLo AND $ZChHi
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** q232: METADATA-ONLY aggregates — a global `COUNT(*) / MIN / MAX`
    * over the snapshot table answered ENTIRELY from the manifest's
    * per-file stats by the connector's `SupportsPushDownAggregates`
    * (SnapshotTableSourceSpec pins zero planned data files). At 100 TB
    * this is the difference between a metadata fold and a full scan.
    * Oracle = the same aggregates over the raw table.
    */
  val q232SnapshotSqlAgg: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    val v = s"graft_snap_agg_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView(v)
    s.sql(
      s"""SELECT count(*) AS n_docs, min(doc_id) AS min_doc,
         |  max(doc_id) AS max_doc FROM $v""".stripMargin)
  }

  /** q235: a NAMED REF read as plain SQL — the `initial-load` tag is
    * (re)pointed at snapshot 1 (idempotent metadata write), and the
    * connector's `tag` option resolves it; the consumer addresses
    * "the corpus we validated" by NAME, never a raw snapshot id.
    * Oracle = snapshot 1's closed form (q203's).
    */
  val q235SnapshotTagRead: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    tag(s, root, "initial-load", 1L)
    val v = s"graft_snap_tag_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).option("tag", "initial-load")
      .load().createOrReplaceTempView(v)
    s.sql(
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
         |FROM $v GROUP BY lang ORDER BY lang""".stripMargin)
  }

  // ---- the CATEGORY-CLUSTERED snapshot table (q233): string stats ---

  private[graft] def lsRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapl")

  private val LsLayout = 1L

  /** Files per category-clustered commit — finer than [[CommitFiles]]
    * so the categorical skipping is observable at fixture scale.
    */
  val CatCommitFiles = 8

  /** APPEND clustered by a CATEGORICAL column — the write path that
    * makes point predicates on a low-cardinality STRING column (lang,
    * source, tenant) file-prunable. Rows are range-laid on
    * (cat, doc_id), so each file covers a contiguous slice of the
    * category domain, and the manifest records the clustering column's
    * per-file string (min, max) ALONGSIDE the doc_id stats — the
    * per-column value-bounds idea real table formats keep for every
    * column, here restricted to the one column the writer declared
    * worth clustering on. `WHERE lang = 'de'` then prunes the file
    * list at plan time exactly like a doc_id range does ([[readCat]],
    * and the DSv2 connector pushes the same equality), where the plain
    * store would scan every file. A file of all-null category values
    * records null bounds and is never pruned (the open-interval rule).
    * Same claim-CAS commit protocol — clustering is a property of the
    * WRITE.
    */
  def appendClustered(s: SparkSession, root: String, df: DataFrame,
      by: String): Long = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/c$token"
    df.repartitionByRange(CatCommitFiles, col(by), col("doc_id"))
      .write.mode("overwrite").parquet(dataDir)
    val f = fs(s, root)
    val files = f.listStatus(new Path(dataDir)).toSeq
      .map(_.getPath.toString).filter(_.endsWith(".parquet"))
    val stats = files.flatMap { p =>
      val st = s.read.parquet(p).agg(count(lit(1)).cast("long"),
        min(col("doc_id")).cast("long"), max(col("doc_id")).cast("long"),
        min(col(by)).cast("string"), max(col(by)).cast("string")).head()
      if (st.getLong(0) == 0L) { f.delete(new Path(p), false); None }
      else Some((p, st.getLong(0),
        if (st.isNullAt(1)) Long.MinValue else st.getLong(1),
        if (st.isNullAt(1)) Long.MaxValue else st.getLong(2),
        Option(st.getString(3)), Option(st.getString(4))))
    }
    commitRetry(s, root) { prev =>
      import s.implicits._
      val m = stats.map { case (p, n, a, b, lo, hi) =>
        (p, prev + 1, n, a, b, by, lo, hi, fileLenOf(s, p))
      }.toDF("path", "commit_id", "n_rows", "min_id", "max_id",
        "cat_col", "min_cat", "max_cat", "n_bytes")
      (listOf(s, root, prev) :+ writeManifestFile(s, root, m),
        mergedSchema(tableSchema(s, root, prev), df.schema))
    }
  }

  /** The category-clustered store's declared clustering column at
    * snapshot k, if any — how a reader (and the DSv2 connector)
    * discovers which string equality is file-prunable.
    */
  private[graft] def catColOf(s: SparkSession, root: String, k: Long): Option[String] = {
    if (k <= 0) return None
    val (schema, rows) = manifestRowsOf(s, root, k)
    if (!schema.fieldNames.contains("cat_col") ||
      !schema.fieldNames.contains("min_cat")) None
    else rows.find(r => !r.isNullAt(r.fieldIndex("cat_col")))
      .map(_.getAs[String]("cat_col"))
  }

  /** CATEGORY-PRUNED READ: rows with cat = value, scanning only files
    * whose manifest string bounds contain the value (null bounds = the
    * open interval, never pruned) — the categorical twin of
    * [[readRange]].
    */
  def readCat(s: SparkSession, root: String, k: Long, value: String): DataFrame = {
    val by = catColOf(s, root, k).getOrElse(
      throw new IllegalArgumentException(s"$root@$k is not category-clustered"))
    val paths = {
      val (_, rows) = manifestRowsOf(s, root, k)
      def sv(r: org.apache.spark.sql.Row, f: String): Option[String] =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[String](f))
      rows.filter(r => sv(r, "min_cat").isEmpty ||
          (sv(r, "max_cat").exists(_ >= value) && sv(r, "min_cat").exists(_ <= value)))
        .map(_.getAs[String]("path")).toIndexedSeq
    }
    if (paths.isEmpty) return readSnapshot(s, root, k).filter(lit(false))
    s.read.option("mergeSchema", "true").parquet(paths: _*)
      .filter(col(by) === value)
  }

  // ---- BUCKET-CLUSTERED commits (storage-partitioned joins) ----------

  /** Buckets per bucketed commit — small enough that local[32] tests
    * exercise multi-file groups, large enough to show key-grouped
    * parallelism; a cluster deployment picks its own width per table.
    */
  val BkBuckets = 8

  /** BUCKET-CLUSTERED APPEND: every data file of the commit holds
    * exactly ONE bucket of the key domain — bucket = floorMod(key, n),
    * null keys ride bucket 0 — and each file's manifest row records
    * (bucket_id, bucket_n, bucket_col) alongside the usual stats. This
    * is the physical contract behind STORAGE-PARTITIONED JOINS: two
    * stores bucketed the same way join with ZERO shuffle on either
    * side, because the DSv2 scan reports `KeyGroupedPartitioning` over
    * the bucket transform and Spark aligns co-bucketed partitions
    * directly (the v2 analog of Hive-bucketed joins; at 100 TB the
    * difference between a metadata-aligned join and re-shuffling both
    * fact tables every query). The bucket function is deliberately
    * hash-free — `floorMod(key, n)` — so any engine (including the
    * correctness oracle) reproduces it in pure SQL, and the catalog's
    * V2 `bucket` function ([[GraftBucketFunction]]) evaluates the SAME
    * arithmetic for Spark's transform-compatibility checks. Same
    * claim-CAS commit protocol: bucketing is a property of the WRITE,
    * re-verified per-file at plan time (any non-bucketed commit makes
    * the store read as unpartitioned — a layout CLAIM never overrides
    * what the files actually hold).
    */
  def appendBucketed(s: SparkSession, root: String, df: DataFrame,
      nBuckets: Int = BkBuckets, by: String = "doc_id"): Long = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val stats = writeBucketedDataFiles(s, root, df, nBuckets, by)
    commitRetry(s, root) { prev =>
      (listOf(s, root, prev) :+ writeManifestFile(s, root,
        bucketedManifestRows(s, stats, prev + 1, nBuckets, by)),
        mergedSchema(tableSchema(s, root, prev), df.schema))
    }
  }

  /** Write one commit attempt's bucket-split data files: one file per
    * `floorMod(key, n)` bucket actually present (partitionBy splits
    * output by bucket value even when the task-level repartition
    * collides buckets into one task, so one-file-one-bucket never
    * rides hash placement). Returns per-file
    * (path, n_rows, min_id, max_id, n_nulls, bucket).
    */
  private def writeBucketedDataFiles(s: SparkSession, root: String,
      df: DataFrame, nBuckets: Int, by: String):
      Seq[(String, Long, Long, Long, Long, Int)] = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/b$token"
    df.withColumn("__gbucket",
        pmod(coalesce(col(by), lit(0L)), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("__gbucket"))
      .write.mode("overwrite").partitionBy("__gbucket").parquet(dataDir)
    val f = fs(s, root)
    val files = f.listStatus(new Path(dataDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__gbucket="))
      .flatMap { d =>
        val b = d.getPath.getName.stripPrefix("__gbucket=").toInt
        f.listStatus(d.getPath).toSeq.map(_.getPath.toString)
          .filter(_.endsWith(".parquet")).map(p => (b, p))
      }
    // per-file stats in ONE job, grouped by input_file_name — a
    // production bucket width (hundreds to thousands) must not become
    // that many driver-sequential jobs. Manifest paths stay the
    // listStatus strings (what vacuum's reference set compares
    // against); the URI-normalized path only keys the join here.
    val statByPath: Map[String, (Long, Option[Long], Option[Long], Long)] =
      s.read.parquet(dataDir)
        .groupBy(input_file_name().as("p"))
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("doc_id")).cast("long").as("mn"),
          max(col("doc_id")).cast("long").as("mx"),
          count(col("doc_id")).cast("long").as("nid"))
        .collect().map { r =>
          new Path(r.getString(0)).toUri.getPath ->
            ((r.getLong(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2)),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              r.getLong(4)))
        }.toMap
    files.flatMap { case (b, p) =>
      statByPath.get(new Path(p).toUri.getPath) match {
        case None => // a zero-row part file — drop it
          f.delete(new Path(p), false); None
        case Some((n, mn, mx, nid)) => Some((p, n,
          mn.getOrElse(Long.MinValue), mx.getOrElse(Long.MaxValue),
          n - nid, b))
      }
    }
  }

  /** Manifest rows for bucket-split files — the (bucket_id, bucket_n,
    * bucket_col) triple next to the usual stats.
    */
  private def bucketedManifestRows(s: SparkSession,
      stats: Seq[(String, Long, Long, Long, Long, Int)], k: Long,
      nBuckets: Int, by: String): DataFrame = {
    import s.implicits._
    stats.map { case (p, n, lo, hi, nn, bkt) =>
      (p, k, n, lo, hi, nn, bkt, nBuckets, by, fileLenOf(s, p))
    }.toDF("path", "commit_id", "n_rows", "min_id", "max_id", "n_nulls",
      "bucket_id", "bucket_n", "bucket_col", "n_bytes")
  }

  /** BUCKET-PRESERVING COMPACTION: the current snapshot rewritten as
    * one file per bucket ALONG THE SAME floorMod layout, bucket ids
    * re-recorded — so maintenance never silently voids the layout a
    * storage-partitioned join depends on. [[compact]] delegates here
    * on bucketed stores.
    */
  def compactBucketed(s: SparkSession, root: String): Long = {
    val (n, by) = bucketSpecOf(s, root, currentSnapshot(s, root))
      .getOrElse(throw new IllegalArgumentException(
        s"$root is not bucket-clustered"))
    commitRetry(s, root) { prev =>
      require(prev > 0, "compactBucketed on an empty table")
      val stats = writeBucketedDataFiles(s, root,
        readSnapshot(s, root, prev), n, by)
      (Seq(writeManifestFile(s, root,
        bucketedManifestRows(s, stats, prev + 1, n, by))),
        tableSchema(s, root, prev))
    }
  }

  // ---- IDENTITY-PARTITIONED commits (hidden partitioning) -----------

  /** IDENTITY-PARTITIONED APPEND: every data file of the commit holds
    * exactly ONE value of a string partition column (`lang`, a date
    * bucket, a source) — the hive/Iceberg identity-partition layout —
    * and each file's manifest row records (part_col, part_val). The
    * DSv2 scan then reports `KeyGroupedPartitioning(identity(col))`,
    * which needs NO function catalog to resolve, so GROUP BY and joins
    * on the partition column skip their exchanges through ANY read
    * route (catalog tables and plain `format().load()` views alike) —
    * at 100 TB, a per-partition rollup over a date-partitioned corpus
    * becomes map-side-only. NULL partition values are refused loudly:
    * a null key group would be indistinguishable in the manifest from
    * "no layout claim", and identity-partition columns (dates,
    * languages, sources) are non-null by construction in any real
    * corpus. Same claim-CAS protocol; the claim is re-verified per
    * file at plan time like every other layout.
    */
  def appendPartitioned(s: SparkSession, root: String, df: DataFrame,
      by: String): Long = {
    // STRING or LONG partition columns: the manifest carries the value
    // canonically as a string; the SCAN re-types the key-group rows
    // from the table schema so storage-partitioned joins and GROUP BY
    // elision see the column's exact type (VERDICT r15 what's-missing
    // 5 — typed identity partitioning). Fractional/exotic types stay
    // refused: a double makes a terrible partition identity, and a
    // numeric column wanting co-location without identity semantics is
    // the bucket layout's job.
    require(df.schema(by).dataType == org.apache.spark.sql.types.StringType ||
      df.schema(by).dataType == org.apache.spark.sql.types.LongType ||
      df.schema(by).dataType == org.apache.spark.sql.types.IntegerType,
      s"appendPartitioned($by): partition column must be STRING, LONG or " +
        s"INT, got ${df.schema(by).dataType.simpleString}")
    val stats = writePartitionedDataFiles(s, root, df, by)
    commitRetry(s, root) { prev =>
      (listOf(s, root, prev) :+ writeManifestFile(s, root,
        partitionedManifestRows(s, stats, prev + 1, by)),
        mergedSchema(tableSchema(s, root, prev), df.schema))
    }
  }

  /** Write one commit attempt's identity-partitioned files (one per
    * value present; the partition column STAYS in the data — the split
    * rides a shadow column). Returns per-file
    * (path, n_rows, min_id, max_id, n_nulls, part_val); fails loudly
    * on NULL partition values and verifies single-valuedness per file
    * from the same stats pass.
    */
  private def writePartitionedDataFiles(s: SparkSession, root: String,
      df: DataFrame, by: String): Seq[(String, Long, Long, Long, Long, String)] = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/p$token"
    // SKEW-SAFE value routing (VERDICT r16 what's-missing 3): a first
    // column-pruned pass sizes every partition value. When NO value
    // exceeds [[PartitionSplitRowsKey]] rows, the write keeps the
    // one-file-per-value hash route. When one does (90% of a corpus in
    // `lang=en`), the commit switches to a RANGE partitioning on
    // (value, doc_id) over Σ ceil(n_v/split) partitions plus a
    // `maxRecordsPerFile` cap: the hot value's rows flow through
    // multiple parallel tasks and land as ceil(n/split) single-valued
    // files covering PAIRWISE-DISJOINT id intervals (sorted within
    // partitions, so even in-task file rollover chunks contiguously —
    // stats stay tight and keep pruning). The size plan is O(|values|)
    // driver rows — the hive-partition bound.
    val splitRows = partitionSplitRows(s)
    val sizes: Seq[Long] = df
      .select(col(by).cast("string").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).toIndexedSeq
    val anySplit = sizes.exists(_ > splitRows)
    val base = df.withColumn("__gpart", col(by).cast("string"))
    val writer =
      if (!anySplit)
        base.repartition(col("__gpart"))
          .write.mode("overwrite")
      else {
        val nParts = math.min(10000L,
          sizes.map(n => (n + splitRows - 1L) / splitRows).sum).max(1L).toInt
        base.repartitionByRange(nParts, col("__gpart"), col("doc_id"))
          .sortWithinPartitions(col("__gpart"), col("doc_id"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", splitRows)
      }
    writer.partitionBy("__gpart").parquet(dataDir)
    val f = fs(s, root)
    val files = f.listStatus(new Path(dataDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__gpart="))
      .flatMap(d => f.listStatus(d.getPath).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".parquet")))
    // one stats job for every file; the value comes from the DATA
    // (min == max verified), never from decoding directory names
    val statByPath: Map[String, (Long, Option[Long], Option[Long], Long, String)] =
      s.read.parquet(dataDir)
        .groupBy(input_file_name().as("p"))
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("doc_id")).cast("long").as("mn"),
          max(col("doc_id")).cast("long").as("mx"),
          count(col("doc_id")).cast("long").as("nid"),
          min(col(by).cast("string")).as("vlo"),
          max(col(by).cast("string")).as("vhi"),
          count(col(by)).cast("long").as("nv"))
        .collect().map { r =>
          require(r.getLong(7) == r.getLong(1),
            s"appendPartitioned($by): NULL partition values are not allowed")
          require(r.getString(5) == r.getString(6),
            s"appendPartitioned($by): file spans values " +
              s"${r.getString(5)}..${r.getString(6)}")
          new Path(r.getString(0)).toUri.getPath ->
            ((r.getLong(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2)),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              r.getLong(4), r.getString(5)))
        }.toMap
    files.flatMap { p =>
      statByPath.get(new Path(p).toUri.getPath) match {
        case None => f.delete(new Path(p), false); None
        case Some((n, mn, mx, nid, v)) => Some((p, n,
          mn.getOrElse(Long.MinValue), mx.getOrElse(Long.MaxValue),
          n - nid, v))
      }
    }
  }

  /** Manifest rows for identity-partitioned files. */
  private def partitionedManifestRows(s: SparkSession,
      stats: Seq[(String, Long, Long, Long, Long, String)], k: Long,
      by: String): DataFrame = {
    import s.implicits._
    stats.map { case (p, n, lo, hi, nn, v) =>
      (p, k, n, lo, hi, nn, by, v, fileLenOf(s, p))
    }.toDF("path", "commit_id", "n_rows", "min_id", "max_id", "n_nulls",
      "part_col", "part_val", "n_bytes")
  }

  /** The identity-partition layout of snapshot k, if EVERY data file
    * honors one — Some(col) iff all data files declare the same
    * part_col with a non-null part_val. Any plain commit voids the
    * claim, exactly like [[bucketSpecOf]].
    */
  private[graft] def partSpecOf(s: SparkSession, root: String,
      k: Long): Option[String] = {
    if (k <= 0) return None
    val (schema, all) = manifestRowsOf(s, root, k)
    if (!schema.fieldNames.contains("part_col") ||
      !schema.fieldNames.contains("part_val")) return None
    val rows = all.filter(_.getAs[String]("kind") == "data")
      .map(r => (r.isNullAt(r.fieldIndex("part_col")),
        r.isNullAt(r.fieldIndex("part_val")), r.getAs[String]("part_col")))
    if (rows.isEmpty || rows.exists(r => r._1 || r._2)) None
    else {
      val cols = rows.map(_._3).distinct
      if (cols.length == 1) Some(cols.head) else None
    }
  }

  /** PARTITION-PRESERVING COMPACTION: one file per partition value
    * along the same identity layout. [[compact]] delegates here on
    * identity-partitioned stores.
    */
  def compactPartitioned(s: SparkSession, root: String): Long = {
    val by = partSpecOf(s, root, currentSnapshot(s, root)).getOrElse(
      throw new IllegalArgumentException(s"$root is not identity-partitioned"))
    commitRetry(s, root) { prev =>
      require(prev > 0, "compactPartitioned on an empty table")
      val stats = writePartitionedDataFiles(s, root,
        readSnapshot(s, root, prev), by)
      (Seq(writeManifestFile(s, root,
        partitionedManifestRows(s, stats, prev + 1, by))),
        tableSchema(s, root, prev))
    }
  }

  // ---- COMPOSED identity × bucket layout ---------------------------

  /** COMPOSED APPEND — identity partitioning THEN bucketing within
    * each value (VERDICT r16 what's-missing 2): every data file holds
    * exactly ONE (partition value, bucket) pair, and its manifest row
    * records both claims. The scan then reports the two-transform
    * `KeyGroupedPartitioning(identity(pcol), bucket(n, bcol))`, so ONE
    * table serves BOTH access patterns at once: exchange-free GROUP BY
    * / pruning on the partition column AND storage-partitioned joins
    * on the bucket key — the Iceberg `PARTITIONED BY (cat,
    * bucket(n, id))` shape. At 100 TB this is the layout a
    * date-partitioned, id-bucketed fact table actually runs:
    * partition-pruned SPJs touch one date's buckets and still skip
    * both exchanges.
    */
  def appendComposed(s: SparkSession, root: String, df: DataFrame,
      partBy: String, nBuckets: Int, bucketBy: String): Long = {
    require(df.schema(partBy).dataType == org.apache.spark.sql.types.StringType ||
      df.schema(partBy).dataType == org.apache.spark.sql.types.LongType ||
      df.schema(partBy).dataType == org.apache.spark.sql.types.IntegerType,
      s"appendComposed($partBy): partition column must be STRING, LONG or INT")
    require(nBuckets > 0 && df.schema.fieldNames.contains(bucketBy),
      s"appendComposed: bucket($nBuckets, $bucketBy) needs a positive count " +
        "and an existing column")
    val stats = writeComposedDataFiles(s, root, df, partBy, nBuckets, bucketBy)
    commitRetry(s, root) { prev =>
      (listOf(s, root, prev) :+ writeManifestFile(s, root,
        composedManifestRows(s, stats, prev + 1, partBy, nBuckets, bucketBy)),
        mergedSchema(tableSchema(s, root, prev), df.schema))
    }
  }

  /** One file per present (value, bucket) pair: route on both keys,
    * write under two-level dirs, stats in one job (single pair per
    * file verified from the DATA, like the single-level writers).
    */
  private def writeComposedDataFiles(s: SparkSession, root: String,
      df: DataFrame, partBy: String, nBuckets: Int, bucketBy: String):
      Seq[(String, Long, Long, Long, Long, String, Int)] = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/x$token"
    df.withColumn("__gpart", col(partBy).cast("string"))
      .withColumn("__gbucket",
        pmod(coalesce(col(bucketBy), lit(0L)), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("__gpart"), col("__gbucket"))
      .write.mode("overwrite").partitionBy("__gpart", "__gbucket")
      .parquet(dataDir)
    val f = fs(s, root)
    val files: Seq[String] = f.listStatus(new Path(dataDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__gpart="))
      .flatMap(pd => f.listStatus(pd.getPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("__gbucket=")))
      .flatMap(bd => f.listStatus(bd.getPath).toSeq.map(_.getPath.toString)
        .filter(_.endsWith(".parquet")))
    val statByPath: Map[String, (Long, Option[Long], Option[Long], Long, String, Int)] =
      s.read.parquet(dataDir)
        .groupBy(input_file_name().as("p"))
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("doc_id")).cast("long").as("mn"),
          max(col("doc_id")).cast("long").as("mx"),
          count(col("doc_id")).cast("long").as("nid"),
          min(col(partBy).cast("string")).as("vlo"),
          max(col(partBy).cast("string")).as("vhi"),
          count(col(partBy)).cast("long").as("nv"),
          min(pmod(coalesce(col(bucketBy), lit(0L)), lit(nBuckets.toLong))
            .cast("int")).as("blo"),
          max(pmod(coalesce(col(bucketBy), lit(0L)), lit(nBuckets.toLong))
            .cast("int")).as("bhi"))
        .collect().map { r =>
          require(r.getLong(7) == r.getLong(1),
            s"appendComposed($partBy): NULL partition values are not allowed")
          require(r.getString(5) == r.getString(6),
            s"appendComposed($partBy): file spans values " +
              s"${r.getString(5)}..${r.getString(6)}")
          require(r.getInt(8) == r.getInt(9),
            s"appendComposed: file spans buckets ${r.getInt(8)}..${r.getInt(9)}")
          new Path(r.getString(0)).toUri.getPath ->
            ((r.getLong(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2)),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              r.getLong(4), r.getString(5), r.getInt(8)))
        }.toMap
    files.flatMap { p =>
      statByPath.get(new Path(p).toUri.getPath) match {
        case None => f.delete(new Path(p), false); None
        case Some((n, mn, mx, nid, v, b)) => Some((p, n,
          mn.getOrElse(Long.MinValue), mx.getOrElse(Long.MaxValue),
          n - nid, v, b))
      }
    }
  }

  /** Manifest rows carrying BOTH layout claims. */
  private def composedManifestRows(s: SparkSession,
      stats: Seq[(String, Long, Long, Long, Long, String, Int)], k: Long,
      partBy: String, nBuckets: Int, bucketBy: String): DataFrame = {
    import s.implicits._
    stats.map { case (p, n, lo, hi, nn, v, b) =>
      (p, k, n, lo, hi, nn, partBy, v, b, nBuckets, bucketBy, fileLenOf(s, p))
    }.toDF("path", "commit_id", "n_rows", "min_id", "max_id", "n_nulls",
      "part_col", "part_val", "bucket_id", "bucket_n", "bucket_col",
      "n_bytes")
  }

  /** The composed layout of snapshot k: Some((part_col, n, bucket_col))
    * iff every data file carries BOTH claims consistently. Checked
    * FIRST by every layout dispatch — a composed store also satisfies
    * [[partSpecOf]] and [[bucketSpecOf]] individually, and a
    * maintenance job picking a single-level rewrite would silently
    * halve the layout.
    */
  private[graft] def composedSpecOf(s: SparkSession, root: String,
      k: Long): Option[(String, Int, String)] =
    for {
      p <- partSpecOf(s, root, k)
      (n, b) <- bucketSpecOf(s, root, k)
    } yield (p, n, b)

  /** COMPOSED-PRESERVING COMPACTION: one file per present
    * (value, bucket) pair along the same layout, both claims
    * re-recorded. [[compact]] delegates here on composed stores.
    */
  def compactComposed(s: SparkSession, root: String): Long = {
    val (p, n, b) = composedSpecOf(s, root, currentSnapshot(s, root))
      .getOrElse(throw new IllegalArgumentException(
        s"$root is not composed-partitioned"))
    commitRetry(s, root) { prev =>
      require(prev > 0, "compactComposed on an empty table")
      val stats = writeComposedDataFiles(s, root,
        readSnapshot(s, root, prev), p, n, b)
      (Seq(writeManifestFile(s, root,
        composedManifestRows(s, stats, prev + 1, p, n, b))),
        tableSchema(s, root, prev))
    }
  }

  /** The bucket layout of snapshot k, if EVERY data file honors one —
    * Some((n, col)) iff all data files declare the same (bucket_n,
    * bucket_col) with a non-null bucket_id. A mixed store (any plain
    * append, compaction, or COW rewrite in the history) reports None
    * and its scans stay unpartitioned: correctness never rides a
    * layout claim some file doesn't honor.
    */
  private[graft] def bucketSpecOf(s: SparkSession, root: String,
      k: Long): Option[(Int, String)] = {
    if (k <= 0) return None
    val (schema, all) = manifestRowsOf(s, root, k)
    if (!schema.fieldNames.contains("bucket_id") ||
      !schema.fieldNames.contains("bucket_n") ||
      !schema.fieldNames.contains("bucket_col")) return None
    val rows = all.filter(_.getAs[String]("kind") == "data")
    if (rows.isEmpty ||
      rows.exists(r => r.isNullAt(r.fieldIndex("bucket_id")) ||
        r.isNullAt(r.fieldIndex("bucket_n")) ||
        r.isNullAt(r.fieldIndex("bucket_col")))) None
    else {
      val specs = rows.map(r =>
        (r.getAs[Int]("bucket_n"), r.getAs[String]("bucket_col"))).distinct
      if (specs.length == 1) Some(specs.head) else None
    }
  }

  private val lsBuiltCache = new graft.SessionCache

  /** Seed the category-clustered fixture table: the q203 two-commit
    * split, each commit clustered on `lang`.
    */
  def ensureClustered(s: SparkSession, dir: String): String = {
    lsBuiltCache.getOrElseUpdate(s, dir) {
      val root = lsRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + LsLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        appendClustered(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0), "lang")
        appendClustered(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0), "lang")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    lsRoot(dir)
  }

  /** q233: a CATEGORICAL point predicate over the lang-clustered table
    * as plain SQL — the connector prunes the file list from the
    * manifest's string bounds (SnapshotTableSourceSpec pins strictly
    * fewer planned files than the manifest names, and that the plain
    * 1-D store cannot prune this predicate at all). Oracle = the
    * verbatim predicate on the raw table.
    */
  val q233SnapshotSqlCat: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureClustered(s, dir)
    val v = s"graft_snap_cat_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView(v)
    s.sql(
      s"""SELECT source, count(*) AS n_docs, sum(n_chars) AS sum_chars
         |FROM $v WHERE lang = 'de'
         |GROUP BY source ORDER BY source""".stripMargin)
  }

  /** ORPHAN VACUUM: physically delete data files that NO manifest
    * (committed or torn) references and that are older than
    * `olderThanMs` — the files a crashed commit attempt or a lost
    * claim race left behind, which every reader already ignores (the
    * manifest-last protocol's guarantee) but which cost storage
    * forever without this. The age floor is the safety contract: a
    * LIVE writer's files exist before its manifest does, so anything
    * younger than the longest plausible commit duration must survive;
    * with `olderThanMs = 0` every unreferenced file qualifies (only
    * safe when no writer is in flight — the spec's setting).
    * Complements [[expire]], which reclaims files that dropped
    * manifests referenced; vacuum reclaims files NOTHING ever
    * referenced. Returns the deleted paths. O(#files) metadata — one
    * recursive listing diffed against the unioned manifest path sets.
    */
  def vacuum(s: SparkSession, root: String, olderThanMs: Long): Seq[String] = {
    val f = fs(s, root)
    val dataDir = new Path(s"$root/data")
    if (!f.exists(dataDir)) return Nil
    val mdir = new Path(s"$root/manifests")
    // both reference levels: committed lists → live manifest files →
    // live data files. Orphans at either level (a crashed or race-
    // losing attempt's manifest file, its data files) are reclaimable.
    val refM: Set[String] =
      (if (!f.exists(mdir)) Set.empty[String]
      else f.listStatus(mdir).toSeq.map(_.getPath)
        .filter(p => p.getName.startsWith("m") &&
          p.getName.drop(1).forall(_.isDigit) &&
          f.exists(new Path(p, "_SUCCESS")))
        .flatMap(p => listOf(s, root, p.getName.drop(1).toLong)).toSet) ++
        // a live branch's staged manifest files are referenced too —
        // WAP staging must survive maintenance until the branch drops
        branchListRoots(s, root).flatMap(d =>
          s.read.parquet(d).select("mpath").collect().map(_.getString(0)))
    val referenced: Set[String] =
      if (refM.isEmpty) Set.empty
      else s.read.option("mergeSchema", "true")
        .parquet(refM.toIndexedSeq: _*)
        .select("path").distinct()
        .collect().map(_.getString(0)).toSet
    val now = System.currentTimeMillis()
    val orphans = f.listStatus(dataDir).toSeq.flatMap { d =>
      if (!d.isDirectory) Seq(d) else f.listStatus(d.getPath).toSeq
    }.filter(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet") && // committer markers stay with their dir
      !referenced.contains(st.getPath.toString) &&
      now - st.getModificationTime >= olderThanMs)
      .map(_.getPath)
    orphans.foreach(p => f.delete(p, false))
    // drop commit-attempt dirs the sweep emptied of data (whatever
    // committer markers remain go with the dir)
    f.listStatus(dataDir).foreach { d =>
      if (d.isDirectory &&
        !f.listStatus(d.getPath).exists(_.getPath.getName.endsWith(".parquet")))
        f.delete(d.getPath, true)
    }
    // manifest-FILE orphans: f<token> dirs no committed list names —
    // a lost claim race's or crashed attempt's metadata, same age
    // floor as its data
    val deadM =
      if (!f.exists(mdir)) Nil
      else f.listStatus(mdir).toSeq
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("f") &&
          !refM.contains(d.getPath.toString) &&
          now - d.getModificationTime >= olderThanMs)
        .map(_.getPath)
    deadM.foreach(p => f.delete(p, true))
    // RETIRED CDC streams' spill windows (`_cdc/b<j>_<k>`): a live
    // stream reclaims its own spills at each checkpoint commit
    // ([[SnapshotCdcSource]]); whatever outlives the age floor here
    // belongs to a stream that stopped for good
    val cdcDir = new Path(s"$root/_cdc")
    val deadCdc =
      if (!f.exists(cdcDir)) Nil
      else f.listStatus(cdcDir).toSeq
        .filter(d => d.isDirectory &&
          now - d.getModificationTime >= olderThanMs)
        .map(_.getPath)
    deadCdc.foreach(p => f.delete(p, true))
    (orphans ++ deadM ++ deadCdc).map(_.toString)
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

  private def aggShape(df: DataFrame): DataFrame =
    df.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  /** The validation+build step a NEW session runs (spec hook): ONE
    * `manifests/` listing + one meta-row read decide reuse — no data
    * is scanned unless the snapshot id moved. When it has moved and
    * the gap is APPEND-ONLY, the refresh FOLDS the snapshot diff into
    * the stored rows (the q222 discipline — O(|delta|), counts and
    * sums add); only a rewrite commit pays the recompute.
    */
  private[graft] def ensureSnapshotAggValidated(s: SparkSession,
      storeRoot: String, dir: String): Unit = {
    val root = aggRoot(dir)
    val snap = currentSnapshot(s, storeRoot)
    val want = (snap, SnapAggLayout)
    if (!StandingIndex.metaFresh(s, root, want)) {
      val stored = StandingIndex.readMeta(s, root)
      val incremental = stored.exists { case (_, oldSnap, layout) =>
        layout == SnapAggLayout && oldSnap > 0 && oldSnap < snap &&
          appendOnlySince(s, storeRoot, oldSnap, snap)
      }
      val view =
        if (incremental) {
          val folded = aggShape(readDiff(s, storeRoot, stored.get._2, snap))
            .unionByName(s.read.parquet(s"$root/agg"))
            .groupBy(col("lang"))
            .agg(sum(col("n_docs")).as("n_docs"),
              sum(col("sum_chars")).as("sum_chars"))
            .collect() // |langs| rows — so the overwrite never races its own read
          s.createDataFrame(s.sparkContext.parallelize(folded.toIndexedSeq, 1),
            aggShape(readSnapshot(s, storeRoot, snap)).schema)
        } else aggShape(readSnapshot(s, storeRoot, snap))
      view.coalesce(1).write.mode("overwrite").parquet(s"$root/agg")
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

  // ---- an MV OVER THE SNAPSHOT TABLE, fresh by snapshot id (q218) --

  /** Snapshot-MV layout version. Bumped to 2 when the view gained the
    * non-null fact count (`n_facts` — the column Average rollups must
    * divide by, ADVICE r14) and the incremental-refresh fold.
    */
  private val SnapMvLayout = 2L

  private[graft] def smRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmv")

  private val smBuiltCache = new graft.SessionCache

  /** The snapshot MV's aggregate shape over any snapshot frame — ONE
    * definition serves the full build, the incremental fold's delta
    * partial, and the spec's recompute baseline.
    */
  private def smAggregate(df: DataFrame): DataFrame =
    df.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), count(col("n_chars")).as("n_facts"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))

  /** Fold an APPEND-ONLY delta's partial aggregate into the stored
    * view — counts and sums add, extrema merge; exactly the
    * [[MatView.foldMvBatch]] algebra, driven by the snapshot DIFF.
    */
  private[graft] def smFold(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(smAggregate(delta))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_facts")).as("n_facts"),
        sum(col("sum_chars")).as("sum_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"))

  /** True iff every file of snapshot `k` that predates snapshot `j`
    * is exactly snapshot `j`'s file set — i.e. the j→k history is
    * APPEND-ONLY (no rewrite commit replaced or dropped a j-era file),
    * the precondition for folding the diff into a stored aggregate.
    * O(#files) metadata comparison, no data read.
    */
  private[graft] def appendOnlySince(s: SparkSession, root: String,
      j: Long, k: Long): Boolean = {
    val oldPaths = manifestRowsOf(s, root, j)._2
      .map(_.getAs[String]("path")).toSet
    val mk = manifestRowsOf(s, root, k)._2
    val carried = mk.filter(_.getAs[Long]("commit_id") <= j)
      .map(_.getAs[String]("path")).toSet
    // a MERGE-ON-READ delete commit carries every file yet still
    // removes rows logically — it breaks the fold precondition
    // exactly like a rewrite
    val newDeletes = mk.exists(r => r.getAs[String]("kind") == "delete" &&
      r.getAs[Long]("commit_id") > j)
    carried == oldPaths && !newDeletes
  }

  /** A MATERIALIZED VIEW over the snapshot table — the two chapters
    * composed the way a lakehouse composes them: the per-(lang,
    * source) aggregate view is validated by SNAPSHOT ID (one
    * `manifests/` listing — never a content scan, the q205
    * discipline), and it registers with [[graft.plans.MvRewrite]]
    * against the CURRENT snapshot's exact file list, so a plain
    * aggregate over `readSnapshot(current)` transparently reads the
    * view. A new commit moves the snapshot id, which invalidates the
    * stored view AND retires the registration in one stroke — the new
    * snapshot's file list is a different registry key, so a stale
    * view can never answer a fresh table (the registry's exact-path
    * discipline doing freshness work).
    */
  def ensureSnapshotMv(s: SparkSession, dir: String): String = {
    smBuiltCache.getOrElseUpdate(s, dir) {
      ensureSnapshotMvValidated(s, ensure(s, dir), dir)
      s.emptyDataFrame
    }
    s"${smRoot(dir)}/mv"
  }

  /** The validation+build+register step a NEW session (or a
    * post-commit refresh) runs — spec hook, like every other store's.
    *
    * REFRESH IS INCREMENTAL WHERE THE HISTORY ALLOWS (VERDICT r13
    * item 2): when a stored view exists for an older snapshot of the
    * SAME layout and every commit since is append-only
    * ([[appendOnlySince]] — a pure manifest comparison), the refresh
    * folds `readDiff(old, new)` into the |dims|-row stored view
    * (counts/sums add, extrema merge) — the refresh job's input is
    * the DELTA FILES ONLY, O(|delta|) instead of O(table). A rewrite
    * commit anywhere in the gap (delete/merge/compact replaced a
    * file) falls back to full recompute — deletes are not foldable
    * through stored extrema. Returns which path ran ("fresh" |
    * "incremental" | "recompute"), which the spec and the q222
    * standing build pin.
    */
  private[graft] def ensureSnapshotMvValidated(s: SparkSession,
      storeRoot: String, dir: String): String = {
    val root = smRoot(dir)
    val snap = currentSnapshot(s, storeRoot)
    val want = (snap, SnapMvLayout)
    val mode =
      if (StandingIndex.metaFresh(s, root, want)) "fresh"
      else {
        val stored = StandingIndex.readMeta(s, root)
        val incremental = stored.exists { case (_, oldSnap, layout) =>
          layout == SnapMvLayout && oldSnap > 0 && oldSnap < snap &&
            appendOnlySince(s, storeRoot, oldSnap, snap)
        }
        val view =
          if (incremental) {
            val oldSnap = stored.get._2
            // the fold reads |dims| stored rows + the delta files only;
            // materialize driver-side (metadata scale) so the overwrite
            // of the view path never races its own lazy read
            val folded = smFold(s.read.parquet(s"$root/mv"),
              readDiff(s, storeRoot, oldSnap, snap)).collect()
            s.createDataFrame(s.sparkContext.parallelize(folded.toIndexedSeq, 1),
              smAggregate(readSnapshot(s, storeRoot, snap)).schema)
          } else smAggregate(readSnapshot(s, storeRoot, snap))
        view.coalesce(1).write.mode("overwrite").parquet(s"$root/mv")
        StandingIndex.writeMeta(s, root, want)
        if (incremental) "incremental" else "recompute"
      }
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.plans.MvRewrite
    val src = readSnapshot(s, storeRoot, snap).queryExecution.analyzed
      .collect { case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
      }.flatten
    val mvRel = s.read.parquet(s"$root/mv").queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalStateException(
        s"snapshot MV at $root/mv did not analyze to a file relation"))
    MvRewrite.register(s, src, MvRewrite.MvEntry(mvRel,
      dims = Set("lang", "source"), factCol = "n_chars",
      countCol = "n_docs", factCountCol = "n_facts", sumCol = "sum_chars",
      minCol = "min_chars", maxCol = "max_chars"))
    mode
  }

  /** q218: a plain aggregate over the CURRENT snapshot, answered from
    * the snapshot-id-fresh view — per-source counts, sums and extrema
    * from a |langs|×|sources|-row table instead of the snapshot's
    * data files (the self-check asserts no `data/c…` file is
    * scanned). Current snapshot = the whole seeded table, so the
    * oracle is the verbatim raw-table SQL.
    */
  val q218SnapshotMv: (SparkSession, String) => DataFrame = (s, dir) => {
    val storeRoot = snapRoot(dir)
    val mv = ensureSnapshotMv(s, dir)
    require(mv.nonEmpty)
    graft.sources.MatView.withRewriteChecked(s, "snapmv", "/data/c") {
      readSnapshot(s, storeRoot, currentSnapshot(s, storeRoot))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
    }.orderBy(col("source"))
  }

  /** q226: the snapshot MV under a DIMENSION FILTER — a whole-group
    * predicate (`lang IN ('en','de')`) over the CURRENT snapshot,
    * grouped by the other dimension, still answered from the
    * |langs|×|sources|-row view: the rewrite's filter-carryover
    * (q196's mechanism) composing with the MULTI-FILE snapshot
    * registration key — the filter must survive sitting above a scan
    * whose registry key is the snapshot's whole file list, and the
    * self-check asserts no data file is touched. Oracle = the verbatim
    * filtered raw-table SQL.
    */
  val q226SnapshotMvFiltered: (SparkSession, String) => DataFrame = (s, dir) => {
    val storeRoot = snapRoot(dir)
    val mv = ensureSnapshotMv(s, dir)
    require(mv.nonEmpty)
    graft.sources.MatView.withRewriteChecked(s, "snapmv", "/data/c") {
      readSnapshot(s, storeRoot, currentSnapshot(s, storeRoot))
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }.orderBy(col("source"))
  }

  // ---- the INCREMENTAL-REFRESH store (q222): MV maintained by diff --

  /** Incremental-store layout version. */
  private val IncLayout = 1L

  private[graft] def incRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapinc")

  private val incBuiltCache = new graft.SessionCache

  /** A store whose MV is PROVABLY maintained incrementally: seed
    * commit 1 (`doc_id % 3 != 0`), build the MV at snapshot 1, append
    * commit 2 (the rest), then REFRESH — the build asserts the refresh
    * took the O(|delta|) fold path, never the recompute. The q222
    * query then hash-checks the folded view against the verbatim
    * whole-table DuckDB aggregate: incremental == recomputed, to the
    * byte, or the gate goes red.
    */
  def ensureIncremental(s: SparkSession, dir: String): String = {
    incBuiltCache.getOrElseUpdate(s, dir) {
      val root = incRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + IncLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        val store = s"$root/tbl"
        append(s, store, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        smAggregate(readSnapshot(s, store, 1L))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/mv")
        append(s, store, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        val folded = smFold(s.read.parquet(s"$root/mv"),
          readDiff(s, store, 1L, 2L)).collect()
        require(appendOnlySince(s, store, 1L, 2L),
          "q222 store: the append history must be foldable")
        s.createDataFrame(s.sparkContext.parallelize(folded.toIndexedSeq, 1),
          smAggregate(readSnapshot(s, store, 2L)).schema)
          .coalesce(1).write.mode("overwrite").parquet(s"$root/mv")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    incRoot(dir)
  }

  /** q222: the INCREMENTALLY REFRESHED view read back — per-(lang,
    * source) counts/sums/extrema produced by folding the snapshot DIFF
    * into the snapshot-1 view (never re-aggregating commit 1's rows).
    * Oracle = the verbatim whole-table SQL: the fold algebra is exact
    * longs, so maintained == recomputed, hash-identical.
    */
  val q222SnapshotMvIncremental: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureIncremental(s, dir)
    s.read.parquet(s"$root/mv")
      .orderBy(col("lang"), col("source"))
  }

  // ---- the MERGE store (q211) and SCHEMA EVOLUTION (q212) ----------

  /** Merge-store layout version. */
  private val MgLayout = 1L

  private[graft] def mgRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmg")

  private val mgBuiltCache = new graft.SessionCache

  /** The deterministic CDC batch q211 merges: every doc_id % 7 == 0
    * row UPDATED (n_chars + 1000), every doc_id % 11 == 0 row cloned
    * as an INSERT under key doc_id + 1,000,000 — so the change set
    * exercises both merge arms and the raw-table oracle is a UNION of
    * two closed-form selects.
    */
  private def mergeChanges(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("n_chars", col("n_chars") + 1000)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(11)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))

  /** Seed + MERGE: the 2-commit seed, then [[mergeInto]] with the
    * deterministic CDC batch as commit 3.
    */
  def ensureMerged(s: SparkSession, dir: String): String = {
    mgBuiltCache.getOrElseUpdate(s, dir) {
      val root = mgRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + MgLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        mergeInto(s, root, mergeChanges(docs))
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    mgRoot(dir)
  }

  /** q211: MERGE INTO read back — the post-merge snapshot aggregated
    * per lang. Oracle = the closed-form merge result on the raw table
    * (updates folded in place, insert clones unioned on); correct iff
    * the stats-driven rewrite replaced every updated row exactly once,
    * dropped none, and landed every insert.
    */
  val q211SnapshotMerge: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMerged(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** ROW-LEVEL CHANGE DATA FEED between consecutive snapshots j → k —
    * the table-format CDC that works across REWRITE commits, where the
    * file-level [[readDiff]] (append-only semantics) cannot: the rows
    * of the files commit k REPLACED are full-outer-joined on the key
    * against the rows of the files commit k WROTE, and each key
    * classifies as `insert` (new side only), `delete` (old side only),
    * or `update` (both sides, any non-key column changed); keys
    * rewritten verbatim (an affected file's untouched rows — the COW
    * write amplification) join equal and are NOT changes, so the feed
    * reports exactly the logical mutation, not the physical rewrite.
    *
    * Scale shape — the whole point: both inputs are pruned at FILE
    * level from the two manifests (old side = paths in manifest j that
    * k dropped; new side = paths in manifest k under commit id k), so
    * a narrow merge diffs the handful of files it touched, never the
    * table; carried-over files appear in neither input by
    * construction. Columns compared are the OLD schema's (an additive
    * evolution alone never flags an update). q87's operator computes
    * the same feed for raw stores by hashing every row of both
    * versions — this is what its scaladoc promised a table format
    * makes cheap.
    */
  def changeFeed(s: SparkSession, root: String, j: Long, k: Long): DataFrame = {
    require(j < k, s"changeFeed needs j < k, got $j -> $k")
    // Replaced/written resolve by PATH-SET DIFFERENCE between the two
    // manifests, not by commit id: for ordinary commits the two are
    // equivalent (a path never re-enters a manifest), but a RESTORE
    // commit re-adds paths that j dropped under their ORIGINAL commit
    // ids — the set difference reports them as written, so the feed
    // across a rollback is exactly the inverse of the rolled-back
    // mutation.
    val (datJ, delJ, posJ, nDelJ, nPosJ, nullsJ) = splitManifestNulls(s, root, j)
    val (datK, delK, posK, nDelK, nPosK, nullsK) = splitManifestNulls(s, root, k)
    val mj = datJ.map(_._1).toSet
    val mkPaths = datK.map(_._1).toSet
    val replaced = datJ.filter(t => !mkPaths(t._1))
    val written = datK.filter(t => !mj(t._1))
    def emptyLike(like: Long): DataFrame = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema(s, root, like))
    // each side reads through ITS snapshot's delete files, so a row
    // already MOR-dead at j (or at k) never enters the comparison.
    // j = 0 (the empty table — a CDC consumer's "from the beginning")
    // borrows k's schema: the feed is then the initial load as inserts
    val oldRows = if (replaced.isEmpty) emptyLike(if (j == 0L) k else j)
      else readWithDeletes(s, root, j, replaced, delJ, posJ.map(_._1), nDelJ, nPosJ)
    val newRows = if (written.isEmpty) emptyLike(k)
      else readWithDeletes(s, root, k, written, delK, posK.map(_._1), nDelK, nPosK)
    val valueCols = oldRows.columns.filter(_ != "doc_id").toSeq
    val o = oldRows.select((col("doc_id").as("o_id") +:
      valueCols.map(c => col(c).as(s"o_$c"))): _*)
    val n = newRows.select((col("doc_id").as("n_id") +:
      valueCols.map(c => col(c).as(s"n_$c"))): _*)
    val changed = valueCols.map(c =>
      !(col(s"o_$c") <=> col(s"n_$c"))).reduceOption(_ || _).getOrElse(lit(false))
    // Non-null keys carry row identity: the keyed full-outer join
    // classifies them. A NULL key has NO identity — `===` never
    // matches it (so a verbatim-carried null-key row would read as a
    // spurious delete+insert pair), and a null-safe `<=>` would CROSS
    // every null-key old row with every null-key new row. The correct
    // semantics (ADVICE r14): compare the null-key rows as WHOLE-ROW
    // MULTISETS — equal rows cancel (a verbatim rewrite is not a
    // change), excess on the new side is that many inserts, excess on
    // the old side that many deletes; "update" is undefined without
    // identity.
    val keyed = o.filter(col("o_id").isNotNull)
      .join(n.filter(col("n_id").isNotNull),
        col("o_id") === col("n_id"), "full_outer")
      .withColumn("change_type",
        when(col("o_id").isNull, lit("insert"))
          .when(col("n_id").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull) // verbatim rewrites are not changes
      .withColumn("doc_id", coalesce(col("n_id"), col("o_id")))
    val idT = oldRows.schema("doc_id").dataType
    // METADATA-DECIDED null path: when every window file RECORDS zero
    // null-key rows (`n_nulls`, the null_value_counts shape), the
    // whole-row-multiset comparison — two groupBys + a row-equality
    // full outer + an explode — is provably empty and skips entirely.
    // Files from pre-n_nulls manifests read the column as NULL =
    // unknown and conservatively keep the pass.
    val windowPaths = replaced.map(_._1).toSet ++ written.map(_._1)
    val mayHaveNulls = (nullsJ ++ nullsK).exists { case (p, nn) =>
      windowPaths(p) && nn.forall(_ > 0L)
    }
    val rowEq = valueCols.map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val ins = col("__d") > 0
    lazy val nullFeedFull = o.filter(col("o_id").isNull)
      .groupBy(valueCols.map(c => col(s"o_$c")): _*).agg(count(lit(1)).as("__oc"))
      .join(n.filter(col("n_id").isNull)
          .groupBy(valueCols.map(c => col(s"n_$c")): _*).agg(count(lit(1)).as("__nc")),
        rowEq, "full_outer")
      .withColumn("__d",
        coalesce(col("__nc"), lit(0L)) - coalesce(col("__oc"), lit(0L)))
      .filter(col("__d") =!= 0)
      .withColumn("__i", explode(sequence(lit(1L), abs(col("__d")))))
      .select((Seq(lit(null).cast(idT).as("o_id")) ++
        valueCols.map(c => when(!ins, col(s"o_$c")).as(s"o_$c")) ++
        Seq(lit(null).cast(idT).as("n_id")) ++
        valueCols.map(c => when(ins, col(s"n_$c")).as(s"n_$c")) ++
        Seq(when(ins, lit("insert")).otherwise(lit("delete")).as("change_type"),
          lit(null).cast(idT).as("doc_id"))): _*)
    val nullFeed =
      if (mayHaveNulls) nullFeedFull
      else keyed.filter(lit(false)) // provably empty from the manifest
    // equality-delete files committed in (j, k]: each key live at j is
    // a LOGICAL delete with its pre-image — file-pruned via the
    // manifest stats of j. CDC-sized sets collect their keys for the
    // exact decision; a LARGE delete set (a MOR SQL DELETE can write
    // one of any size) switches to the distributed [[affectedByJoin]]
    // granule range join, so the decision never holds O(|keys|) on
    // the driver (VERDICT r16 what's-wrong 1) — the pre-image
    // left-semi join below is distributed either way
    // delete files committed in (j, k] — resolved from the ALREADY
    // collected manifest split, no second metadata read
    val newDelFiles = delK.filter(_._2 > j).map(_._1)
    val morDeletes =
      if (newDelFiles.isEmpty) None
      else {
        val keys = s.read.parquet(newDelFiles: _*)
          .select(col("doc_id")).distinct()
        val mJdata = withKind(manifest(s, root, j))
          .filter(col("kind") === "data")
        // total rows of the window's delete files, from the memoized
        // manifest rows (no data read, no job): the collect-vs-join
        // decision
        val nNewDel = manifestRowsOf(s, root, k)._2
          .filter(r => r.getAs[String]("kind") == "delete" &&
            r.getAs[Long]("commit_id") > j)
          .map(_.getAs[Long]("n_rows")).sum
        val aff =
          if (nNewDel <= deleteMapThreshold(s)) affectedByCollect(s, mJdata, keys)
          else affectedByJoin(s, mJdata, keys)
        val affT = datJ.filter(t => aff(t._1))
        val oldSchema = tableSchema(s, root, j)
        val pre = (if (affT.isEmpty) emptyLike(j)
          else readWithDeletes(s, root, j, affT, delJ, posJ.map(_._1), nDelJ, nPosJ))
          .join(keys.select(col("doc_id").as("__dk")),
            col("doc_id") === col("__dk"), "left_semi")
        Some(pre.select((Seq(col("doc_id").as("o_id")) ++
          valueCols.map(c => col(c).as(s"o_$c")) ++
          Seq(lit(null).cast(idT).as("n_id")) ++
          valueCols.map(c =>
            lit(null).cast(oldSchema(c).dataType).as(s"n_$c")) ++
          Seq(lit("delete").as("change_type"),
            col("doc_id").as("doc_id"))): _*))
      }
    // position-delete files committed in (j, k]: each position names a
    // physical row live at j (physical identity, so even a NULL-key
    // row has a pre-image) — a LOGICAL delete read from exactly the
    // targeted files
    val newPosFiles = posK.filter(_._2 > j).map(_._1)
    val posDeletes =
      if (newPosFiles.isEmpty) None
      else {
        val pd = s.read.parquet(newPosFiles: _*)
          .select(normPath(col("path")).as("__pp"), col("pos").as("__ppos"))
          .distinct()
        val targeted = pd.select("__pp").distinct()
          .collect().map(_.getString(0)).toSet
        val affT = datJ.filter(t => targeted(normPathStr(t._1)))
        val oldSchema = tableSchema(s, root, j)
        val pre = (if (affT.isEmpty) emptyLike(j)
          else readWithDeletes(s, root, j, affT, delJ, posJ.map(_._1), nDelJ, nPosJ,
            keepPos = true))
          .join(broadcast(pd),
            col("__path") === col("__pp") && col("__pos") === col("__ppos"),
            "left_semi")
        Some(pre.select((Seq(col("doc_id").as("o_id")) ++
          valueCols.map(c => col(c).as(s"o_$c")) ++
          Seq(lit(null).cast(idT).as("n_id")) ++
          valueCols.map(c =>
            lit(null).cast(oldSchema(c).dataType).as(s"n_$c")) ++
          Seq(lit("delete").as("change_type"),
            col("doc_id").as("doc_id"))): _*))
      }
    (morDeletes.toSeq ++ posDeletes.toSeq)
      .foldLeft(keyed.unionByName(nullFeed))(_ unionByName _)
  }

  /** The change feed in the COMPACT CDC shape a consumer subscribes
    * to: `(change_type, commit_id, doc_id, <table columns>)` — the
    * post-image for inserts/updates, the pre-image for deletes. The
    * streaming source ([[SnapshotCdcSource]]) emits micro-batches in
    * exactly this shape, and the spec's batch/streaming equivalence
    * compares through it.
    */
  def changeFeedCompact(s: SparkSession, root: String, j: Long, k: Long): DataFrame = {
    val feed = changeFeed(s, root, j, k)
    // the columns the feed actually compared (snapshot j's era — an
    // additive evolution inside the window surfaces next window)
    val valueCols = feed.columns.filter(_.startsWith("o_"))
      .filterNot(_ == "o_id").map(_.stripPrefix("o_")).toSeq
    feed.select((Seq(col("change_type"), lit(k).as("commit_id"),
      coalesce(col("n_id"), col("o_id")).as("doc_id")) ++
      valueCols.map(c => coalesce(col(s"n_$c"), col(s"o_$c")).as(c))): _*)
  }

  /** q225: the CHANGE FEED of the q211 merge commit (snapshot 2 → 3 of
    * the merge store) — per change type, how many keys and what the
    * post-image n_chars sums to (pre-image for deletes; the merge
    * batch has none). The feed reads ONLY the files the merge touched;
    * the oracle is the closed form of the q211 CDC batch on the raw
    * table, so a hash match proves the feed recovered exactly the
    * logical changes from the physical rewrite — rewritten-verbatim
    * rows excluded.
    */
  val q225SnapshotChangeFeed: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMerged(s, dir)
    changeFeed(s, root, 2L, 3L)
      .withColumn("chars", coalesce(col("n_n_chars"), col("o_n_chars")))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_keys"), sum(col("chars")).as("sum_chars"))
      .orderBy(col("change_type"))
  }

  // ---- the JOIN-path MERGE store (q223) -----------------------------

  /** Join-merge-store layout version. */
  private val MjLayout = 1L

  private[graft] def mjRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmj")

  private val mjBuiltCache = new graft.SessionCache

  /** A second deterministic CDC batch for the JOIN-path merge — mod
    * constants disjoint from q211's so the two stores can never be
    * confused: % 5 rows updated (n_chars + 500), % 13 rows cloned as
    * inserts at doc_id + 2,000,000.
    */
  private def mergeChangesJoin(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("n_chars", col("n_chars") + 500)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(13)) === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L))

  /** Seed + MERGE through the DISTRIBUTED granule range join: the
    * threshold is pinned to 1 for the build, so the affected-file
    * decision provably runs as [[affectedByJoin]] — no key ever
    * reaches the driver — while q223's oracle hash-checks the result
    * against the same closed form the collect path would produce.
    */
  def ensureMergedJoin(s: SparkSession, dir: String): String = {
    mjBuiltCache.getOrElseUpdate(s, dir) {
      val root = mjRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + MjLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        val prev = s.conf.getOption(MergeJoinThresholdKey)
        s.conf.set(MergeJoinThresholdKey, "1")
        try mergeInto(s, root, mergeChangesJoin(docs))
        finally prev match {
          case Some(v) => s.conf.set(MergeJoinThresholdKey, v)
          case None => s.conf.unset(MergeJoinThresholdKey)
        }
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    mjRoot(dir)
  }

  /** q223: the JOIN-path MERGE read back — same MERGE INTO semantics
    * as q211, affected files selected by the granule-summary range
    * join instead of a collected key list (the at-scale decision path
    * the round-13 scaladoc promised). Oracle = the closed-form merge
    * on the raw table; a hash match proves the distributed decision
    * selected a sound file set.
    */
  val q223SnapshotMergeJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMergedJoin(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // ---- the CONCURRENT-WRITERS store (q224) --------------------------

  /** Concurrency-store layout version. */
  private val CcLayout = 1L

  private[graft] def ccRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapcc")

  private val ccBuiltCache = new graft.SessionCache

  /** TWO WRITERS RACING the claim CAS: both halves of `documents`
    * (`doc_id % 2`) appended from two concurrent threads onto one
    * fresh table. Whichever thread wins commit 1, the loser rebases
    * and lands commit 2 — the final table holds EVERY row exactly
    * once (commit order is nondeterministic; table CONTENT is not,
    * which is what makes an exact oracle possible). The build asserts
    * both commits landed; q224 hash-checks the union against the raw
    * table — the lost-commit failure mode of the round-13 protocol
    * would show up as a missing half.
    */
  def ensureConcurrent(s: SparkSession, dir: String): String = {
    ccBuiltCache.getOrElseUpdate(s, dir) {
      val root = ccRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + CcLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        val store = s"$root/tbl"
        val halves = Seq(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        val threads = halves.map(h => new Thread(() =>
          try append(s, store, h)
          catch { case t: Throwable => errs.add(t) }))
        threads.foreach(_.start())
        threads.foreach(_.join())
        if (!errs.isEmpty) throw new IllegalStateException(
          "concurrent append failed", errs.peek())
        require(currentSnapshot(s, store) == 2L,
          "both racing writers must land a commit (no lost commit)")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    ccRoot(dir)
  }

  /** q224: the RACED table read back — per-lang aggregate over the
    * two concurrently-committed halves. Oracle = the verbatim
    * whole-table SQL: a lost commit (the pre-CAS failure mode) drops
    * half the rows and the hash goes red; the claim CAS makes the
    * result independent of which writer won.
    */
  val q224SnapshotConcurrent: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = s"${ensureConcurrent(s, dir)}/tbl"
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // ---- the MERGE-ON-READ store (q229): delete files, not rewrites --

  /** MOR-store layout version. */
  private val MdLayout = 1L

  private[graft] def mdRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmd")

  private val mdBuiltCache = new graft.SessionCache

  /** Seed + MERGE-ON-READ DELETE: the 2-commit seed, then
    * [[deleteKeys]] of every doc_id % 9 == 0 as commit 3 — a commit
    * that rewrites NOTHING (the build asserts every data file of
    * snapshot 2 carries into snapshot 3 verbatim). q229 then reads the
    * current snapshot through the delete anti-join and hash-checks it
    * against the complement predicate on the raw table: MOR read ==
    * the COW result, to the byte.
    */
  def ensureMorDeleted(s: SparkSession, dir: String): String = {
    mdBuiltCache.getOrElseUpdate(s, dir) {
      val root = mdRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + MdLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        val dataBefore = manifest(s, root, 2L).select("path")
          .collect().map(_.getString(0)).toSet
        deleteKeys(s, root,
          docs.filter(pmod(col("doc_id"), lit(9)) === 0).select("doc_id"))
        val dataAfter = withKind(manifest(s, root, 3L))
          .filter(col("kind") === "data").select("path")
          .collect().map(_.getString(0)).toSet
        require(dataAfter == dataBefore,
          "a MOR delete must carry every data file verbatim")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    mdRoot(dir)
  }

  /** q229: the MERGE-ON-READ DELETE read back — the post-delete
    * snapshot per lang, produced by the read-side anti-join against
    * the equality-delete file (zero data files were rewritten; the
    * build asserts it). Oracle = the complement predicate on the raw
    * table: MOR and COW must agree to the byte.
    */
  val q229SnapshotMorDelete: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMorDeleted(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // ---- the POSITION-DELETE store (q234): keyless MOR ---------------

  /** Position-delete-store layout version. */
  private val PdLayout = 1L

  private[graft] def pdRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snappd")

  private val pdBuiltCache = new graft.SessionCache

  /** The q234 predicate window — a NON-KEY predicate (n_chars, not
    * doc_id), the case equality-delete files cannot express.
    */
  val PdChLo = 200L; val PdChHi = 260L

  /** Seed the position-delete fixture: the 2-commit seed, then
    * [[deleteWhere]] on the n_chars window — a keyless MOR delete
    * committed as ONE position file; the build asserts every data
    * file carried verbatim (zero rewrites).
    */
  def ensurePosDeleted(s: SparkSession, dir: String): String = {
    pdBuiltCache.getOrElseUpdate(s, dir) {
      val root = pdRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + PdLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        val dataBefore = manifest(s, root, 2L).select("path")
          .collect().map(_.getString(0)).toSet
        deleteWhere(s, root, col("n_chars").between(PdChLo, PdChHi))
        val dataAfter = withKind(manifest(s, root, 3L))
          .filter(col("kind") === "data").select("path")
          .collect().map(_.getString(0)).toSet
        require(dataAfter == dataBefore,
          "a position delete must carry every data file verbatim")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    pdRoot(dir)
  }

  /** q234: the POSITION-DELETE read back — the post-delete snapshot
    * per lang after a KEYLESS predicate delete (`n_chars` window —
    * inexpressible as an equality-delete key set), applied at read as
    * the (file, ordinal) anti-join; zero data files were rewritten
    * (the build asserts it). Oracle = the complement predicate on the
    * raw table.
    */
  val q234SnapshotPosDelete: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensurePosDeleted(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // ---- the DSv2-WRITTEN store (q236): executor-parallel appends ----

  /** DSv2-write-store layout version. */
  private val DwLayout = 2L

  private[graft] def dwRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapdw")

  private val dwBuiltCache = new graft.SessionCache

  /** Seed the DSv2-write fixture: commit 1 through the library append,
    * commit 2 through `df.write.format(...)` — executors write the
    * files, the driver commits their stats through the claim CAS
    * ([[SnapshotTableSource]]'s write path). The build asserts the
    * write landed as exactly one commit.
    */
  def ensureDsvWritten(s: SparkSession, dir: String): String = {
    dwBuiltCache.getOrElseUpdate(s, dir) {
      val root = dwRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + DwLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        docs.filter(pmod(col("doc_id"), lit(3)) === 0)
          .write.format("graft.sources.SnapshotTableSource")
          .option("root", root).mode("append").save()
        require(currentSnapshot(s, root) == 2L,
          "the DSv2 write must land as exactly one commit")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    dwRoot(dir)
  }

  /** q236: the DSv2-WRITTEN table read back — commit 2 was produced by
    * `df.write.format(...)` (executor-parallel files, stats shipped as
    * commit messages, manifest committed through the CAS); the rollup
    * hash-checks the whole table against the raw corpus, so a lost
    * partition, double-committed task, or bad stats row goes red.
    * Oracle = the full-table rollup.
    */
  val q236SnapshotDsvWrite: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureDsvWritten(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // ---- the RESTORE store (q228): rollback as a first-class commit --

  /** Restore-store layout version. */
  private val RsLayout = 1L

  private[graft] def rsRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snaprs")

  private val rsBuiltCache = new graft.SessionCache

  /** Seed, DAMAGE, RESTORE: the 2-commit seed, a "bad" merge (q211's
    * CDC batch standing in for the operator error) as commit 3, then
    * [[restore]](2) as commit 4 — so the CURRENT snapshot is
    * byte-identical to the pre-merge table while the bad commit stays
    * addressable history. The build asserts the rollback round-trip;
    * q228 hash-checks the restored table against the raw table — a
    * restore that lost or duplicated a single row goes red.
    */
  def ensureRestored(s: SparkSession, dir: String): String = {
    rsBuiltCache.getOrElseUpdate(s, dir) {
      val root = rsRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + RsLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        mergeInto(s, root, mergeChanges(docs)) // the "bad" commit
        val k = restore(s, root, 2L)
        require(k == 4L, s"restore must land as the next commit, got $k")
        require(fs(s, root).exists(new Path(s"$root/manifests/m3/_SUCCESS")),
          "the rolled-back commit must remain addressable history")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    rsRoot(dir)
  }

  /** q228: the RESTORED table read back — the current snapshot after
    * rolling back the bad merge, aggregated per source. Oracle = the
    * verbatim raw-table SQL: correct iff the rollback returned the
    * table to exactly the pre-merge rows (the merge's updates and
    * inserts all gone) without touching a data file.
    */
  val q228SnapshotRestore: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureRestored(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"))
  }

  // ---- SCHEMA EVOLUTION (q212): a later commit adds a column -------

  /** Evolution-store layout version. */
  private val SeLayout = 1L

  private[graft] def seRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapse")

  private val seBuiltCache = new graft.SessionCache

  /** Seed a store whose SECOND commit carries a column the first
    * never had (`quality = n_chars % 100`) — the additive schema
    * evolution every long-lived table eventually needs. Nothing is
    * rewritten: old files keep their narrow schema; [[readSnapshot]]'s
    * schema-merging read surfaces `quality` as NULL for pre-evolution
    * rows. The manifest protocol is untouched — evolution is a
    * property of the READ (plus the schema sidecar, which records the
    * union), which is why it is free.
    */
  def ensureEvolved(s: SparkSession, dir: String): String = {
    seBuiltCache.getOrElseUpdate(s, dir) {
      val root = seRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + SeLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0)
          .withColumn("quality", pmod(col("n_chars"), lit(100))))
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    seRoot(dir)
  }

  /** q212: reading ACROSS the evolution — per-lang counts with the
    * evolved column aggregated as `sum(coalesce(quality, -1))`, so
    * pre-evolution rows (NULL quality → −1) and post-evolution rows
    * (n_chars % 100) are both visible in one exact number. Oracle =
    * the raw table with the evolution boundary re-derived from the
    * commit predicate.
    */
  val q212SnapshotEvolution: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureEvolved(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("quality"), lit(-1L))).as("sum_quality"))
      .orderBy(col("lang"))
  }

  // ---- the LIFECYCLE store (q209/q210): delete → compact → expire ----

  /** Lifecycle-store layout version. */
  private val LcLayout = 1L

  private[graft] def lcRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snaplc")

  private val lcBuiltCache = new graft.SessionCache

  /** The deleted window the lifecycle store carves out — q206's read
    * range, reused so the two chapters witness the same stats pruning
    * from both sides (read skips these files; delete rewrites ONLY
    * them).
    */
  val DeleteLo = 100L
  val DeleteHi = 250L

  /** A SECOND snapshot table that lives the full lifecycle,
    * deterministically: seed in two commits (the q203 split), COW
    *-delete doc_id ∈ [100, 250] (commit 3), COMPACT (commit 4), then
    * EXPIRE history before the delete — so snapshots 1–2 are gone,
    * 3–4 remain addressable, and the files only the dropped manifests
    * referenced are physically deleted (SnapshotStoreSpec pins each
    * transition on a scratch copy; the standing store here holds the
    * END state the queries read). Content-signature-guarded like
    * every standing artifact.
    */
  def ensureLifecycle(s: SparkSession, dir: String): String = {
    lcBuiltCache.getOrElseUpdate(s, dir) {
      val root = lcRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + LcLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        deleteRange(s, root, DeleteLo, DeleteHi)
        compact(s, root)
        expire(s, root, keepFrom = 3L)
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    lcRoot(dir)
  }

  /** q209: the COPY-ON-WRITE DELETE read back — the post-delete
    * snapshot (which survived compaction AND expiration byte-
    * identically) aggregated per lang. Oracle = the raw table minus
    * the deleted window; correct iff the rewrite dropped exactly the
    * range rows from the affected files and nothing else.
    */
  val q209SnapshotDelete: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureLifecycle(s, dir)
    readSnapshot(s, root, 3L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q210: the lifecycle END STATE — the compacted, history-expired
    * current snapshot, aggregated per source. Same rows as q209 under
    * a different grouping (compaction and expiration must be
    * row-invariant); the file-count shrink and the history loss are
    * pinned in SnapshotStoreSpec, where they belong (layout facts, not
    * row facts).
    */
  val q210SnapshotLifecycle: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureLifecycle(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
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

  // ---- the STREAM-SUNK store (q242): native streaming sink ----------

  /** Stream-sink-store layout version. */
  private val SsLayout = 2L

  private[graft] def ssRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapss")

  private val ssBuiltCache = new graft.SessionCache

  /** Seed the STREAMING-SINK fixture: commit 1 through the library
    * append, commit 2 through `writeStream.format(...)` — a file-
    * sourced Structured Streaming query (Trigger.AvailableNow) whose
    * single micro-batch lands as ONE CAS-committed snapshot with its
    * epoch marker. The build asserts exactly one commit landed.
    */
  def ensureStreamSunk(s: SparkSession, dir: String): String = {
    ssBuiltCache.getOrElseUpdate(s, dir) {
      val root = ssRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + SsLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        // the file source needs a DIRECTORY: stage the late arrivals
        // as the landing zone a streaming ingest would tail
        val landing = s"$root/_landing"
        docs.filter(pmod(col("doc_id"), lit(3)) === 0)
          .write.mode("overwrite").parquet(landing)
        val q = s.readStream.schema(docs.schema).parquet(landing)
          .writeStream.format("graft.sources.SnapshotTableSource")
          .option("root", root)
          .option("checkpointLocation", s"$root/_chk")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        require(currentSnapshot(s, root) == 2L,
          "the streaming sink must land its micro-batch as exactly one commit")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    ssRoot(dir)
  }

  /** q242: the STREAM-SUNK table read back — commit 2 was produced by
    * a Structured Streaming query through the native sink (executor
    * writers per epoch, the epoch-marker idempotence, the CAS commit).
    * Oracle = the full-table rollup per source; a dropped or doubled
    * micro-batch row goes red.
    */
  val q242SnapshotStreamSink: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureStreamSunk(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"))
      .orderBy(col("source"))
  }

  // ---- the WAP store (q237): branch staging → audit → publish -------

  /** WAP-store layout version. */
  private val WapLayout = 1L

  private[graft] def wapRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapwap")

  private val wapBuiltCache = new graft.SessionCache

  /** Seed the WRITE-AUDIT-PUBLISH fixture: main gets the even rows
    * (commit 1), the odd rows stage on branch `audit` (invisible to
    * main — asserted in the builder: a reader between stage and
    * publish sees commit 1 exactly), then [[fastForward]] publishes
    * them as commit 2. The end state must equal the raw table — a
    * staged row lost in the re-stamp, or a base row double-published,
    * turns the q237 oracle red.
    */
  def ensureWap(s: SparkSession, dir: String): String = {
    wapBuiltCache.getOrElseUpdate(s, dir) {
      val root = wapRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + WapLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(2)) === 0))
        createBranch(s, root, "audit", 1L)
        appendBranch(s, root, "audit", docs.filter(pmod(col("doc_id"), lit(2)) === 1))
        // the WAP invariant: staged rows are invisible to main readers
        require(currentSnapshot(s, root) == 1L,
          "staging on a branch must not advance main")
        fastForward(s, root, "audit")
        dropBranch(s, root, "audit")
        require(currentSnapshot(s, root) == 2L,
          "publish must land as exactly one main commit")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    wapRoot(dir)
  }

  /** q237: WRITE-AUDIT-PUBLISH read back — the post-publish main
    * snapshot rolled up per lang. Oracle = the full raw table: green
    * iff the branch staged every odd row once, publish re-stamped them
    * all, and no base row duplicated through the rebase.
    */
  val q237SnapshotWap: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureWap(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))
  }

  // ---- the BIN-PACK store (q238): small-file maintenance ------------

  /** BinPack-store layout version. */
  private val BpLayout = 1L

  private[graft] def bpRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapbp")

  private val bpBuiltCache = new graft.SessionCache

  /** Seed the BIN-PACK fixture: one big commit (half the rows) then
    * four small ones (an eighth each — the burst-commit shape), then
    * [[binPack]] with a threshold between the two file sizes, so the
    * sixteen small files merge and the four big ones carry verbatim
    * (path identity pinned in SnapshotStoreSpec). Row-count thresholds
    * derive from the table size, so the build is SF-independent.
    */
  def ensureBinPacked(s: SparkSession, dir: String): String = {
    bpBuiltCache.getOrElseUpdate(s, dir) {
      val root = bpRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + BpLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        val n = docs.count()
        append(s, root, docs.filter(pmod(col("doc_id"), lit(2)) === 0))
        Seq(1L, 3L, 5L, 7L).foreach { r =>
          append(s, root, docs.filter(pmod(col("doc_id"), lit(8)) === r))
        }
        // big files ≈ n/8 rows, small ≈ n/32: the threshold separates
        binPack(s, root, minRows = math.max(2L, n / 16L),
          targetRows = math.max(2L, n / 8L))
        require(currentSnapshot(s, root) == 6L,
          "binPack must land as exactly one commit")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    bpRoot(dir)
  }

  /** q238: the BIN-PACKED table read back — rollup per lang with a
    * min, so a row lost (or duplicated) in the pack goes red. File-
    * level facts (big paths carried, small count shrunk) are pinned in
    * SnapshotStoreSpec; the oracle checks row invariance.
    */
  val q238SnapshotBinpack: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureBinPacked(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"))
      .orderBy(col("lang"))
  }

  // ---- the DELETE-FOLD store (q239): minor compaction ---------------

  /** Fold-store layout version. */
  private val FdLayout = 1L

  private[graft] def fdRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapfd")

  private val fdBuiltCache = new graft.SessionCache

  /** Seed the DELETE-FOLD fixture: the 2-commit seed, an equality
    * delete (doc_id % 15 = 0), a position delete (the q234 n_chars
    * window), then [[foldDeletes]] — so the current snapshot reads
    * with ZERO anti-joins while untouched files carried verbatim
    * (both pinned in SnapshotStoreSpec).
    */
  def ensureFolded(s: SparkSession, dir: String): String = {
    fdBuiltCache.getOrElseUpdate(s, dir) {
      val root = fdRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + FdLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        deleteKeys(s, root, docs.filter(pmod(col("doc_id"), lit(15)) === 0)
          .select("doc_id"))
        deleteWhere(s, root, col("n_chars").between(PdChLo, PdChHi))
        foldDeletes(s, root)
        require(currentSnapshot(s, root) == 5L,
          "foldDeletes must land as exactly one commit")
        require(!withKind(manifest(s, root, 5L))
          .filter(col("kind") =!= "data").head(1).nonEmpty,
          "foldDeletes must drop every delete file")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    fdRoot(dir)
  }

  /** q239: the FOLDED table read back — equality + position deletes
    * materialized into the affected data files, delete files gone.
    * Oracle = the raw table minus both delete predicates; green iff
    * the fold applied exactly the delete semantics the MOR read had.
    */
  val q239SnapshotDeleteFold: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureFolded(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** q240: STATS-DRIVEN SQL JOIN over the connector — the snapshot
    * table (range-pruned to a few files) joins the raw parquet table
    * by key in PLAIN SQL, and Catalyst AUTO-BROADCASTS the snapshot
    * side because the scan now reports manifest-derived statistics
    * (`SupportsReportStatistics`): pruned row count and on-disk bytes
    * scaled by the projection. Without reported stats a DSv2 relation
    * sizes as `defaultSizeInBytes` ≈ ∞ and can NEVER auto-broadcast —
    * at 100 TB that is the difference between a 2-minute broadcast
    * join and a full-table shuffle. The broadcast choice is pinned in
    * SnapshotTableSourceSpec; the oracle checks the join's rows.
    */
  val q240SnapshotSqlJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    val v = s"graft_snap_sqljoin_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView(v)
    graft.Engine.table(s, dir, "documents").createOrReplaceTempView(s"${v}_docs")
    s.sql(
      s"""SELECT d.lang AS lang, count(*) AS n_docs,
         |  sum(e.n_chars) AS sum_chars
         |FROM ${v}_docs e JOIN $v d ON e.doc_id = d.doc_id
         |WHERE d.doc_id BETWEEN 100 AND 250
         |GROUP BY d.lang ORDER BY lang""".stripMargin)
  }

  // ---- the SQL-MUTATED store (q243): UPDATE + MERGE INTO ------------

  /** SQL-mutation-store layout version. */
  private val SqLayout = 1L

  private[graft] def sqRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapsql")

  private val sqBuiltCache = new graft.SessionCache

  /** Seed the SQL-MUTATION fixture: the 2-commit seed, then a plain
    * SQL `UPDATE` (commit 3 — ranged, so manifest stats prune the
    * rewrite) and a plain SQL `MERGE INTO` (commit 4 — matched rows
    * re-set from the source, unmatched source rows inserted), both
    * through the connector's group-based copy-on-write row-level
    * protocol. No library call anywhere in the mutation path.
    */
  def ensureSqlMutated(s: SparkSession, dir: String): String = {
    sqBuiltCache.getOrElseUpdate(s, dir) {
      val root = sqRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + SqLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
        append(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 0))
        val tbl = catalogName(s, root)
        s.sql(
          s"""UPDATE $tbl SET n_chars = n_chars + 1000
             |WHERE doc_id BETWEEN 100 AND 250""".stripMargin)
        val srcView = s"graft_sql_merge_src_${math.abs(dir.hashCode)}"
        docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .unionByName(docs.filter(pmod(col("doc_id"), lit(17)) === 0)
            .withColumn("doc_id", col("doc_id") + 10000000L))
          .createOrReplaceTempView(srcView)
        s.sql(
          s"""MERGE INTO $tbl t USING $srcView s
             |ON t.doc_id = s.doc_id
             |WHEN MATCHED THEN UPDATE SET t.n_chars = s.n_chars + 5000
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        require(currentSnapshot(s, root) == 4L,
          "UPDATE and MERGE must land as one commit each")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    sqRoot(dir)
  }

  /** q243: the SQL-MUTATED table read back — the UPDATE's ranged
    * increment, the MERGE's matched re-set (overwriting the UPDATE on
    * `% 13` keys) and its inserted tail, all applied through plain SQL
    * row-level commits. The oracle replays the exact arithmetic.
    */
  val q243SnapshotSqlMutate: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureSqlMutated(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** Register the snapshot CATALOG (idempotent — constant values per
    * session) and return the (catalog-qualified) SQL name of a store.
    */
  private[graft] def catalogName(s: SparkSession, root: String): String = {
    val slash = root.lastIndexOf('/')
    val (base, name) = (root.substring(0, slash), root.substring(slash + 1))
    s.conf.set("spark.sql.catalog.graft_snap", "graft.sources.SnapshotCatalog")
    s.conf.set("spark.sql.catalog.graft_snap.base", base)
    s"graft_snap.`$name`"
  }

  /** q241: SQL TIME TRAVEL through the catalog — `VERSION AS OF 1` as
    * a plain SQL construct (no reader options anywhere): the
    * [[SnapshotCatalog]] resolves the version to the snapshot-1 table
    * and every connector capability (stats pruning, reported
    * statistics) rides along. Oracle = the initial-load predicate,
    * exactly q203's library-routed read.
    */
  val q241SnapshotSqlVersioned: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensure(s, dir)
    val tbl = catalogName(s, root)
    s.sql(
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
         |FROM $tbl VERSION AS OF 1
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  // ---- the BUCKETED PAIR (q244): storage-partitioned join -----------

  /** Bucketed-pair layout version. */
  private val BkLayout = 1L

  private[graft] def bkRoot(dir: String, side: String): String =
    StandingIndex.artifactRoot(dir, s"snapbk$side")

  private val bkBuiltCache = new graft.SessionCache

  /** Seed the BUCKETED PAIR: the documents table and a narrow per-doc
    * profile derived from it, both committed through [[appendBucketed]]
    * with the SAME (n, key) — the co-partitioned layout a 100 TB
    * platform maintains precisely so its fact-to-fact joins never
    * shuffle. SnapshotSpjSpec pins the zero-shuffle plan; q244's
    * oracle checks the joined rows.
    */
  def ensureBucketedPair(s: SparkSession, dir: String): (String, String) = {
    bkBuiltCache.getOrElseUpdate(s, dir) {
      val left = bkRoot(dir, "l")
      val right = bkRoot(dir, "r")
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + BkLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, left, sig) ||
        !StandingIndex.metaFresh(s, right, sig)) {
        val f = fs(s, left)
        f.delete(new Path(left), true)
        f.delete(new Path(right), true)
        val docs = graft.Engine.table(s, dir, "documents")
        appendBucketed(s, left, docs)
        appendBucketed(s, right, docs.select(col("doc_id"), col("lang"),
          (coalesce(col("n_chars"), lit(0L)) % 7L).as("band")))
        StandingIndex.writeMeta(s, left, sig)
        StandingIndex.writeMeta(s, right, sig)
      }
      s.emptyDataFrame
    }
    (bkRoot(dir, "l"), bkRoot(dir, "r"))
  }

  /** q244: STORAGE-PARTITIONED JOIN — two co-bucketed snapshot tables
    * join in plain SQL with ZERO shuffle on either side: both scans
    * report `KeyGroupedPartitioning(bucket(8, doc_id))`, the catalog's
    * V2 `bucket` function proves the transforms compatible, and Spark
    * aligns bucket i with bucket i directly. The zero-exchange plan is
    * pinned in SnapshotSpjSpec; the oracle here checks the join's rows
    * (bucketing must be semantically invisible).
    */
  val q244SnapshotSpj: (SparkSession, String) => DataFrame = (s, dir) => {
    val (left, right) = ensureBucketedPair(s, dir)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    val lt = catalogName(s, left)
    val rt = catalogName(s, right)
    s.sql(
      s"""SELECT r.band AS band, count(*) AS n_docs,
         |  sum(l.n_chars) AS sum_chars
         |FROM $lt l JOIN $rt r ON l.doc_id = r.doc_id
         |GROUP BY r.band ORDER BY band""".stripMargin)
  }

  // ---- the IDENTITY-PARTITIONED store (q245) -------------------------

  /** Identity-partition fixture layout version. */
  private val IpLayout = 1L

  private[graft] def ipRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapip")

  private val ipBuiltCache = new graft.SessionCache

  /** Seed the IDENTITY-PARTITIONED fixture: documents committed twice
    * through [[appendPartitioned]] on `lang` — so every partition
    * value's key group spans files from BOTH commits.
    */
  def ensurePartitioned(s: SparkSession, dir: String): String = {
    ipBuiltCache.getOrElseUpdate(s, dir) {
      val root = ipRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + IpLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        appendPartitioned(s, root,
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "lang")
        appendPartitioned(s, root,
          docs.filter(pmod(col("doc_id"), lit(2)) === 1), "lang")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    ipRoot(dir)
  }

  /** q245: PRE-PARTITIONED AGGREGATION — a per-lang rollup over the
    * identity-partitioned store runs WITHOUT an aggregation exchange:
    * the scan reports `KeyGroupedPartitioning(identity(lang))` (one
    * key group per partition value, resolvable with no function
    * catalog), which already satisfies the GROUP BY's clustered
    * distribution. At 100 TB this is the difference between a map-side
    * rollup and re-shuffling the corpus for every per-partition
    * report. The zero-exchange plan is pinned in SnapshotPartitionSpec;
    * the oracle checks the rollup's rows.
    */
  val q245SnapshotPartitioned: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensurePartitioned(s, dir)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    val tbl = catalogName(s, root)
    s.sql(
      s"""SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars,
         |  min(n_chars) AS min_chars
         |FROM $tbl GROUP BY lang ORDER BY lang""".stripMargin)
  }

  // ---- the COMPOSED store (q251): identity × bucket -----------------

  private val CxLayout = 1L
  private[graft] def cxRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapcomposed")
  private val cxBuiltCache = new graft.SessionCache

  /** Seed the COMPOSED fixture: two commits of `documents`, each
    * identity-partitioned on `lang` AND bucketed (8, doc_id) — both
    * claims recorded on every file, so the scan reports the
    * two-transform key grouping.
    */
  def ensureComposed(s: SparkSession, dir: String): String = {
    cxBuiltCache.getOrElseUpdate(s, dir) {
      val root = cxRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + CxLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        appendComposed(s, root,
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "lang", 8, "doc_id")
        appendComposed(s, root,
          docs.filter(pmod(col("doc_id"), lit(2)) === 1), "lang", 8, "doc_id")
        require(composedSpecOf(s, root, 2L).contains(("lang", 8, "doc_id")),
          "the composed fixture must carry both claims")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    cxRoot(dir)
  }

  /** q251: the COMPOSED identity × bucket layout — a partition-pruned
    * STORAGE-PARTITIONED self-join on (lang, doc_id) over the store
    * whose scan reports `KeyGroupedPartitioning(identity(lang),
    * bucket(8, doc_id))`: the join runs with ZERO exchanges on either
    * side (SnapshotComposedSpec pins the plan), and the same table's
    * per-lang rollup answers from manifest metadata. At 100 TB this is
    * a date-partitioned, id-bucketed fact table: pruned SPJs touch one
    * partition's buckets and still skip both exchanges. Oracle = the
    * self-join in closed form on the raw table.
    */
  val q251SnapshotComposed: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureComposed(s, dir)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val tbl = catalogName(s, root)
    s.sql(
      s"""SELECT a.lang AS lang, count(*) AS n_docs,
         |  sum(a.n_chars + b.n_chars) AS sum_chars
         |FROM $tbl a JOIN $tbl b
         |ON a.lang = b.lang AND a.doc_id = b.doc_id
         |WHERE a.lang IN ('en', 'de')
         |GROUP BY a.lang ORDER BY lang""".stripMargin)
  }

  // ---- the CTAS store (q246): pure-SQL table creation ---------------

  private val CtLayout = 1L
  private[graft] def ctRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapctas")
  private val ctBuiltCache = new graft.SessionCache

  /** Seed the CTAS fixture: the table is born from `CREATE TABLE … AS
    * SELECT` (DDL commit + data commit — no library call), then takes
    * an ordinary `INSERT INTO`, proving a SQL-born store is a full
    * citizen of the commit protocol.
    */
  def ensureCtas(s: SparkSession, dir: String): String = {
    ctBuiltCache.getOrElseUpdate(s, dir) {
      val root = ctRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + CtLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val v = s"graft_ctas_src_${math.abs(dir.hashCode)}"
        graft.Engine.table(s, dir, "documents").createOrReplaceTempView(v)
        val tbl = catalogName(s, root)
        s.sql(
          s"""CREATE TABLE $tbl AS
             |SELECT doc_id, text, lang, source, n_chars FROM $v
             |WHERE doc_id % 4 <> 0""".stripMargin)
        require(currentSnapshot(s, root) == 2L,
          "CTAS must land as DDL commit (empty snapshot 1) + data commit")
        s.sql(
          s"""INSERT INTO $tbl
             |SELECT doc_id, text, lang, source, n_chars FROM $v
             |WHERE doc_id % 4 = 0""".stripMargin)
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    ctRoot(dir)
  }

  /** q246: the SQL-BORN table read back — CREATE TABLE AS SELECT then
    * INSERT INTO, no library call anywhere in the lifecycle. Oracle =
    * the whole raw table (the two SQL commits partition it).
    */
  val q246SnapshotCtas: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureCtas(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  // ---- the MOR-deleted store (q247): SQL DELETE as a delete file ----

  private val MorSqlLayout = 1L
  private[graft] def morSqlRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmorsql")
  private val morSqlCache = new graft.SessionCache

  /** Seed the MERGE-ON-READ fixture: one data commit, then a plain SQL
    * `DELETE` under `spark.graft.snapshot.deleteMode = merge-on-read` —
    * the statement lands as ONE position-delete commit with every data
    * file carried by reference (zero rewrites; the build asserts it).
    */
  def ensureMorSqlDeleted(s: SparkSession, dir: String): String = {
    morSqlCache.getOrElseUpdate(s, dir) {
      val root = morSqlRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + MorSqlLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        append(s, root, graft.Engine.table(s, dir, "documents"))
        val dataBefore = withKind(manifest(s, root, 1L))
          .filter(col("kind") === "data")
          .select("path").collect().map(_.getString(0)).toSet
        val tbl = catalogName(s, root)
        s.conf.set(DeleteModeKey, "merge-on-read")
        try s.sql(s"DELETE FROM $tbl WHERE lang = 'de'")
        finally s.conf.unset(DeleteModeKey)
        require(currentSnapshot(s, root) == 2L,
          "the MOR DELETE must land as one commit")
        val m2 = withKind(manifest(s, root, 2L))
        val dataAfter = m2.filter(col("kind") === "data")
          .select("path").collect().map(_.getString(0)).toSet
        require(dataAfter == dataBefore,
          "merge-on-read must carry every data file by reference")
        require(m2.filter(col("kind") === "posdelete").count() > 0L,
          "the MOR DELETE must commit position-delete files")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    morSqlRoot(dir)
  }

  /** q247: the MOR-deleted table read back — the SQL DELETE's rows are
    * gone from every read route while ZERO data files were rewritten.
    * Oracle replays the predicate on the raw table.
    */
  val q247SnapshotMorDelete: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMorSqlDeleted(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  /** q248: METADATA-ANSWERED GROUP BY — the per-lang row count over
    * the identity-partitioned store answers from the manifest's
    * per-file (part_val, n_rows) alone: the pushed aggregation plans
    * ZERO data files (spec-pinned), the q232 move extended to groups.
    * At 100 TB this is a partition histogram for the cost of reading
    * a few thousand metadata rows.
    */
  val q248SnapshotMetaGroupBy: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensurePartitioned(s, dir)
    val v = s"graft_snap_metagb_${math.abs(dir.hashCode)}"
    s.read.format("graft.sources.SnapshotTableSource")
      .option("root", root).load().createOrReplaceTempView(v)
    s.sql(
      s"""SELECT lang, count(*) AS n_docs, min(doc_id) AS min_doc,
         |  max(doc_id) AS max_doc
         |FROM $v GROUP BY lang ORDER BY lang""".stripMargin)
  }

  // ---- the MOR-upserted stores (q249/q250): UPDATE/MERGE as deltas --

  private val MorUpdLayout = 1L
  private[graft] def morUpdRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmorupd")
  private val morUpdCache = new graft.SessionCache

  /** Seed the MERGE-ON-READ UPDATE fixture: one data commit, then a
    * plain SQL `UPDATE` under `spark.graft.snapshot.updateMode =
    * merge-on-read` — the statement lands as ONE delta commit (a
    * position-delete file for the touched rows' old identities plus a
    * post-image data file) with every pre-existing data file carried
    * by reference (zero rewrites; the build asserts it).
    */
  def ensureMorSqlUpdated(s: SparkSession, dir: String): String = {
    morUpdCache.getOrElseUpdate(s, dir) {
      val root = morUpdRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + MorUpdLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        append(s, root, graft.Engine.table(s, dir, "documents"))
        val dataBefore = withKind(manifest(s, root, 1L))
          .filter(col("kind") === "data")
          .select("path").collect().map(_.getString(0)).toSet
        // an isolated session carries the mode conf, so a concurrent
        // reader of the shared session never sees merge-on-read
        val ms = s.newSession()
        val tbl = catalogName(ms, root)
        ms.conf.set(UpdateModeKey, "merge-on-read")
        ms.sql(s"UPDATE $tbl SET n_chars = n_chars + 1000 WHERE lang = 'de'")
        require(currentSnapshot(s, root) == 2L,
          "the MOR UPDATE must land as one delta commit")
        val m2 = withKind(manifest(s, root, 2L))
        val dataAfter = m2.filter(col("kind") === "data")
          .select("path").collect().map(_.getString(0)).toSet
        require(dataBefore.subsetOf(dataAfter),
          "merge-on-read UPDATE must rewrite zero data files")
        require((dataAfter -- dataBefore).nonEmpty,
          "the post-image rows must land in new data files")
        require(m2.filter(col("kind") === "posdelete").count() > 0L,
          "the MOR UPDATE must commit position-delete files")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    morUpdRoot(dir)
  }

  /** q249: the MOR-updated table read back — the SQL UPDATE's
    * post-images serve from the delta commit's new files, the old
    * versions die by position delete, and ZERO data files were
    * rewritten. Oracle replays the SET arithmetic on the raw table.
    */
  val q249SnapshotMorUpdate: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMorSqlUpdated(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  private val MorMrgLayout = 1L
  private[graft] def morMrgRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "snapmormrg")
  private val morMrgCache = new graft.SessionCache

  /** Seed the MERGE-ON-READ MERGE INTO fixture: one data commit, then
    * one SQL `MERGE INTO` under `spark.graft.snapshot.mergeMode =
    * merge-on-read` applying the q223 CDC batch shape — `% 5` rows
    * updated (n_chars + 500), `% 13` rows cloned as inserts at
    * doc_id + 2,000,000 — as ONE delta commit, zero data rewrites
    * (asserted).
    */
  def ensureMorSqlMerged(s: SparkSession, dir: String): String = {
    morMrgCache.getOrElseUpdate(s, dir) {
      val root = morMrgRoot(dir)
      val sig = {
        val (n, sg) = snapSig(s, dir)
        (n, Math.floorMod(sg + MorMrgLayout, StandingIndex.SigMod))
      }
      if (!StandingIndex.metaFresh(s, root, sig)) {
        val f = fs(s, root)
        f.delete(new Path(root), true)
        val docs = graft.Engine.table(s, dir, "documents")
        append(s, root, docs)
        val dataBefore = withKind(manifest(s, root, 1L))
          .filter(col("kind") === "data")
          .select("path").collect().map(_.getString(0)).toSet
        // an isolated session carries the mode conf (and the session-
        // scoped source view), so a concurrent reader of the shared
        // session never sees merge-on-read. The CDC source is REBUILT
        // inside that session from the same deterministic recipe — a
        // native columnar plan; the old `createDataFrame(src.toJavaRDD)`
        // hop deserialized every row through the RDD boundary just to
        // move a view across sessions (VERDICT r17 next-round item 2).
        val ms = s.newSession()
        val docsMs = graft.Engine.table(ms, dir, "documents")
        val srcMs = docsMs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 500)
          .unionByName(docsMs.filter(col("doc_id") % 13 === 0)
            .withColumn("doc_id", col("doc_id") + 2000000L))
        val v = s"graft_mor_merge_src_${math.abs(dir.hashCode)}"
        srcMs.createOrReplaceTempView(v)
        val tbl = catalogName(ms, root)
        ms.conf.set(MergeModeKey, "merge-on-read")
        ms.sql(
          s"""MERGE INTO $tbl t USING $v s ON t.doc_id = s.doc_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        require(currentSnapshot(s, root) == 2L,
          "the MOR MERGE must land as one delta commit")
        val m2 = withKind(manifest(s, root, 2L))
        val dataAfter = m2.filter(col("kind") === "data")
          .select("path").collect().map(_.getString(0)).toSet
        require(dataBefore.subsetOf(dataAfter),
          "merge-on-read MERGE must rewrite zero data files")
        require(m2.filter(col("kind") === "posdelete").count() > 0L,
          "the MOR MERGE's matched updates need position deletes")
        StandingIndex.writeMeta(s, root, sig)
      }
      s.emptyDataFrame
    }
    morMrgRoot(dir)
  }

  /** q250: the MOR-merged table read back — one SQL MERGE INTO landed
    * matched updates AND not-matched inserts as a single delta commit
    * with zero data rewrites. Oracle = the same upsert in closed form
    * on the raw table (q211's semantics with q223's constants).
    */
  val q250SnapshotMorMerge: (SparkSession, String) => DataFrame = (s, dir) => {
    val root = ensureMorSqlMerged(s, dir)
    readSnapshot(s, root, currentSnapshot(s, root))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q203_snapshot_time_travel" -> q203SnapshotTimeTravel,
      "q204_snapshot_diff" -> q204SnapshotDiff,
      "q205_snapshot_agg" -> q205SnapshotAgg,
      "q206_snapshot_range" -> q206SnapshotRange,
      "q209_snapshot_delete" -> q209SnapshotDelete,
      "q210_snapshot_lifecycle" -> q210SnapshotLifecycle,
      "q211_snapshot_merge" -> q211SnapshotMerge,
      "q212_snapshot_evolution" -> q212SnapshotEvolution,
      "q218_snapshot_mv" -> q218SnapshotMv,
      "q222_snapshot_mv_incremental" -> q222SnapshotMvIncremental,
      "q223_snapshot_merge_join" -> q223SnapshotMergeJoin,
      "q224_snapshot_concurrent" -> q224SnapshotConcurrent,
      "q225_snapshot_change_feed" -> q225SnapshotChangeFeed,
      "q226_snapshot_mv_filtered" -> q226SnapshotMvFiltered,
      "q227_snapshot_zorder_read" -> q227SnapshotZRead,
      "q228_snapshot_restore" -> q228SnapshotRestore,
      "q229_snapshot_mor_delete" -> q229SnapshotMorDelete,
      "q230_snapshot_sql_read" -> q230SnapshotSqlRead,
      "q231_snapshot_sql_zread" -> q231SnapshotSqlZRead,
      "q232_snapshot_sql_agg" -> q232SnapshotSqlAgg,
      "q233_snapshot_sql_cat" -> q233SnapshotSqlCat,
      "q234_snapshot_pos_delete" -> q234SnapshotPosDelete,
      "q235_snapshot_tag_read" -> q235SnapshotTagRead,
      "q236_snapshot_dsv_write" -> q236SnapshotDsvWrite,
      "q237_snapshot_wap" -> q237SnapshotWap,
      "q238_snapshot_binpack" -> q238SnapshotBinpack,
      "q239_snapshot_delete_fold" -> q239SnapshotDeleteFold,
      "q240_snapshot_sql_join" -> q240SnapshotSqlJoin,
      "q241_snapshot_sql_versioned" -> q241SnapshotSqlVersioned,
      "q242_snapshot_stream_sink" -> q242SnapshotStreamSink,
      "q243_snapshot_sql_mutate" -> q243SnapshotSqlMutate,
      "q244_snapshot_spj" -> q244SnapshotSpj,
      "q245_snapshot_partitioned" -> q245SnapshotPartitioned,
      "q246_snapshot_ctas" -> q246SnapshotCtas,
      "q247_snapshot_mor_delete" -> q247SnapshotMorDelete,
      "q248_snapshot_meta_groupby" -> q248SnapshotMetaGroupBy,
      "q249_snapshot_mor_update" -> q249SnapshotMorUpdate,
      "q250_snapshot_mor_merge" -> q250SnapshotMorMerge,
      "q251_snapshot_composed" -> q251SnapshotComposed)

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
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q209_snapshot_delete" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id NOT BETWEEN 100 AND 250
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q210_snapshot_lifecycle" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id NOT BETWEEN 100 AND 250
        |GROUP BY source ORDER BY source""".stripMargin,
    "q211_snapshot_merge" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000
        |    ELSE n_chars END AS n_chars FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars FROM documents WHERE doc_id % 11 = 0
        |) GROUP BY lang ORDER BY lang""".stripMargin,
    "q212_snapshot_evolution" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 3 = 0 THEN n_chars % 100
        |    ELSE -1 END) AS BIGINT) AS sum_quality
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q218_snapshot_mv" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q222_snapshot_mv_incremental" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(n_chars) AS BIGINT) AS n_facts,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q223_snapshot_merge_join" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, CASE WHEN doc_id % 5 = 0 THEN n_chars + 500
        |    ELSE n_chars END AS n_chars FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars FROM documents WHERE doc_id % 13 = 0
        |) GROUP BY lang ORDER BY lang""".stripMargin,
    "q224_snapshot_concurrent" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q225_snapshot_change_feed" ->
      """SELECT change_type, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT 'update' AS change_type, n_chars + 1000 AS chars
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT 'insert', n_chars FROM documents WHERE doc_id % 11 = 0
        |) GROUP BY change_type ORDER BY change_type""".stripMargin,
    "q226_snapshot_mv_filtered" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY source ORDER BY source""".stripMargin,
    "q227_snapshot_zorder_read" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id BETWEEN $ZIdLo AND $ZIdHi
        |  AND n_chars BETWEEN $ZChLo AND $ZChHi
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q228_snapshot_restore" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q229_snapshot_mor_delete" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 9 <> 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q230_snapshot_sql_read" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 250
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q231_snapshot_sql_zread" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id BETWEEN $ZIdLo AND $ZIdHi
        |  AND n_chars BETWEEN $ZChLo AND $ZChHi
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q232_snapshot_sql_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents""".stripMargin,
    "q233_snapshot_sql_cat" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'de'
        |GROUP BY source ORDER BY source""".stripMargin,
    "q234_snapshot_pos_delete" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars NOT BETWEEN $PdChLo AND $PdChHi
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q235_snapshot_tag_read" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q236_snapshot_dsv_write" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q237_snapshot_wap" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q238_snapshot_binpack" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q239_snapshot_delete_fold" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id % 15 <> 0
        |  AND (n_chars IS NULL OR n_chars NOT BETWEEN $PdChLo AND $PdChHi)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q240_snapshot_sql_join" ->
      """SELECT d.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(e.n_chars) AS BIGINT) AS sum_chars
        |FROM documents e JOIN documents d ON e.doc_id = d.doc_id
        |WHERE d.doc_id BETWEEN 100 AND 250
        |GROUP BY d.lang ORDER BY lang""".stripMargin,
    "q241_snapshot_sql_versioned" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 3 <> 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q242_snapshot_stream_sink" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q243_snapshot_sql_mutate" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ch) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, CASE WHEN doc_id % 13 = 0 THEN n_chars + 5000
        |    WHEN doc_id BETWEEN 100 AND 250 THEN n_chars + 1000
        |    ELSE n_chars END AS ch FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars FROM documents WHERE doc_id % 17 = 0
        |) GROUP BY lang ORDER BY lang""".stripMargin,
    "q244_snapshot_spj" ->
      """SELECT r.band AS band, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(l.n_chars) AS BIGINT) AS sum_chars
        |FROM documents l JOIN (
        |  SELECT doc_id, COALESCE(n_chars, 0) % 7 AS band FROM documents
        |) r ON l.doc_id = r.doc_id
        |GROUP BY r.band ORDER BY band""".stripMargin,
    "q245_snapshot_partitioned" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q246_snapshot_ctas" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q247_snapshot_mor_delete" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IS NULL OR lang <> 'de'
        |GROUP BY source ORDER BY source""".stripMargin,
    "q248_snapshot_meta_groupby" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q249_snapshot_mor_update" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN lang = 'de' THEN n_chars + 1000
        |    ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q250_snapshot_mor_merge" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (
        |  SELECT lang, CASE WHEN doc_id % 5 = 0 THEN n_chars + 500
        |    ELSE n_chars END AS n_chars FROM documents
        |  UNION ALL
        |  SELECT lang, n_chars FROM documents WHERE doc_id % 13 = 0
        |) GROUP BY lang ORDER BY lang""".stripMargin,
    "q251_snapshot_composed" ->
      """SELECT a.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(a.n_chars + b.n_chars) AS BIGINT) AS sum_chars
        |FROM documents a JOIN documents b
        |ON a.lang = b.lang AND a.doc_id = b.doc_id
        |WHERE a.lang IN ('en', 'de')
        |GROUP BY a.lang ORDER BY lang""".stripMargin)
}
