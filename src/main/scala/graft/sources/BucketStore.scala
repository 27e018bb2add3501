package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed-table store — the co-located-join layout as a STANDING
  * ARTIFACT.
  *
  * A fact⋈fact equi-join (lineitem ⋈ orders on orderkey) shuffles both
  * sides on every execution; at 100 TB the repeated shuffle of the big
  * probe side IS the cost of the query family. The lakehouse answer is
  * to pay the shuffle ONCE: write both tables hash-bucketed (and
  * per-bucket sorted) on the join key, and every subsequent join plans
  * with ZERO exchanges on the join inputs — Catalyst recognizes the
  * bucket spec as a satisfied HashClusteredDistribution and the
  * per-bucket sort as a satisfied ordering, so the SortMergeJoin needs
  * neither Exchange nor Sort (BucketStoreSpec pins both elisions).
  * Point lookups on the bucket key prune to ONE bucket
  * (`SelectedBucketsCount: 1 out of N` — 1/N of the store scanned
  * before any row-group pruning).
  *
  * Artifact discipline (the q156/q165/jpstats meta-row pattern): the
  * bucketed FILES outlive the process under a signature-validated
  * artifact root, but bucket METADATA lives in the session catalog,
  * which dies with the JVM — so `ensure` has two reuse tiers:
  *   1. signature fresh + table registered  → nothing to do;
  *   2. signature fresh + catalog empty (a NEW session over a stored
  *      artifact) → re-register the existing files with
  *      `CREATE TABLE … USING PARQUET CLUSTERED BY … LOCATION` — a
  *      metadata-only DDL, no data movement (BucketStoreSpec proves
  *      the mtime witness stays put and the join stays exchange-free);
  *   3. signature stale/missing → rewrite both tables, meta row LAST.
  *
  * The one-file-per-bucket invariant: each table is
  * `repartition(numBuckets, key)`-exchanged before the bucketed write.
  * Spark's bucket id is `pmod(murmur3(key), N)` — the SAME function
  * HashPartitioning uses — so task i holds exactly bucket i's rows and
  * writes exactly one file. That invariant is what lets the scan
  * declare its per-bucket sort order (multi-file buckets forfeit it)
  * and keeps the join sort-free.
  */
object BucketStore {

  /** Target on-disk bytes per bucket file — the standard "one healthy
    * task per bucket" sizing (HDFS-block-ish). The bucket count
    * derives as ceil(largest_family_table_bytes / this), floored at
    * [[MinBuckets]] (VERDICT r12 item 5: the former constant 16 was
    * fixture-tuned; a 10 TB lineitem now gets ~80k buckets instead of
    * 16 multi-hundred-GB ones). One count per co-located FAMILY —
    * derived from the family's LARGEST table — because both sides of
    * a co-located join must agree on it.
    */
  val TargetBucketBytes: Long = 128L * 1024 * 1024

  /** Floor on the derived bucket count (the fixture-scale value: every
    * gate corpus is far below one target-bucket of bytes).
    */
  val MinBuckets = 16

  /** The derived bucket count for a family of tables under `dir`. */
  private[graft] def numBuckets(s: SparkSession, dir: String,
      tables: Seq[String]): Int = {
    val maxBytes = tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }.max
    math.max(MinBuckets,
      math.ceil(maxBytes.toDouble / TargetBucketBytes).toInt)
  }

  /** The q189 family's bucket count (spec hook: the
    * SelectedBucketsCount assertion needs the derived value).
    */
  def numBucketsFor(s: SparkSession, dir: String): Int =
    numBuckets(s, dir, Tables.map(_._1))

  /** (fixture table, bucket/sort key) — the co-located join family. */
  val Tables: Seq[(String, String)] =
    Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey")

  /** Bucket-store layout version, folded into the signature. Bumped
    * to 2 when the bucket count became bytes-derived (the count itself
    * is folded into the signature too, so a count change — target
    * resize, table growth past a bucket boundary — rebuilds).
    */
  private val BktLayout = 2L

  private[graft] def bktRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "bkt")

  /** Catalog names carry the corpus key so two sf dirs never collide
    * in one session's catalog.
    */
  private[graft] def tableName(dir: String, t: String): String = {
    val key = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    s"graft_bkt_${t}_$key"
  }

  private[graft] def bktSig(s: SparkSession, dir: String, nb: Int): (Long, Long) = {
    val M = StandingIndex.SigMod
    val per = Tables.map { case (t, _) =>
      val (n, sg) = StandingIndex.tableSig(s, dir, t,
        graft.Engine.table(s, dir, t).columns.toSeq)
      (n, Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(t).toLong + sg, M))
    }
    (per.map(_._1).sum,
      Math.floorMod(per.map(_._2).sum + BktLayout + nb.toLong, M))
  }

  private val builtCache = new graft.SessionCache

  /** Make both bucketed tables available in this session's catalog,
    * reusing stored files when the corpus signature matches.
    */
  def ensureBucketed(s: SparkSession, dir: String): Unit =
    builtCache.getOrElseUpdate(s, dir) {
      ensureBucketedValidated(s, dir); s.emptyDataFrame
    }

  /** The validation+registration step a NEW session runs (spec hook). */
  private[graft] def ensureBucketedValidated(s: SparkSession, dir: String): Unit = {
    val root = bktRoot(dir)
    val nb = numBucketsFor(s, dir)
    val sig = bktSig(s, dir, nb)
    if (!StandingIndex.metaFresh(s, root, sig)) {
      Tables.foreach { case (t, key) =>
        val tn = tableName(dir, t)
        s.sql(s"DROP TABLE IF EXISTS $tn")
        deleteDir(new java.io.File(s"$root/$t"))
        // repartition on the key with numPartitions == numBuckets:
        // partition id == bucket id (same murmur3-pmod function), so
        // each task writes its one bucket's one file
        graft.Engine.table(s, dir, t)
          .repartition(nb, col(key))
          .write.mode("overwrite")
          .option("path", s"$root/$t")
          .bucketBy(nb, key).sortBy(key)
          .saveAsTable(tn)
      }
      // meta LAST: a crashed build can never validate as fresh
      StandingIndex.writeMeta(s, root, sig)
    } else Tables.foreach { case (t, key) =>
      val tn = tableName(dir, t)
      if (!s.catalog.tableExists(tn)) {
        // new session over a stored artifact: metadata-only
        // re-registration of the existing bucketed files. The derived
        // nb matches the stored files: a fresh signature implies the
        // same table bytes, hence the same derived count.
        val ddl = s.read.parquet(s"$root/$t").schema.toDDL
        s.sql(s"""CREATE TABLE $tn ($ddl) USING PARQUET
                 |CLUSTERED BY ($key) SORTED BY ($key)
                 |INTO $nb BUCKETS
                 |LOCATION '$root/$t'""".stripMargin)
      }
    }
  }

  private def deleteDir(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteDir))
    f.delete()
  }

  /** Exact decimal sum emitted as double (oracle parity — the
    * Relational.dsum convention).
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(12, 2))).cast("double")

  /** q189: the co-located join itself — lineitem ⋈ orders on orderkey
    * over the bucketed store, aggregated per order priority. Result is
    * IDENTICAL to the plain parquet join (the oracle is the verbatim
    * raw-table SQL — bucketing is layout-only); what changes is the
    * plan: zero exchanges and zero sorts under the join
    * (BucketStoreSpec), vs a full shuffle+sort of BOTH sides every run
    * without the store. The one aggregation exchange that remains moves
    * |priorities| rows.
    */
  val q189BucketedJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    ensureBucketed(s, dir)
    val li = s.table(tableName(dir, "lineitem"))
    val ord = s.table(tableName(dir, "orders"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  // ---- q194: the ADVISED layout, built and executed ---------------

  /** Artifact root for the advice-chosen layout (separate from the
    * q189 orderkey store — different keys, different files).
    */
  private[graft] def advRoot(dir: String): String =
    StandingIndex.artifactRoot(dir, "bktadv")

  private[graft] def advTableName(dir: String, t: String): String = {
    val key = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    s"graft_bktadv_${t}_$key"
  }

  /** The advised join: q191's co-located recommendation with the most
    * saved bytes per run (ties break by join_name — deterministic).
    * Returns (join_name, left_rel, left_key, right_rel, right_key).
    */
  private[graft] def advisedJoin(s: SparkSession, dir: String)
      : (String, String, String, String, String) = {
    val keys = graft.operators.JoinPlanner.JoinCandidates
      .map { case (n, lr, lk, rr, rk) => n -> ((lr, lk, rr, rk)) }.toMap
    val best = graft.operators.JoinPlanner.q191BucketAdvice(s, dir)
      .filter(col("colocated_left") === 1 && col("colocated_right") === 1)
      .orderBy(col("saved_bytes_run").desc, col("join_name"))
      .select(col("join_name")).head().getString(0)
    val (lr, lk, rr, rk) = keys(best)
    (best, lr, lk, rr, rk)
  }

  private val advCache = new graft.SessionCache

  /** Build (or reuse) the bucketed layout the PLANNER chose: the
    * distinct (table, key) sides of [[advisedJoin]], written with the
    * same one-file-per-bucket discipline as the q189 store under a
    * signature-validated root. The engine picks its own layout — the
    * q180 loop-closure discipline applied to q191.
    *
    * The advice pipeline (q191 over the stats artifact) runs INSIDE
    * the per-(session, dir) cache alongside the build latch, so repeat
    * q194 executions skip the advice recomputation too, not just the
    * store build (ADVICE r12) — the cached value is the advised tuple
    * itself, held as a local one-row frame so it rides the standard
    * SessionCache eviction.
    */
  def ensureAdvised(s: SparkSession, dir: String)
      : (String, String, String, String, String) = {
    val row = advCache.getOrElseUpdate(s, dir) {
      val adv = advisedJoin(s, dir)
      ensureAdvisedValidated(s, dir, adv)
      import s.implicits._
      Seq(adv).toDF("join_name", "lr", "lk", "rr", "rk")
    }.head()
    (row.getString(0), row.getString(1), row.getString(2),
      row.getString(3), row.getString(4))
  }

  private[graft] def ensureAdvisedValidated(s: SparkSession, dir: String,
      adv: (String, String, String, String, String)): Unit = {
    val (_, lr, lk, rr, rk) = adv
    val sides = Seq(lr -> lk, rr -> rk).distinct
    val root = advRoot(dir)
    // signature covers the advised side tables AND the advice inputs'
    // layout version (a changed advice algebra must rebuild)
    val M = StandingIndex.SigMod
    val per = sides.map { case (t, k) =>
      val (n, sg) = StandingIndex.tableSig(s, dir, t,
        graft.Engine.table(s, dir, t).columns.toSeq)
      (n, Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(s"$t:$k").toLong + sg, M))
    }
    val nb = numBuckets(s, dir, sides.map(_._1))
    val sig = (per.map(_._1).sum,
      Math.floorMod(per.map(_._2).sum + BktLayout + nb.toLong, M))
    if (!StandingIndex.metaFresh(s, root, sig)) {
      sides.foreach { case (t, k) =>
        val tn = advTableName(dir, t)
        s.sql(s"DROP TABLE IF EXISTS $tn")
        deleteDir(new java.io.File(s"$root/$t"))
        graft.Engine.table(s, dir, t)
          .repartition(nb, col(k))
          .write.mode("overwrite")
          .option("path", s"$root/$t")
          .bucketBy(nb, k).sortBy(k)
          .saveAsTable(tn)
      }
      StandingIndex.writeMeta(s, root, sig)
    } else sides.foreach { case (t, k) =>
      val tn = advTableName(dir, t)
      if (!s.catalog.tableExists(tn)) {
        val ddl = s.read.parquet(s"$root/$t").schema.toDDL
        s.sql(s"""CREATE TABLE $tn ($ddl) USING PARQUET
                 |CLUSTERED BY ($k) SORTED BY ($k)
                 |INTO $nb BUCKETS
                 |LOCATION '$root/$t'""".stripMargin)
      }
    }
  }

  /** q194: the WHOLE planner loop as one query — statistics (q179's
    * ANALYZE store) → layout advice (q191's argmax) → the layout
    * BUILT (bucketed store on the advised keys, signature-reused
    * across sessions) → the advised join EXECUTED over it. On the
    * fixture catalog the advice is the l_partkey self-join, so this
    * runs lineitem ⋈ lineitem on l_partkey co-located: zero exchanges
    * and zero sorts under the SMJ (BucketAdviceSpec pins the plan),
    * per-key pair counts aggregated per return-flag pair. The oracle
    * is the verbatim raw-table self-join — layout, like planning, is
    * answer-invariant; only the PLAN changes. The store build follows
    * whatever the advice says; the QUERY's aggregate (and its static
    * oracle SQL) pin the fixture-stable choice — BucketAdviceSpec
    * proves li_self_partkey co-locates at every gate SF — and the
    * require below fails LOUDLY if a regenerated corpus ever shifts
    * the argmax, so a stale oracle can never silently pass.
    */
  val q194AdvisedJoin: (SparkSession, String) => DataFrame = (s, dir) => {
    val adv @ (name, lr, lk, rr, rk) = ensureAdvised(s, dir)
    require(name == "li_self_partkey" && lr == "lineitem" && lk == "l_partkey",
      s"q194's oracle pins the li_self_partkey advice; the planner now " +
        s"advises $adv — update the oracle SQL alongside")
    val a = s.table(advTableName(dir, lr)).alias("a")
    val b = s.table(advTableName(dir, rr)).alias("b")
    a.join(b, col(s"a.$lk") === col(s"b.$rk"))
      .groupBy(col("a.l_returnflag").as("flag_a"),
        col("b.l_returnflag").as("flag_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("flag_a"), col("flag_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q189_bucketed_join" -> q189BucketedJoin,
      "q194_advised_join" -> q194AdvisedJoin)

  val oracles: Map[String, String] = Map(
    "q189_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // q194: the raw-table replay of the ADVISED join (li_self_partkey
    // — pinned by the require in the query body)
    "q194_advised_join" ->
      """SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
