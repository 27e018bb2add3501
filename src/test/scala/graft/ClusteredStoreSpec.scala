package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ClusteredStore, TrainingShards}

/** q190 — zone-map file skipping over the range-clustered store, and
  * the layout contrast that justifies its existence: the SAME zone
  * stats computed over the hash-bucketed shard store can skip nothing,
  * because hash placement spreads every value range over every file.
  */
class ClusteredStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FileSourceScanExec]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => out += f; f.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  test("q190 reads only surviving zones and equals the full-scan filter") {
    val df = ClusteredStore.q190ZonePrunedScan(spark, dir)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    val root = ClusteredStore.clsRoot(dir)
    val zoneDirs = Option(new java.io.File(s"$root/data").listFiles())
      .getOrElse(Array.empty).count(f => f.isDirectory && f.getName.startsWith("zid="))
    val survivors = ClusteredStore.survivingZones(
      spark, root, ClusteredStore.Lo, ClusteredStore.Hi)
    assert(zoneDirs == ClusteredStore.ZoneParts,
      s"expected ${ClusteredStore.ZoneParts} zone dirs, found $zoneDirs")
    assert(survivors.nonEmpty && survivors.size < zoneDirs,
      s"window [${ClusteredStore.Lo},${ClusteredStore.Hi}] must prune " +
        s"some but not all zones; survivors=$survivors")

    // the executed scan listed only the surviving directories
    val scan = scans(df).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(root))).head
    val partsRead = scan.metrics("numPartitions").value
    assert(partsRead == survivors.size,
      s"scan read $partsRead partitions, zone map kept ${survivors.size}")

    // value equality against the raw full-scan filter
    val want = Engine.table(spark, dir, "documents")
      .filter(col("n_chars").between(ClusteredStore.Lo, ClusteredStore.Hi))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("zone stats describe the written files exactly") {
    val root = ClusteredStore.ensureClustered(spark, dir)
    val stored = spark.read.parquet(s"$root/zones")
      .collect().map(r => (r.getAs[Int]("zid"), r.getAs[Long]("min_chars"),
        r.getAs[Long]("max_chars"), r.getAs[Long]("n_docs"))).sorted.toSeq
    val recomputed = spark.read.parquet(s"$root/data")
      .groupBy(col("zid"))
      .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Int]("zid"), r.getAs[Long]("mn"),
        r.getAs[Long]("mx"), r.getAs[Long]("n"))).sorted.toSeq
    assert(stored == recomputed && stored.nonEmpty)
    // zones are genuinely value-disjoint by construction (equi-depth
    // boundaries): each zone's min exceeds the previous zone's max
    stored.sliding(2).foreach {
      case Seq((_, _, mxA, _), (_, mnB, _, _)) => assert(mxA <= mnB)
      case _ =>
    }
    // and no zone is lost: counts sum to the corpus
    assert(stored.map(_._4).sum ==
      Engine.table(spark, dir, "documents").count())
  }

  test("q193 compaction cuts file count, preserves content, and leaves zone stats intact") {
    // a PRIVATE store, deliberately fragmented (5-way repartition →
    // up to 5 files per zone) the way parallel writers fragment a real
    // table; the shared fixture store is born compact at this SF
    val d = java.nio.file.Files.createTempDirectory("graft_cmp_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(s"$d/documents.parquet"))
    val root = ClusteredStore.ensureClustered(spark, d)
    val frag = spark.read.parquet(s"$root/data")
    frag.repartition(5).write.mode("overwrite")
      .partitionBy("zid").parquet(s"$root/data_frag")
    // swap the fragmented layout in (content identical, layout worse)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(s"$root/data"))
    new java.io.File(s"$root/data_frag").renameTo(new java.io.File(s"$root/data"))

    def parquetFiles(p: String): Seq[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Nil
      walk(new java.io.File(p))
    }
    val before = parquetFiles(s"$root/data").size
    assert(before > ClusteredStore.ZoneParts, s"fragmentation setup failed: $before files")
    val manifest = ClusteredStore.compactStore(spark, root).collect()
    val after = parquetFiles(s"$root/compact").size
    assert(after == manifest.map(_.getLong(3)).sum,
      "manifest files_after must count the physical files")
    assert(after < before,
      s"compaction did not reduce files: $before -> $after")
    // content multiset preserved (doc_id + n_chars both ways)
    val a = spark.read.parquet(s"$root/data")
      .select(col("doc_id"), col("n_chars"))
    val c = spark.read.parquet(s"$root/compact")
      .select(col("doc_id"), col("n_chars"))
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
    // zone stats carry forward untouched: per-zid min/max/count equal
    def stats(p: String) = spark.read.parquet(p)
      .groupBy(col("zid").cast("long"))
      .agg(min(col("n_chars")), max(col("n_chars")), count(lit(1)))
      .collect().map(_.toString).sorted.toSeq
    assert(stats(s"$root/data") == stats(s"$root/compact"))
  }

  test("degenerate value distributions keep the layout total and the pruning decision exact") {
    import spark.implicits._
    // constant n_chars: every kmv boundary collapses to the same value
    // → one zone holds everything, the rest are empty — the assignment
    // must stay TOTAL (every doc placed) and zone stats must still
    // describe the placement
    val const = (1L to 200L).map(i => (i, 57L)).toDF("doc_id", "n_chars")
    val cAsg = ClusteredStore.assignZones(const, ClusteredStore.boundariesOf(const))
    assert(cAsg.count() == 200L)
    val cZones = cAsg.groupBy(col("zid")).count().collect()
    assert(cZones.length == 1, s"constant corpus must land in one zone: ${cZones.toSeq}")
    // every boundary equals 57; n_chars > 57 is false everywhere → zid 0
    assert(cZones.head.getInt(0) == 0)

    // Zipf-ish: half the corpus shares one hot length → the hot value
    // spans adjacent boundary slots; zones stay value-disjoint and a
    // window EXCLUDING the hot value prunes the hot mass
    val zipf = ((1L to 500L).map(i => (i, 300L)) ++
      (501L to 1000L).map(i => (i, (i % 400) + 50))).toDF("doc_id", "n_chars")
    val zAsg = ClusteredStore.assignZones(zipf, ClusteredStore.boundariesOf(zipf))
    assert(zAsg.count() == 1000L)
    val zStats = zAsg.groupBy(col("zid"))
      .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
        count(lit(1)).as("n"))
      .collect().sortBy(_.getInt(0))
    // zones value-disjoint even with the hot value repeated across
    // boundary slots
    zStats.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("mx") <= b.getAs[Long]("mn"))
      case _ =>
    }
    // a window strictly below the hot value never touches the hot zone
    val hotZids = zStats.filter(r => r.getAs[Long]("mn") <= 300L &&
      300L <= r.getAs[Long]("mx")).map(_.getInt(0)).toSet
    val loZids = zStats.filter(r => !(r.getAs[Long]("mx") < 60L ||
      r.getAs[Long]("mn") > 200L)).map(_.getInt(0)).toSet
    assert((loZids & hotZids).forall(z =>
      zStats.find(_.getInt(0) == z).exists(_.getAs[Long]("mn") <= 200L)),
      s"pruning decision must stay interval-exact: lo=$loZids hot=$hotZids")
    // and the pruned read equals the brute filter
    val want = zipf.filter(col("n_chars").between(60, 200)).count()
    val got = zAsg.filter(col("zid").isin(loZids.toSeq: _*))
      .filter(col("n_chars").between(60, 200)).count()
    assert(got == want && want > 0)
  }

  test("the hash-bucketed shard store cannot skip on the same predicate") {
    val out = TrainingShards.ensureShards(spark, dir)
    // per-(lang,bucket) file stats over the REAL shard files
    val fileStats = TrainingShards.readBack(spark, out)
      .groupBy(col("lang"), col("bucket"))
      .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
      .collect()
    assert(fileStats.length >= 30)
    // hash placement spreads the value range over every file: almost
    // nothing is skippable (a few ~10-row buckets can miss the window
    // by chance at sf0.001 — that's sampling noise, not clustering)
    val skippable = fileStats.count(r =>
      r.getAs[Long]("mx") < ClusteredStore.Lo ||
        r.getAs[Long]("mn") > ClusteredStore.Hi)
    val hashSkipFrac = skippable.toDouble / fileStats.length
    assert(hashSkipFrac < 0.25,
      s"$skippable/${fileStats.length} shard files skippable — hash store unexpectedly clustered")
    // while the clustered store skips the MAJORITY of its zones on the
    // same predicate — layout is what turns file stats into skipping
    val root = ClusteredStore.ensureClustered(spark, dir)
    val survivors = ClusteredStore.survivingZones(
      spark, root, ClusteredStore.Lo, ClusteredStore.Hi)
    val clusteredSkipFrac =
      1.0 - survivors.size.toDouble / ClusteredStore.ZoneParts
    assert(clusteredSkipFrac > 0.5 && clusteredSkipFrac > 2 * hashSkipFrac,
      s"clustered store skipped $clusteredSkipFrac vs hash $hashSkipFrac")
  }
}
