package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SimIndex, StandingIndex}

/** Cross-session artifact reuse (VERDICT r11 item 1): a standing
  * artifact whose stored corpus signature matches the current corpus is
  * REUSED — no rebuild — while any corpus change (and any partial build,
  * which by the meta-last discipline has no valid signature) forces the
  * rebuild the old rebuild-always scheme guaranteed.
  *
  * "New session" is replayed via the `ensureValidated` hooks (the exact
  * step a fresh session's first lookup runs, minus the per-session
  * latch), against a PRIVATE tmp corpus this spec owns, so it can
  * regenerate the fixture the way the driver would — the
  * EngineResilienceSpec lesson applied at artifact granularity.
  */
class ArtifactReuseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  /** Newest mtime of any regular file under root (0 if absent) — the
    * rebuild witness: an untouched artifact keeps its newest mtime.
    */
  private def newestMtime(root: String): Long = {
    val p = Paths.get(root)
    if (!Files.exists(p)) 0L
    else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
      .map(Files.getLastModifiedTime(_).toMillis).foldLeft(0L)(math.max)
  }

  /** A private copy of the sf0.001 documents corpus this spec may
    * regenerate.
    */
  private def mkCorpus(): String = {
    val d = Files.createTempDirectory("graft_reuse_").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      Paths.get(s"$d/documents.parquet"))
    Files.copy(Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      Paths.get(s"$d/embeddings.parquet"))
    d
  }

  /** Replace the corpus with a one-doc-edited regen (doc 1 gains a
    * suffix) — the smallest change a content signature must catch.
    */
  private def poisonCorpus(dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") === 1L, concat(col("text"), lit(" POISON")))
          .otherwise(col("text")))
      .collect()
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val regen = spark.createDataFrame(
      new java.util.ArrayList(docs.toSeq.asJava), schema)
    Files.delete(Paths.get(s"$dir/documents.parquet"))
    regen.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
  }

  test("positional index: matching signature reuses; edited corpus rebuilds") {
    val dir = mkCorpus()
    val root = StandingIndex.indexRoot(dir)
    StandingIndex.ensureValidated(spark, dir) // session 1: builds
    val built = newestMtime(root)
    assert(built > 0L)
    val lookupBefore = StandingIndex.bm25Lookup(spark, root)
      .collect().map(_.toString).toSeq
    Thread.sleep(1100)
    StandingIndex.ensureValidated(spark, dir) // session 2: must reuse
    assert(newestMtime(root) == built,
      "fresh artifact was rebuilt instead of reused")
    // the reused artifact answers identically
    assert(StandingIndex.bm25Lookup(spark, root)
      .collect().map(_.toString).toSeq == lookupBefore)
    poisonCorpus(dir)
    Thread.sleep(1100)
    StandingIndex.ensureValidated(spark, dir) // session 3: must rebuild
    assert(newestMtime(root) > built,
      "edited corpus did not trigger a rebuild")
    // and the rebuilt artifact is self-consistent: stored manifest ==
    // manifest recomputed from the regenerated raw corpus
    val stored = StandingIndex.manifestOf(
      StandingIndex.readPostings(spark, root))
    val fromRaw = StandingIndex.manifestOf(StandingIndex.postingsOf(
      Engine.table(spark, dir, "documents")
        .withColumn("tok", expr(graft.operators.LlmOps.toksS))))
    assert(Canonical.hash(stored) == Canonical.hash(fromRaw))
  }

  test("incremental artifact: reuse follows the same signature") {
    val dir = mkCorpus()
    val incRoot = StandingIndex.ensureIncremental(spark, dir)
    val built = newestMtime(incRoot)
    assert(built > 0L)
    Thread.sleep(1100)
    // replay a new session's validation directly (the latch would
    // short-circuit in this one)
    val sig = StandingIndex.corpusSig(spark, dir)
    assert(StandingIndex.metaFresh(spark, incRoot, sig),
      "incremental artifact must carry a fresh meta row")
    poisonCorpus(dir)
    assert(!StandingIndex.metaFresh(spark, incRoot,
      StandingIndex.corpusSig(spark, dir)),
      "signature must flip when the corpus changes")
  }

  test("ivf quantizer artifact: reuse on match; edited embeddings rebuild") {
    import graft.operators.LlmOps
    val dir = mkCorpus()
    val root = LlmOps.ensureIvfArtifact(spark, dir) // session 1: builds
    val built = newestMtime(root)
    assert(built > 0L)
    val cents = spark.read.parquet(s"$root/centroids")
      .collect().map(_.toString).sorted.toSeq
    assert(cents.nonEmpty)
    Thread.sleep(1100)
    LlmOps.ensureIvfArtifact(spark, dir) // session 2: must reuse
    assert(newestMtime(root) == built,
      "fresh quantizer was retrained instead of reused")
    // poison ONE float of ONE embedding — the content signature (over
    // vec_id + the full vector) must flip and retrain
    val e = spark.read.parquet(s"$dir/embeddings.parquet").collect()
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val edited = e.map { r =>
      if (r.getLong(0) == 0L) {
        val v = r.getSeq[Float](1).toArray
        v(0) = v(0) + 1.0f
        org.apache.spark.sql.Row(r.getLong(0), v.toSeq, r.get(2))
      } else r
    }
    val regen = spark.createDataFrame(
      new java.util.ArrayList(edited.toSeq.asJava), schema)
    Files.delete(Paths.get(s"$dir/embeddings.parquet"))
    regen.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    Thread.sleep(1100)
    LlmOps.ensureIvfArtifact(spark, dir) // session 3: must retrain
    assert(newestMtime(root) > built,
      "edited embeddings did not trigger a quantizer retrain")
  }

  test("sim index: reuse on match; missing meta (partial build) rebuilds") {
    val dir = mkCorpus()
    val root = SimIndex.indexRoot(dir)
    SimIndex.ensureValidated(spark, dir)
    val built = newestMtime(root)
    assert(built > 0L)
    Thread.sleep(1100)
    SimIndex.ensureValidated(spark, dir)
    assert(newestMtime(root) == built,
      "fresh sim artifact was rebuilt instead of reused")
    // a build that died before its meta-last write leaves no valid
    // signature — the next session must rebuild, not trust the partial
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(s"$root/meta"))
    Thread.sleep(1100)
    SimIndex.ensureValidated(spark, dir)
    assert(newestMtime(root) > built,
      "metaless (partial) artifact must rebuild")
  }
}
