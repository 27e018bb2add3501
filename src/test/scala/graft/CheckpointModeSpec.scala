package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-fault-tolerance switch (VERDICT r6 item 2): all
  * iterative/caching operator code materializes through
  * [[Engine.materialize]], which is localCheckpoint by default (fast,
  * local-mode-correct) and a RELIABLE checkpoint when
  * `spark.graft.checkpoint.reliable=true` — local checkpoint blocks die
  * with their executor on a real cluster, reliable ones survive in the
  * configured checkpoint dir.
  *
  * Shared-session assumption (ADVICE r7): this spec mutates two pieces
  * of process-global state on the shared getOrCreate session — the
  * SparkContext checkpoint dir (which can be SET but never UNSET) and
  * the `spark.graft.checkpoint.reliable` flag. That is safe only
  * because Test/fork runs suites SEQUENTIALLY in one JVM and every
  * mutation here is restored (flag) or re-pointed at a throwaway temp
  * dir (checkpoint dir, in afterAll) before the next suite runs. If
  * suite-level parallelism is ever enabled, isolate this spec in its
  * own tagged JVM — the flag flips would race with concurrent
  * materialize calls.
  */
class CheckpointModeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = Engine.session(master = "local[4]")

  override def afterAll(): Unit = {
    // a SparkContext checkpoint dir cannot be unset; leave it pointing
    // at a dedicated throwaway dir (harmless: later suites run with
    // reliable=false, under which the dir is never consulted) instead
    // of whichever dir the last test happened to set
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt_residual").toString)
    spark.conf.set(Engine.ReliableCheckpointKey, "false")
  }

  private def listFiles(f: java.io.File): Seq[java.io.File] = {
    val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids ++ kids.filter(_.isDirectory).flatMap(listFiles)
  }

  test("flag flips materialize from local to reliable checkpoints") {
    import spark.implicits._
    // default: local checkpoint — works with NO checkpoint dir configured
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(Engine.materialize(Seq(1, 2, 3).toDF("x")).count() == 3)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "local mode must not set a checkpoint dir")

    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.conf.set(Engine.CheckpointDirKey, dir.getAbsolutePath)
    spark.conf.set(Engine.ReliableCheckpointKey, "true")
    try {
      val rel = Engine.materialize(Seq(4, 5, 6).toDF("x"))
      assert(rel.count() == 3)
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
      assert(listFiles(dir).exists(_.isFile),
        "reliable mode must persist checkpoint files to the configured dir")
    } finally spark.conf.set(Engine.ReliableCheckpointKey, "false")
  }

  test("iterative operators produce identical results under reliable mode") {
    // q93 PageRank is the heaviest materialize user (per-round barrier);
    // its canonical hash must not depend on the checkpoint backend
    val q = SparkEntry.queries("q93_pagerank")
    val localHash = Canonical.hash(q(spark, "/root/testdata/sf0.001"))
    // the context's checkpoint dir persists from the first test (a
    // SparkContext dir can be set but never unset) — point it at a
    // fresh dir EXPLICITLY so this test controls where q93's reliable
    // checkpoints land (materialize's CheckpointDirKey fallback only
    // applies when the context has no dir at all)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt_q93").toString)
    spark.conf.set(Engine.ReliableCheckpointKey, "true")
    try {
      val reliableHash = Canonical.hash(q(spark, "/root/testdata/sf0.001"))
      assert(reliableHash == localHash)
    } finally spark.conf.set(Engine.ReliableCheckpointKey, "false")
  }

  /** VERDICT r7 item 5: the mode's motivating PROPERTY, not just the
    * backend switch — after materialize, the result must be readable
    * even when the original input no longer exists (on a cluster:
    * when the executor holding the lineage's blocks is gone; the
    * local-mode analogue we can stage is deleting the source files,
    * which breaks every plan that still depends on the scan).
    */
  private def recoveryScenario(reliable: Boolean): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = java.nio.file.Files.createTempDirectory("graft_rec_in").toFile
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(input.getAbsolutePath)

    if (reliable) {
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft_rec_ckpt").toString)
      spark.conf.set(Engine.ReliableCheckpointKey, "true")
    }
    try {
      val src = spark.read.parquet(input.getAbsolutePath)
      val derived = src.filter(col("id") % 2 === 0)
        .groupBy((col("id") % 10).as("k")).agg(count(lit(1)).as("n"))
      val mat = Engine.materialize(derived)
      val before = Canonical.hash(mat)

      // destroy the source: everything still lineage-coupled to the
      // scan must now fail; the materialized result must not care
      listFiles(input).filter(_.isFile).foreach(_.delete())
      intercept[Exception] {
        spark.read.parquet(input.getAbsolutePath).count()
      }

      assert(mat.count() == 5)
      assert(Canonical.hash(mat) == before,
        "materialized result must be fully re-readable after source loss")
      // and it still composes into downstream plans
      assert(mat.agg(sum(col("n"))).collect()(0).getLong(0) == 50)
    } finally if (reliable) spark.conf.set(Engine.ReliableCheckpointKey, "false")
  }

  test("materialized results survive source deletion (reliable mode)") {
    recoveryScenario(reliable = true)
  }

  test("materialized results survive source deletion (local mode, single-JVM only)") {
    // passes locally because local-checkpoint blocks live in this
    // JVM's block manager; on a cluster THIS is the mode that loses
    // data with an executor — the reliable variant above is the one
    // whose guarantee transfers
    recoveryScenario(reliable = false)
  }
}
