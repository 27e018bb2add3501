package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster-fault-tolerance switch (VERDICT r6 item 2): all
  * iterative/caching operator code materializes through
  * [[Engine.materialize]], which is localCheckpoint by default (fast,
  * local-mode-correct) and a RELIABLE checkpoint when
  * `spark.graft.checkpoint.reliable=true` — local checkpoint blocks die
  * with their executor on a real cluster, reliable ones survive in the
  * configured checkpoint dir.
  */
class CheckpointModeSpec extends AnyFunSuite {

  lazy val spark = Engine.session(master = "local[4]")

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
}
