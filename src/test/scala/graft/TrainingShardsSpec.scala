package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TrainingShards

/** Shard-sink round-trip on sf0.001: layout, deterministic naming, and
  * content fidelity (the value-level bucket oracle runs in the q81
  * DuckDB gate; this spec owns the filesystem-shape contract).
  */
class TrainingShardsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = {
    val o = TrainingShards.shardOutDir(dir)
    TrainingShards.write(Engine.table(spark, dir, "documents"), o)
    o
  }

  test("layout is lang=*/bucket=*/shard-NNNNN.parquet with no stray part files") {
    val root = new java.io.File(out)
    val leaves = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
      .flatMap(l => l.listFiles().filter(b => b.isDirectory && b.getName.startsWith("bucket=")))
    assert(leaves.nonEmpty, s"no partition directories under $out")
    val files = leaves.flatMap(_.listFiles()).map(_.getName)
      .filter(_.endsWith(".parquet"))
    assert(files.nonEmpty)
    assert(files.forall(_.matches("shard-\\d{5}\\.parquet")),
      s"non-deterministic shard names: ${files.filterNot(_.matches("shard-\\d{5}\\.parquet")).mkString(", ")}")
  }

  test("round-trip preserves every row and the bucket matches the doc_id hash") {
    import org.apache.spark.sql.functions._
    val docs = Engine.table(spark, dir, "documents")
    val back = TrainingShards.readBack(spark, out)
    assert(back.count() == docs.count())
    // re-derive the bucket from the read-back doc_id: zero mismatches
    val mismatched = TrainingShards.withBucket(back.drop("bucket"))
      .withColumnRenamed("bucket", "expected")
      .join(back.select(col("doc_id"), col("bucket")), Seq("doc_id"))
      .filter(col("expected") =!= col("bucket")).count()
    assert(mismatched == 0)
    // and full content equality both ways (anti-joins empty)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
    assert(back.select(cols: _*).exceptAll(docs.select(cols: _*)).isEmpty)
    assert(docs.select(cols: _*).exceptAll(back.select(cols: _*)).isEmpty)
  }

  test("rewriting the same input is idempotent (overwrite, same shard set)") {
    val before = TrainingShards.readBack(spark, out).count()
    TrainingShards.write(Engine.table(spark, dir, "documents"), out)
    assert(TrainingShards.readBack(spark, out).count() == before)
  }
}
