package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet training-shard SINK — the write side of a
  * 100 TB pipeline (the engine's other sinks are the reference's
  * JSON/HTML envelopes, which cap out at page-sized results).
  *
  * Layout contract:
  *   `<out>/lang=<l>/bucket=<b>/shard-NNNNN.parquet`
  *
  *  - `bucket` is CONTENT-derived — `stable_hash64('shard:'||doc_id) %
  *    NumBuckets` — so a document's partition directory is a pure
  *    function of its id: reproducible across runs, engines, cluster
  *    sizes, and input partitionings (a rand- or task-id-derived bucket
  *    would shuffle docs between shards on every run).
  *  - File SIZE is targeted two ways: the REBALANCE hint lets AQE split
  *    oversized (lang, bucket) groups across tasks at the advisory
  *    partition size — a plain `repartition(lang, bucket)` would funnel
  *    each group through ONE task however big the group (the
  *    one-language-dominated corpus trap) — and `maxRecordsPerFile`
  *    caps each written file.
  *  - Shard names are deterministic: after the job commits, part files
  *    in each partition directory are renamed (sorted, so the mapping
  *    is stable) to `shard-00000.parquet, shard-00001.parquet, …` —
  *    one driver-side metadata RPC per file, parallelizable over
  *    directories if the shard count ever makes it matter.
  *
  * Verification (q81): write the documents table as shards, read the
  * shards back, and hash-compare every row + the bucket assignment
  * against the DuckDB oracle computing the same bucket hash over the
  * original input — a full write→read round-trip, not a row count.
  */
object TrainingShards {

  /** Buckets per language. Fixture-scale; production sizes this as
    * corpus_bytes / (languages × target_shard_bytes).
    */
  val NumBuckets = 8

  /** Per-file row cap (the size target at fixture scale: sf0.1's
    * ~125-row buckets split, sf0.01's ~12-row buckets don't — so the
    * multi-file naming path is exercised where the oracle runs too).
    */
  val MaxRecordsPerFile = 100L

  /** Deterministic, content-derived shard bucket. */
  def withBucket(df: DataFrame): DataFrame = {
    graft.Functions.registerAll(df.sparkSession)
    df.withColumn("bucket", expr(
      s"stable_hash64(concat('shard:', doc_id)) % $NumBuckets"))
  }

  /** The write-side plan: bucketed rows, REBALANCE-exchanged on the
    * partition keys so write parallelism tracks data volume (AQE splits
    * big groups, coalesces small ones — never a single-task funnel).
    * Exposed separately so PlanSpec can assert the exchange shape.
    */
  def shardPlan(df: DataFrame): DataFrame =
    withBucket(df).hint("rebalance", col("lang"), col("bucket"))

  /** Write `df` (must carry lang + doc_id) as partitioned shards. */
  def write(df: DataFrame, outDir: String): Unit = {
    shardPlan(df).write
      .mode("overwrite")
      .option("maxRecordsPerFile", MaxRecordsPerFile)
      .partitionBy("lang", "bucket")
      .parquet(outDir)
    renameShards(df.sparkSession, outDir)
  }

  /** part-* → shard-NNNNN.parquet, per partition directory, in sorted
    * (= deterministic: the part-NNNNN task prefix orders files across
    * tasks, the -cNNN suffix within one) order.
    */
  private def renameShards(s: SparkSession, outDir: String): Unit = {
    val fs = new Path(outDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs = fs.globStatus(new Path(outDir, "lang=*/bucket=*"))
    dirs.foreach { d =>
      val parts = fs.listStatus(d.getPath)
        .map(_.getPath).filter(_.getName.startsWith("part-"))
        .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (p, i) =>
        val dst = new Path(d.getPath, f"shard-$i%05d.parquet")
        require(fs.rename(p, dst),
          s"shard rename failed: $p -> $dst (deterministic naming contract broken)")
      }
    }
  }

  /** Read a shard directory back; partition columns are re-typed to the
    * write-side schema (partition-value inference yields ints).
    */
  def readBack(s: SparkSession, outDir: String): DataFrame =
    s.read.parquet(outDir).withColumn("bucket", col("bucket").cast("long"))

  /** Shard output root for a given input dir — env-overridable (same
    * discipline as GRAFT_FIXTURES_DIR), defaulting to the JVM temp dir;
    * keyed by the input path so sf runs never collide.
    */
  def shardOutDir(sfDir: String): String = {
    val root = sys.env.getOrElse("GRAFT_SHARDS_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft_shards")
    val key = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sfDir).toLong & 0xffffffffL)
    s"$root/out_$key"
  }

  /** q81: full shard round-trip — write the documents table as
    * (lang, bucket) shards, read the shards back, return every row.
    * The oracle recomputes the bucket hash over the ORIGINAL table, so
    * a lost/duplicated/corrupted row or a misassigned bucket fails the
    * hash compare.
    */
  val q81ShardWrite: (SparkSession, String) => DataFrame = (s, dir) => {
    val docs = graft.Engine.table(s, dir, "documents")
    val out = shardOutDir(dir)
    write(docs, out)
    readBack(s, out)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q81_shard_write" -> q81ShardWrite)

  val oracles: Map[String, String] = Map(
    "q81_shard_write" ->
      s"""SELECT doc_id, text, lang, source, n_chars,
        |  (('0x' || substring(md5('shard:' || doc_id),1,15))::BIGINT) % $NumBuckets AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin)
}
