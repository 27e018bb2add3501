package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + fixture-table access for the graft engine.
  *
  * Scale notes (SURVEY.md §6): every knob here is chosen so the same code
  * runs unchanged on a real multi-executor cluster — local[32] is only the
  * test harness. Shuffle partitions default to 32 to match local cores;
  * on a cluster this is overridden by AQE coalescing
  * (spark.sql.adaptive.coalescePartitions.enabled) which re-sizes
  * post-shuffle partitions from runtime statistics, so the setting is a
  * floor, not a hand-tuned constant.
  */
object Engine {

  /** Build the engine's SparkSession. Idempotent (getOrCreate). */
  def session(master: String = "local[32]", appName: String = "graft"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE: runtime re-planning — partition coalescing, skew-join
      // splitting, dynamic broadcast conversion. Essential at 100 TB
      // where static estimates are wrong.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Parquet pushdown is on by default; pinned here as part of the
      // engine contract (BENCH depends on scans pruning columns/rows).
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet stores TIMESTAMP(NANOS) which Spark rejects by
      // default; read as long and convert in table() below.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.registerAll(spark)
    // extensions only apply at session construction; wire the engine's
    // optimizer rules into pre-existing sessions too
    if (!spark.experimental.extraOptimizations.contains(SimplifyEndsWithSource))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimplifyEndsWithSource
    if (!spark.experimental.extraOptimizations.contains(BandedLevenshtein))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedLevenshtein
    spark
  }

  /** Names of the driver-generated fixture tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table from an sf directory. The events table's
    * TIMESTAMP(NANOS) column arrives as a nanos long (see session
    * config) and is truncated to a micros timestamp — the same
    * conversion DuckDB applies when reading TIMESTAMP_NS parquet.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // FLOOR division (div truncates toward zero): pre-epoch nanos
      // must round down to match DuckDB's ns→µs conversion
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(
            "ts div 1000 + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)")))
    else df
  }

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
