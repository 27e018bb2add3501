package graft

import org.apache.spark.sql.SparkSession

/** Warm-run probe sidecar to the cold bench (VERDICT r6 item 4).
  *
  * The driver's Bench is cold-codegen dominated (±30% ambient noise per
  * PROGRESS), which can mask real regressions on the expensive queries.
  * This main runs the top-N queries (by BENCH_r06 cost, overridable via
  * args) once untimed to absorb codegen/cache warmup, then 3 timed
  * runs each, and prints ONE JSON line with the per-run times and the
  * median — the number to compare across rounds.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.WarmProbe"`; output also lands in warm_out.json (and
  * SPARK_GRAFT_WARM_OUT if set).
  */
object WarmProbe {

  /** Top-10 most expensive queries at sf0.1 per BENCH_r06 / VERDICT r6. */
  val DefaultTop: Seq[String] = Seq(
    "q116_assoc_rules", "q105_weighted_sample", "q110_interpolate",
    "q01_pricing_summary", "q102_integrity_audit", "q32_approx_distinct",
    "q57_ann_ivf", "q67_lm_score", "q76_boilerplate_ngrams", "q65_tfidf")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.registerAll(spark)

    val names = if (args.nonEmpty) args.toSeq else DefaultTop

    def once(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def fmt(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    val rows = names.map { n =>
      try {
        once(n) // warmup: codegen compiled, session caches populated
        val runs = Seq.fill(3)(once(n))
        val median = runs.sorted.apply(1)
        n -> Right((runs, median))
      } catch {
        case e: Throwable =>
          System.err.println(s"[warm] $n failed: ${e.getMessage}")
          n -> Left(e.getMessage)
      }
    }
    val qs = rows.map {
      case (n, Right((runs, med))) =>
        s""""$n":{"runs":[${runs.map(fmt).mkString(",")}],"median":${fmt(med)}}"""
      case (n, Left(_)) => s""""$n":{"runs":[],"median":-1}"""
    }.mkString("{", ",", "}")
    val medTotal = rows.collect { case (_, Right((_, m))) => m }.sum
    val line =
      s"""{"metric":"warm_median_total","value":${fmt(medTotal)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    val outs = Seq("warm_out.json") ++ sys.env.get("SPARK_GRAFT_WARM_OUT")
    outs.foreach { p =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
      catch { case e: Exception => System.err.println(s"[warm] write $p: $e") }
    }
    spark.stop()
  }
}
