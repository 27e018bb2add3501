package graft

/** Dev utility: run named queries three times in one warm JVM and print
  * per-run seconds. Bench numbers at sf0.1 are cold-codegen dominated
  * (±0.5-1 s/query); this separates steady-state data cost from
  * compile cost before believing a regression or an optimization.
  * Usage: `sbt "runMain graft.WarmProbe q32_approx_distinct ..."`.
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(master = "local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    for (i <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIMING round$i $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
