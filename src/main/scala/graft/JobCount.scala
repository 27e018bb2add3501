package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev utility: count the Spark JOBS one warm execution of a declared
  * query submits (`sbt "runMain graft.JobCount q230_snapshot_sql_read"`).
  * Each query runs once untimed (fixtures ensured, session caches
  * populated), then once counted — the per-run job count is the
  * driver-overhead signal plan dumps cannot show (a metadata collect is
  * a whole job that never appears as an operator). SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS as in Bench.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(master = s"local[$cpus]")
    val n = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { n.incrementAndGet(); () }
    })
    args.foreach { name =>
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // listener bus is async — drain before resetting
      n.set(0)
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      println(s"[jobs] $name: ${n.get}")
    }
    spark.stop()
  }
}
