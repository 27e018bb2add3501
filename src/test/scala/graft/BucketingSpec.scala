package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins — the shuffle-elimination strategy for
  * repeated fact⋈fact joins at 100 TB (SURVEY §2B "Joins" scale note):
  * pre-bucketing orders and customer on the join key lets Catalyst plan
  * the join with ZERO exchanges, vs two for the plain parquet join.
  */
class BucketingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  // getOrCreate in a shared test JVM returns whichever session exists;
  // the broadcast threshold is a runtime conf, set per-test below (the
  // warehouse dir is pinned to /tmp via build.sbt javaOptions).
  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString.split("Exchange").length - 1

  test("bucketed tables join with zero exchanges; plain parquet needs two") {
    spark.sparkContext.setLogLevel("WARN")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse locations persist — clear orphaned dirs first
    for (t <- Seq("orders_bkt", "customer_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    try {
    val o = Engine.table(spark, dir, "orders")
    val c = Engine.table(spark, dir, "customer")

    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")

    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val bucketed = spark.table("orders_bkt")
      .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))

    assert(exchanges(plain) >= 2, "plain join should shuffle both sides")
    assert(exchanges(bucketed) <= 1, // only the tiny post-join agg may shuffle
      s"bucketed join should not shuffle join inputs:\n${bucketed.queryExecution.executedPlan}")

    // and results are identical
    val a = plain.collect().map(_.toString).sorted.toSeq
    val b = bucketed.collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
