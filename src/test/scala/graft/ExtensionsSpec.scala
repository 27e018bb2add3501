package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Scalars

/** The domain optimizer rule + extensions surface. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("empty-url ends_with_source folds to constant false in the plan") {
    val df = Engine.table(spark, "/root/testdata/sf0.001", "part")
      .select(Scalars.ends_with_source(col("p_name"), lit(""), col("p_brand")).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("ends_with_source"),
      s"expression not folded:\n$optimized")
    assert(optimized.contains("false"))
    assert(df.collect().forall(!_.getBoolean(0)))
  }

  test("non-empty and null urls are NOT folded (semantics preserved)") {
    val df = Engine.table(spark, "/root/testdata/sf0.001", "part")
      .select(
        Scalars.ends_with_source(col("p_name"), lit("https://x.com"), col("p_brand")).as("a"),
        Scalars.ends_with_source(col("p_name"), lit(null).cast("string"), col("p_brand")).as("b"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ends_with_source"))
    // null url propagates null (expression semantics), not false
    assert(df.collect().forall(r => r.isNullAt(1)))
  }

  test("GraftExtensions installs into a fresh extensions container") {
    // full end-to-end (fresh session via spark.sql.extensions config) is
    // driven by graft.ExtensionsDemo in a separate JVM — a shared test
    // JVM can't construct a second SparkContext
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without throwing
  }
}
