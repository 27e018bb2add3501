package graft

import org.apache.spark.sql.SparkSession

/** SQL registration of the engine's custom functions.
  *
  * Grows as custom Catalyst Expressions land (SURVEY.md §2B "Scalar fns").
  * Registration is idempotent (createOrReplaceTempFunction).
  */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    graft.functions.Scalars.register(spark)
  }
}
