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
    // per-session optimizer rules ride the same idempotent setup hook
    // (extensions apply only at session construction; every engine
    // entry point — queries, Verify, Bench — funnels through here)
    if (!spark.experimental.extraOptimizations.contains(SimplifyEndsWithSource))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimplifyEndsWithSource
    if (!spark.experimental.extraOptimizations.contains(BandedLevenshtein))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedLevenshtein
  }
}
