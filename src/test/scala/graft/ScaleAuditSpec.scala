package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide physical-plan audit over EVERY declared query — the
  * 100 TB failure modes that value checks can't see:
  *
  *  - a CartesianProduct (all-pairs blowup) anywhere a real join was
  *    intended;
  *  - a GLOBAL window (empty partitionSpec ⇒ every row through ONE
  *    task) over anything that scales with the corpus.
  *
  * Both have legitimate bounded uses, so the audit is
  * whitelist-driven: each exemption names the bound that keeps the
  * pattern safe at scale (the same justification the query's scaladoc
  * carries). A NEW query that trips the audit must either fix its plan
  * or document-and-whitelist — silent regressions are the thing this
  * spec exists to catch.
  */
class ScaleAuditSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  private def wholePlan(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => wholePlan(a.inputPlan)
      case other => Seq(other)
    }.flatten

  /** Queries allowed a CartesianProduct: q08 IS the cross-join
    * operator demo (25×5 dimension rows).
    */
  private val cartesianOk = Set("q08_cross_join")

  /** Queries allowed a global (unpartitioned) window, each with the
    * bound that keeps the single task small at ANY corpus size:
    * rank-select cumulative windows run over bounded DISTINCT domains
    * (2–4 dp score/value buckets, file stats = corpus/64, chunk
    * offsets = corpus/G, band buckets), and q131's ntiles run over the
    * customer-sized RFM aggregate.
    */
  private val globalWindowOk = Set(
    "q36_percentiles",    // distinct 2-dp value domain
    "q64_sequence_packing", // chunk offsets: corpus/G rows
    "q68_mixture_weights",  // per-language aggregate: |langs| rows
    "q71_perplexity_buckets", // distinct rounded-score domain
    "q90_quantile_norm",  // (source, 4-dp bucket) domain
    "q105_weighted_sample", // distinct rounded-key domain
    "q120_winsorize",     // distinct 2-dp value domain
    "q131_rfm_segments",  // customer-sized aggregate
    "q133_compaction_plan", // file stats: corpus/64 rows
    "q135_sampled_quantiles") // distinct 2-dp value domain

  test("no query plans a CartesianProduct or an unbounded global window") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan =
        try q(spark, dir).queryExecution.executedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      val nodes = wholePlan(plan)
      val cartesian = nodes.exists(_.isInstanceOf[CartesianProductExec])
      if (cartesian && !cartesianOk(name))
        offenders += s"$name: CartesianProduct"
      val globalWindows = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (globalWindows.nonEmpty && !globalWindowOk(name))
        offenders += s"$name: global window (${globalWindows.size})"
    }
    assert(offenders.isEmpty,
      s"scale audit violations:\n${offenders.mkString("\n")}")
  }
}
