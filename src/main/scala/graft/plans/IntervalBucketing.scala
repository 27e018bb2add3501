package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite an eligible interval join to the
  * time-bucketed form (the q183 layout) so the natural way of writing
  * the query gets the skew-bounded plan automatically.
  *
  * Matched shape — an INNER join whose condition conjuncts contain
  *
  *   - at least one cross-side `EqualTo(attr, attr)` equi pair,
  *   - an upper bound `pTs <= cTs` (either comparison orientation),
  *   - a lower bound `pTs >= cTs + INTERVAL '-I'`
  *     (`TimestampAddInterval` with a negative `CalendarInterval`
  *     literal — the tree Catalyst folds `cTs - INTERVAL I` into),
  *
  * where `pTs` and `cTs` are TimestampType attributes from opposite
  * sides and the interval has no month component (month lengths vary,
  * so a fixed bucket width cannot cover them). The rewrite appends
  * `bucket = epoch_seconds div W` (W = ceil(I) in seconds — at least
  * the window length, so a match spans at most two buckets) to both
  * sides, explodes the `pTs` side into `(bucket, bucket + 1)`, adds
  * `bucketC = bucketP` to the join keys, and projects the original
  * output. Semantics are identical — the range conjuncts stay in the
  * condition and each candidate pair arises exactly once (the two
  * replicas land in distinct buckets) — but per-task work drops from
  * O(rows-per-key²) to O(rows-per-key-per-window²) and the composite
  * key is what AQE skew-split / salting can act on. See q183's
  * scaladoc for the full 100 TB rationale; IntervalRuleSpec proves
  * rewritten == plain on fixtures and boundary frames.
  *
  * Opt-in: fires only when `spark.graft.bucketIntervalJoin.enabled` is
  * `true` (a layout change this structural should be a deliberate
  * choice, like AQE skew-join thresholds). Idempotent under the
  * fixed-point batch: the rewritten join's keys carry the reserved
  * `__graft_bucket` prefix, which the guard refuses to touch.
  */
object BucketIntervalJoin extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.bucketIntervalJoin.enabled"

  /** Reserved attribute-name prefix marking an already-rewritten join. */
  val BucketPrefix = "__graft_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else rewrite(plan)

  /** The transform itself, unconditionally — q184 applies it directly
    * to a plain interval join's optimized plan so the driver's oracle
    * value-checks the REWRITTEN plan without flipping session state.
    */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      matchWindow(conjuncts, left, right) match {
        case None => j
        case Some((pTs, cTs, wSec)) =>
          val equiOk = conjuncts.exists {
            case EqualTo(a: AttributeReference, b: AttributeReference) =>
              crossSide(a, b, left, right)
            case _ => false
          }
          if (!equiOk) j
          else {
            // probe (window-end) side: one bucket column
            val cSide = if (left.outputSet.contains(cTs)) left else right
            val pSide = if (cSide eq left) right else left
            val cBucket = Alias(bucketOf(cTs, wSec), s"${BucketPrefix}_c")()
            val cPlan = Project(cSide.output :+ cBucket, cSide)
            // replicated side: explode into (bucket, bucket + 1)
            val pB = bucketOf(pTs, wSec)
            val arr = CreateArray(Seq(pB, Add(pB, Literal(1L))))
            val pOut = AttributeReference(s"${BucketPrefix}_p", LongType,
              nullable = pB.nullable)()
            val pPlan = Generate(Explode(arr), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(pOut), child = pSide)
            val bucketEq = EqualTo(cBucket.toAttribute, pOut)
            val (newL, newR) =
              if (cSide eq left) (cPlan: LogicalPlan, pPlan: LogicalPlan)
              else (pPlan: LogicalPlan, cPlan: LogicalPlan)
            Project(j.output,
              Join(newL, newR, Inner, Some(And(cond, bucketEq)), hint))
          }
      }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  private def crossSide(a: Attribute, b: Attribute,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
      (left.outputSet.contains(b) && right.outputSet.contains(a))

  /** epoch_seconds(ts) div wSec — TZ-independent (micros division). */
  private def bucketOf(ts: Attribute, wSec: Long): Expression =
    IntegralDivide(Cast(ts, LongType), Literal(wSec))

  /** Find (pTs, cTs, bucketWidthSeconds) such that the conjuncts bound
    * `pTs` inside `[cTs - I, cTs]` for a positive month-free interval I.
    */
  private def matchWindow(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan): Option[(Attribute, Attribute, Long)] = {
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p: AttributeReference, c: AttributeReference)
          if tsPair(p, c, left, right) => (p, c)
      case GreaterThanOrEqual(c: AttributeReference, p: AttributeReference)
          if tsPair(p, c, left, right) => (p, c)
    }
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p: AttributeReference,
          TimestampAddInterval(c: AttributeReference, IntervalMicros(us), _))
          if tsPair(p, c, left, right) => (p, c, us)
      case LessThanOrEqual(
          TimestampAddInterval(c: AttributeReference, IntervalMicros(us), _),
          p: AttributeReference)
          if tsPair(p, c, left, right) => (p, c, us)
    }
    val hits = for {
      (pU, cU) <- uppers
      (pL, cL, totalMicros) <- lowers
      if pU.semanticEquals(pL) && cU.semanticEquals(cL)
      if totalMicros < 0
      // width >= window length, in whole seconds, so a match spans
      // at most the probe's bucket and the one before it
      wSec = (-totalMicros + 999999L) / 1000000L
      if wSec >= 1L
    } yield (pL: Attribute, cL: Attribute, wSec)
    hits.headOption
  }

  /** Total micros of a literal interval — ANSI `DayTimeIntervalType`
    * literals store micros directly; legacy `CalendarInterval` literals
    * qualify only with no month component (month lengths vary, so no
    * fixed bucket width covers them). Year-month ANSI intervals never
    * match (wrong literal value type for this extractor's Long case
    * arises only for day-time; `YearMonthIntervalType` stores an Int).
    */
  private object IntervalMicros {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, _: org.apache.spark.sql.types.DayTimeIntervalType) =>
        Some(us)
      case Literal(iv: CalendarInterval, CalendarIntervalType) if iv.months == 0 =>
        Some(iv.days * 86400000000L + iv.microseconds)
      case _ => None
    }
  }

  /** Both TimestampType attributes, one from each side. */
  private def tsPair(p: Attribute, c: Attribute,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    p.dataType == TimestampType && c.dataType == TimestampType &&
      crossSide(p, c, left, right)
}
