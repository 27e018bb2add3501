package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite an eligible interval join to the
  * time-bucketed form (the q183 layout) so the natural way of writing
  * the query gets the skew-bounded plan automatically.
  *
  * Matched shape — an INNER join, a LEFT/RIGHT OUTER or LEFT ANTI
  * join whose PRESERVED side is the window's anchor side (see
  * [[bucketed]]), or a FULL OUTER join (decomposed into a bucketed
  * left-outer plus a bucketed anti-recovered right tail — see
  * [[rewrite]]), whose condition conjuncts contain
  *
  *   - at least one cross-side `EqualTo(attr, attr)` equi pair, and
  *   - two conjuncts bounding one side's timestamp attribute `p`
  *     inside a literal-offset window of the other side's `c`:
  *     `p ≥/> c + lo` and `p ≤/< c + hi` (any comparison orientation;
  *     offsets are 0 for a bare `c` or a literal day-time /
  *     month-free calendar interval — `TimestampAddInterval` is what
  *     Catalyst folds `c ± INTERVAL` into). Backward windows (q63:
  *     lo = −1h, hi = 0), forward windows (q09: lo = 0, hi = +60 s),
  *     and shifted windows all qualify; strict bounds are fine (the
  *     bucket match is a candidate SUPERSET and every original
  *     conjunct is kept). The lower offset must be whole seconds
  *     (sub-second `lo` would need a third replica once the epoch
  *     cast floors to seconds); month intervals never match (month
  *     lengths vary, no fixed bucket width covers them).
  *
  * The rewrite appends a bucket key to both sides with width
  * W = max(1, ceil(hi) − lo) seconds ≥ the window span, so a matching
  * `p` sits in the bucket of `c + lo` or the one after it:
  * the `c` side gets `(epoch(c) + lo) div W`, the `p` side explodes
  * `epoch(p) div W` into (b − 1, b), the bucket equality joins the
  * keys, and the original output is projected back. The arithmetic
  * holds under Spark's truncate-toward-zero casts and `div` for
  * negative epochs too: both are monotone with step boundaries ≥ one
  * bucket apart, so a span ≤ W still crosses at most one boundary.
  * Semantics are identical — the range conjuncts stay in the
  * condition and each candidate pair arises exactly once (the two
  * replicas land in distinct buckets) — but per-task work drops from
  * O(rows-per-key²) to O(rows-per-key-per-window²) and the composite
  * key is what AQE skew-split / salting can act on. See q183's
  * scaladoc for the full 100 TB rationale; IntervalRuleSpec proves
  * rewritten == plain on fixtures and boundary frames for both window
  * directions.
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

  /** The transform itself, unconditionally — q184/q185 apply it
    * directly to a plain interval join's optimized plan so the
    * driver's oracle value-checks the REWRITTEN plan without flipping
    * session state.
    */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner | LeftOuter | RightOuter | LeftAnti, Some(cond), _)
        if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
      bucketed(j).getOrElse(j)
    case j @ Join(left, right, FullOuter, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BucketPrefix)) =>
      // FULL OUTER decomposes (VERDICT r13 item 8): no single bucketed
      // join can preserve BOTH sides — whichever side explodes into
      // two bucket replicas would surface its unmatched rows twice. So
      // the rewrite is the classic two-part form, each part bucketable
      // with ITS preserved side as the anchor:
      //   part 1: LEFT OUTER (anchor = left) — every left row once,
      //           matched or null-extended;
      //   part 2: the RIGHT rows with NO match — a LEFT ANTI with the
      //           right side as the preserved/anchor child — projected
      //           under null-extended left columns.
      // Their union is exactly the full outer join, and BOTH parts get
      // the skew-bounded bucketed layout. Refused whole when either
      // anchoring is unbucketable (sub-second lower offset), so
      // semantics never split between strategies.
      (for {
        matchedPart <- bucketed(Join(left, right, LeftOuter, Some(cond), hint))
        unmatchedRight <- bucketed(Join(right, left, LeftAnti, Some(cond), hint))
      } yield Union(
        Project(j.output, matchedPart),
        Project(left.output.map(a =>
          Alias(Literal(null, a.dataType), a.name)()) ++ right.output,
          unmatchedRight))).getOrElse(j)
  }

  /** The single-join bucketing transform. An OUTER (or ANTI) join
    * qualifies only with its PRESERVED side as the anchor: the anchor
    * gets exactly one bucket column (never replicated), so each
    * preserved row appears — and is match-tested — exactly once:
    * matched rows via the bucket-equality superset, unmatched rows
    * null-extended (outer) or kept (anti) by the join itself, exactly
    * as in the plain plan. Had the preserved side been the ×2-exploded
    * bounded side, every unmatched preserved row would surface twice
    * (outer) or be tested per-replica against a partial candidate set
    * (anti — a replica whose bucket misses the match would wrongly
    * survive). Since every two-sided window reads in both anchorings,
    * the common shapes qualify whichever way the user wrote the
    * bounds (VERDICT r12 item 6); the only refusals are windows whose
    * preserved-side anchoring needs a sub-second lower offset.
    */
  private def bucketed(j: Join): Option[LogicalPlan] = {
    val Join(left, right, jt, Some(cond), hint) = j: @unchecked
    val conjuncts = splitConjunctivePredicates(cond)
    val chosen = matchWindows(conjuncts, left, right).find {
      case (_, cTs, _, _) => jt match {
        case Inner => true
        case LeftOuter | LeftAnti => left.outputSet.contains(cTs)
        case RightOuter => right.outputSet.contains(cTs)
        case _ => false
      }
    }
    chosen.flatMap { case (pTs, cTs, loSec, wSec) =>
      val equiOk = conjuncts.exists {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          crossSide(a, b, left, right)
        case _ => false
      }
      if (!equiOk) None
      else {
        // anchor side: one bucket column at the window's start
        val cSide = if (left.outputSet.contains(cTs)) left else right
        val pSide = if (cSide eq left) right else left
        val cBucket = Alias(
          IntegralDivide(
            Add(Cast(cTs, LongType), Literal(loSec)), Literal(wSec)),
          s"${BucketPrefix}_c")()
        val cPlan = Project(cSide.output :+ cBucket, cSide)
        // bounded side: explode into (bucket - 1, bucket)
        val pB = IntegralDivide(Cast(pTs, LongType), Literal(wSec))
        val arr = CreateArray(Seq(Subtract(pB, Literal(1L)), pB))
        val pOut = AttributeReference(s"${BucketPrefix}_p", LongType,
          nullable = pB.nullable)()
        val pPlan = Generate(Explode(arr), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(pOut), child = pSide)
        val bucketEq = EqualTo(cBucket.toAttribute, pOut)
        val (newL, newR) =
          if (cSide eq left) (cPlan: LogicalPlan, pPlan: LogicalPlan)
          else (pPlan: LogicalPlan, cPlan: LogicalPlan)
        Some(Project(j.output,
          Join(newL, newR, jt, Some(And(cond, bucketEq)), hint)))
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

  /** One inequality conjunct as window bounds. Each comparison yields
    * BOTH readings — `a ≤ c + off` is an upper bound on `a` (offset
    * off) AND a lower bound on `c` (offset −off, anchored at `a`) —
    * so the pairing below finds the window whichever side the query
    * bounded.  Tuple: (bounded attr p, anchor attr c, offsetMicros,
    * isUpper).
    */
  private def boundsOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[(Attribute, Attribute, Long, Boolean)] = {
    def both(a: Attribute, offA: Long, b: Attribute, offB: Long,
        aIsUpper: Boolean): Seq[(Attribute, Attribute, Long, Boolean)] =
      if (!tsPair(a, b, left, right)) Nil
      else Seq((a, b, offB - offA, aIsUpper), (b, a, offA - offB, !aIsUpper))
    e match {
      // x + offX  <=/<  y + offY   (bare attr == offset 0)
      case LessThanOrEqual(Anchored(x, ox), Anchored(y, oy)) => both(x, ox, y, oy, aIsUpper = true)
      case LessThan(Anchored(x, ox), Anchored(y, oy)) => both(x, ox, y, oy, aIsUpper = true)
      case GreaterThanOrEqual(Anchored(x, ox), Anchored(y, oy)) => both(x, ox, y, oy, aIsUpper = false)
      case GreaterThan(Anchored(x, ox), Anchored(y, oy)) => both(x, ox, y, oy, aIsUpper = false)
      case _ => Nil
    }
  }

  /** A timestamp attribute with a literal micros offset: `ts` (offset
    * 0) or `ts + INTERVAL lit` (`TimestampAddInterval`).
    */
  private object Anchored {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case a: AttributeReference => Some((a, 0L))
      case TimestampAddInterval(a: AttributeReference, IntervalMicros(us), _) =>
        Some((a, us))
      case _ => None
    }
  }

  /** All (p, c, loSec, bucketWidthSec) readings such that the
    * conjuncts bound `p` inside `[c + lo, c + hi]` with a whole-second
    * `lo ≤ hi`. Every two-sided window yields BOTH anchorings
    * (`p ∈ [c+lo, c+hi]` ⟺ `c ∈ [p−hi, p−lo]` — boundsOf emits each
    * comparison's two readings), except where one direction's lower
    * offset is sub-second; [[rewrite]] picks the reading its join type
    * needs (any for INNER, the preserved-side anchor for OUTER).
    */
  private def matchWindows(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Seq[(Attribute, Attribute, Long, Long)] = {
    val bounds = conjuncts.flatMap(boundsOf(_, left, right))
    for {
      (pL, cL, lo, isUpperL) <- bounds if !isUpperL
      (pU, cU, hi, isUpperU) <- bounds if isUpperU
      if pL.semanticEquals(pU) && cL.semanticEquals(cU)
      if lo <= hi
      if Math.floorMod(lo, 1000000L) == 0L // whole-second window start
      loSec = Math.floorDiv(lo, 1000000L)
      hiSec = Math.floorDiv(hi + 999999L, 1000000L) // ceil to seconds
      wSec = Math.max(1L, hiSec - loSec)
    } yield (pL, cL, loSec, wSec)
  }

  /** Total micros of a literal interval — ANSI `DayTimeIntervalType`
    * literals store micros directly; legacy `CalendarInterval` literals
    * qualify only with no month component. Year-month ANSI intervals
    * never match (`YearMonthIntervalType` stores an Int, not a Long).
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
