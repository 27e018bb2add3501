package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: answer an aggregate over the documents corpus from
  * its MATERIALIZED VIEW — the warehouse feature where a precomputed
  * per-(lang, source) aggregate table transparently substitutes for a
  * corpus scan whenever the query's groupings and aggregates are
  * derivable from it.
  *
  * Matched shape — `Aggregate(G, A, scan)` where
  *
  *   - `scan` is the documents relation (a parquet location matching
  *     [[SourceMatch]]), possibly under the attribute-only Project
  *     that column pruning inserts, and possibly under FILTERS whose
  *     predicates reference only the MV's dimensions — a
  *     whole-group predicate commutes with the rollup and carries
  *     over to the view (q196); any predicate touching a fact column
  *     refuses the match;
  *   - `G` is nonempty and every grouping is a bare `lang` / `source`
  *     attribute (the MV's dimensions; the empty-grouping global
  *     aggregate is deliberately excluded — its empty-input semantics
  *     differ between raw rows, count()=0, and an empty MV, sum=NULL);
  *   - every output of `A` is a grouping attribute, `count(1)`, or
  *     `sum(n_chars)` — the aggregates the MV stores, both of which
  *     ROLL UP by summation.
  *
  * The rewrite swaps the corpus scan for the MV relation and each
  * aggregate for its rollup — `count(1)` → `sum(n_docs)`,
  * `sum(n_chars)` → `sum(sum_chars)` — re-aliasing every output to the
  * ORIGINAL name and exprId so parent operators resolve unchanged. At
  * 100 TB this is the difference between scanning the corpus and
  * scanning a |langs|×|sources|-row table; correctness is exact
  * because the MV's longs are exact partial sums of the same integers
  * (the q106 incremental-view lesson: rollup-of-sums == sum).
  *
  * Opt-in via [[EnabledKey]] and pointed at a store via [[PathKey]]
  * (set by `MatView.ensureMv`, whose artifact carries the standard
  * corpus-signature meta row). Idempotent under the fixed-point batch:
  * the rewritten child's location no longer matches [[SourceMatch]].
  * MvRewriteSpec pins the rewrite, the value equality, and every
  * refusal branch (extra filter, unsupported aggregate, non-dimension
  * grouping, global aggregate).
  */
object MvRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.mvRewrite.enabled"

  /** Parquet directory of the materialized view (lang, source,
    * n_docs, sum_chars).
    */
  val PathKey = "spark.graft.mvRewrite.path"

  /** Substring identifying the SOURCE relation the MV precomputes. */
  val SourceMatch = "documents.parquet"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val path = conf.getConfString(PathKey, "")
    if (path.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, DocScan(dimFilters), _)
          if eligible(groupings, aggExprs) =>
        rewrite(agg, dimFilters, path)
    }
  }

  /** Every file-relation root location in a logical plan — the
    * observable the rewrite changes (plan STRINGS don't print paths;
    * MvRewriteSpec and q195's self-check both assert on this).
    */
  def scanLocations(plan: LogicalPlan): Seq[String] = plan.collect {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
  }.flatten

  private val Dims = Set("lang", "source")

  /** The documents scan, under any interleaving of column pruning's
    * attribute-only Projects and filters — PROVIDED every filter
    * references only the MV's dimensions: a whole-(lang, source)-group
    * predicate commutes with the rollup (it keeps or drops entire MV
    * rows), so the rewrite carries it over to the view. Any predicate
    * touching a fact column (n_chars, text, doc_id) refuses the whole
    * match — the MV cannot see inside a group. Yields the collected
    * dimension-filter conjuncts (source-side attributes; remapped to
    * MV attributes at rewrite).
    */
  private object DocScan {
    def unapply(plan: LogicalPlan): Option[Seq[Expression]] = plan match {
      case Project(projList, child) if projList.forall(
        _.isInstanceOf[AttributeReference]) => unapply(child)
      case Filter(cond, child) if cond.deterministic &&
          cond.references.forall(a => Dims(a.name)) =>
        unapply(child).map(cond +: _)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if fs.location.rootPaths.exists(_.toString.contains(SourceMatch)) =>
        Some(Nil)
      case _ => None
    }
  }

  private def eligible(groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression]): Boolean = {
    val groupingsOk = groupings.nonEmpty && groupings.forall {
      case a: AttributeReference => Dims(a.name)
      case _ => false
    }
    groupingsOk && aggExprs.forall {
      case a: AttributeReference => Dims(a.name)
      case Alias(AggregateExpression(c: Count, Complete, false, None, _), _) =>
        // count(1) / count(*) only — count(col) skips nulls, which the
        // MV's n_docs does not encode
        c.children.forall(_.isInstanceOf[Literal])
      case Alias(AggregateExpression(s: Sum, Complete, false, None, _), _) =>
        s.child match {
          case a: AttributeReference => a.name == "n_chars"
          case _ => false
        }
      case _ => false
    }
  }

  private def rewrite(agg: Aggregate, dimFilters: Seq[Expression],
      path: String): LogicalPlan = {
    // a fresh analyzed read of the MV — public API, fresh exprIds
    val mvRel = SparkSession.active.read.parquet(path)
      .queryExecution.analyzed
    val mv = mvRel.output.map(a => a.name -> a).toMap
    // dimension filters carry over verbatim, re-anchored to MV attrs
    val mvPlan = dimFilters.reduceOption(And).fold(mvRel: LogicalPlan)(c =>
      Filter(c.transform {
        case a: AttributeReference => mv(a.name)
      }, mvRel))
    def rollup(col: String) = AggregateExpression(
      new Sum(mv(col)), Complete, isDistinct = false, None)
    val newGroupings = agg.groupingExpressions.map {
      case a: AttributeReference => mv(a.name)
      case other => other
    }
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(mv(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(AggregateExpression(_: Count, _, _, _, _), name) =>
        Alias(rollup("n_docs"), name)(exprId = al.exprId)
      case al @ Alias(AggregateExpression(_: Sum, _, _, _, _), name) =>
        Alias(rollup("sum_chars"), name)(exprId = al.exprId)
      case other => other
    }
    agg.copy(groupingExpressions = newGroupings,
      aggregateExpressions = newAggs, child = mvPlan)
  }
}
