package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** Domain-specific optimizer rule: `ends_with_source(snippet, '', name)`
  * is constant-false — the reference short-circuits on an empty url
  * before ever inspecting the snippet (fetchRumors.js:163
  * `if (!item.url) return false`). Folding it lets Catalyst eliminate
  * the whole regex evaluation (and any filter built on it) at plan
  * time. Only the empty-STRING literal folds; a null url stays an
  * expression (null-propagation semantics preserved).
  */
object SimplifyEndsWithSource extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case EndsWithSource(_, Literal(u: UTF8String, StringType), _)
        if u != null && u.numChars() == 0 =>
      Literal(false, BooleanType)
  }
}

/** SparkSessionExtensions entry point: makes the engine installable into
  * any Spark deployment via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — all custom
  * functions become session builtins and the engine's optimizer rules
  * are injected, no code changes required (the standard extension-
  * library mechanism, e.g. how Delta/Iceberg register).
  *
  * Engine.session also wires [[SimplifyEndsWithSource]] into existing
  * sessions through experimental.extraOptimizations (extensions only
  * apply at session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("slugify"),
      info("slugify", classOf[Slugify]), (es: Seq[Expression]) => Slugify(es.head)))
    e.injectFunction((FunctionIdentifier("extract_iso_date"),
      info("extract_iso_date", classOf[ExtractIsoDate]),
      (es: Seq[Expression]) => ExtractIsoDate(es.head)))
    e.injectFunction((FunctionIdentifier("fmt_month_abbrev"),
      info("fmt_month_abbrev", classOf[FmtMonthAbbrev]),
      (es: Seq[Expression]) => FmtMonthAbbrev(es.head)))
    e.injectFunction((FunctionIdentifier("html_escape"),
      info("html_escape", classOf[HtmlEscape]), (es: Seq[Expression]) => HtmlEscape(es.head)))
    e.injectFunction((FunctionIdentifier("clean_ws"),
      info("clean_ws", classOf[CleanWs]), (es: Seq[Expression]) => CleanWs(es.head)))
    e.injectFunction((FunctionIdentifier("ends_with_source"),
      info("ends_with_source", classOf[EndsWithSource]),
      (es: Seq[Expression]) => EndsWithSource(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("stable_hash64"),
      info("stable_hash64", classOf[StableHash64]),
      (es: Seq[Expression]) => StableHash64(es.head)))
    e.injectFunction((FunctionIdentifier("min_gram_hash"),
      info("min_gram_hash", classOf[MinGramHash]),
      (es: Seq[Expression]) => MinGramHash(es.head)))
    e.injectFunction((FunctionIdentifier("min_rolling_hash"),
      info("min_rolling_hash", classOf[MinRollingHash]),
      (es: Seq[Expression]) => MinRollingHash(es.head)))
    e.injectFunction((FunctionIdentifier("distinct_shingles3"),
      info("distinct_shingles3", classOf[DistinctShingles3]),
      (es: Seq[Expression]) => DistinctShingles3(es.head)))
    e.injectFunction((FunctionIdentifier("shingles2"),
      info("shingles2", classOf[Shingles2]),
      (es: Seq[Expression]) => Shingles2(es.head)))
    e.injectOptimizerRule(_ => SimplifyEndsWithSource)
  }
}
