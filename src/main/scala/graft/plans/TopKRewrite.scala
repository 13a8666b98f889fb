package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-rule extension (SURVEY.md §2-J, the `Rule[LogicalPlan]`
  * tier): rewrites the universal top-k-per-group idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).where("rn <= k").drop("rn") }}}
  *
  * into the [[TopKPerGroup]] whole-operator plan node, so users who
  * write the declarative window formulation get the bounded-heap
  * two-phase execution (no per-partition full sort, k-rows-per-group
  * exchange) without changing their code. Registered only through
  * `GraftExtensions` (`injectOptimizerRule`) — sessions without the
  * extension keep stock planning.
  *
  * The rewrite fires only when it is provably safe:
  *  - exactly one window expression, and it is `row_number()` over the
  *    standard running frame;
  *  - the filter is a bare bound on that rank (`rn <= k`, `rn < k`,
  *    `rn = 1`, or the mirrored forms) with a literal k in [1, 10000];
  *  - the projection above DROPS the rank column (the operator cannot
  *    emit it), and references only the window child's columns;
  *  - partition keys are bare attributes and the sort order uses bare
  *    attributes with default null ordering (the operator's contract).
  *
  * Spark's own `InferWindowGroupLimit` may already have inserted a
  * `WindowGroupLimit` below the Window by the time this rule runs —
  * that node is subsumed by the rewrite and stripped.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {
  private val MaxRewriteK = 10000

  /** The filter bound on the rank attribute, as a top-k limit. */
  private def limitFrom(cond: Expression, rn: ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.exprId == rn => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.exprId == rn => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.exprId == rn => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute)
        if a.exprId == rn => Some(1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
        if a.exprId == rn => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
        if a.exprId == rn => Some(k - 1)
      case _ => None
    }

  private def defaultNullOrdering(so: SortOrder): Boolean =
    so.nullOrdering == so.direction.defaultNullOrdering

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(cond,
          Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
                  CurrentRow))), _)),
            partitionSpec, orderSpec, windowChild, _)))
      if limitFrom(cond, rnAlias.exprId)
           .exists(k => k >= 1 && k <= MaxRewriteK) &&
         partitionSpec.nonEmpty &&
         partitionSpec.forall(_.isInstanceOf[Attribute]) &&
         orderSpec.nonEmpty &&
         orderSpec.forall(so => so.child.isInstanceOf[Attribute] &&
           defaultNullOrdering(so)) &&
         projectList.forall(_.references.subsetOf(windowChild.outputSet)) =>
      val k = limitFrom(cond, rnAlias.exprId).get
      // A WindowGroupLimit Spark inferred below the Window is subsumed —
      // but ONLY when provably redundant with this rewrite (same specs,
      // row_number semantics, limit no tighter than k). Anything else is
      // kept as the child: TopKPerGroup-over-it still computes exactly
      // what the original filter-over-Window-over-it computed, whereas
      // stripping an unrelated or tighter limit would WIDEN the result.
      val child = windowChild match {
        case WindowGroupLimit(ps, os, RowNumber(), limit, c)
          if limit >= k && ps == partitionSpec && os == orderSpec => c
        case c => c
      }
      Project(projectList,
        TopKPerGroup(partitionSpec.map(_.asInstanceOf[Attribute]),
          orderSpec, k, maxPartialGroups = 100000, child))
  }
}
