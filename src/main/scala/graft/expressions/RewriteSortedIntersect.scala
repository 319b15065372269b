package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{And, ArrayIntersect, ArraySort, Expression, GreaterThan, If, IsNull, LambdaFunction, LessThan, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: `size(array_intersect(array_sort(a), array_sort(b)))`
  * over long arrays becomes the native two-pointer
  * [[SortedIntersectSize]] — intersection COUNTS never need the
  * intersection ARRAY, and the explicit `array_sort` calls prove the
  * merge-walk precondition. [[SortedIntersectSize]] counts distinct
  * common values (skipping duplicate runs), exactly `array_intersect`'s
  * dedup semantics, so the rewrite is semantics-preserving for ALL
  * inputs, duplicates included.
  *
  * Only fires for the default ascending comparator and non-null long
  * elements (what the dedup pipeline produces); anything else is left
  * for the built-in hash-set implementation. Registered through
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) — the Rule rung of
  * the custom-operator ladder, next to the Expression rung.
  */
object RewriteSortedIntersect extends Rule[LogicalPlan] {

  /** The analyzer binds ArraySort.defaultComparator into a resolved
    * lambda over fresh variables, so the unresolved template never
    * semanticEquals it — rebuild the expected body over the lambda's OWN
    * variables and compare that. */
  private def isDefaultAscending(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(l, r), _) =>
      val expected = If(And(IsNull(l), IsNull(r)), Literal(0),
        If(IsNull(l), Literal(1),
          If(IsNull(r), Literal(-1),
            If(LessThan(l, r), Literal(-1),
              If(GreaterThan(l, r), Literal(1), Literal(0))))))
      body.semanticEquals(expected)
    case _ => false
  }

  private def eligible(s: ArraySort): Boolean =
    isDefaultAscending(s.function) &&
      (s.argument.dataType match {
        case ArrayType(LongType, containsNull) => !containsNull
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l: ArraySort, r: ArraySort), false)
          if eligible(l) && eligible(r) =>
        SortedIntersectSize(l, r)
    }
}
