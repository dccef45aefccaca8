package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{AtomicType, StructType}

/** Optimizer rule: rewrite `min(struct(a, b))` / `max(struct(a, b))`
  * aggregates — the reference's open/close idiom
  * (silver_to_gold_bars.py:42-43) and a common SQL argmin pattern — into
  * a struct OVER two primitive-buffer aggregates:
  *
  *   min(struct(a, b))  ==>  named_struct('a', min(a), 'b', arg_min_tb(b, a))
  *
  * Semantics are identical (lexicographic struct ordering: field0 is the
  * global min; field1 is the value at the minimal field0, ties resolved
  * to the smaller field1 — exactly [[ArgExtremum]]'s tie-break), but the
  * aggregation buffer becomes two primitive slots instead of a struct,
  * so Catalyst plans a HashAggregate instead of a SortAggregate: two
  * fewer full sorts of the input. When the query only extracts one field
  * (`min(struct(ts, p)).p`), SimplifyExtractValueOps then collapses the
  * struct away entirely, leaving a single ArgExtremum.
  *
  * Scope guards: exactly 2 fields, both AtomicType (orderable,
  * primitive-buffer-able), inputs non-nested; DISTINCT/FILTER aggregates
  * left untouched.
  */
object StructExtremumRewrite extends Rule[LogicalPlan] {

  private def rewritable(s: CreateNamedStruct): Boolean =
    s.valExprs.length == 2 &&
      s.valExprs.forall(_.dataType.isInstanceOf[AtomicType])

  private def rebuild(s: CreateNamedStruct, isMin: Boolean,
                      template: AggregateExpression): Expression = {
    val Seq(ord, value) = s.valExprs
    // fresh resultIds: physical planning dedups aggregate functions by
    // resultId — reusing the template's would alias the two aggregates
    val f0 = template.copy(
      aggregateFunction = if (isMin) Min(ord) else Max(ord),
      resultId = NamedExpression.newExprId)
    val f1 = template.copy(
      aggregateFunction = ArgExtremum(ord, value, isMin),
      resultId = NamedExpression.newExprId)
    CreateNamedStruct(Seq(
      s.nameExprs(0), f0,
      s.nameExprs(1), f1))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(Min(s: CreateNamedStruct), _, false, None, _)
            if rewritable(s) =>
          rebuild(s, isMin = true, ae)
        case ae @ AggregateExpression(Max(s: CreateNamedStruct), _, false, None, _)
            if rewritable(s) =>
          rebuild(s, isMin = false, ae)
      }
  }
}
