package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** argmin/argmax with a deterministic tie-break — the OHLCV open/close
  * aggregate (reference silver_to_gold_bars.py:42-43 uses
  * `min(struct(event_time, price))`; same semantics here: smallest
  * ordering wins, ties broken by the smaller (argmin) / larger (argmax)
  * VALUE).
  *
  * Why not keep `min(struct(...))`: struct-typed aggregation buffers are
  * not hash-aggregable, so Catalyst plans a SortAggregate — two extra
  * full sorts of the fact table at scale. This DeclarativeAggregate keeps
  * the buffer as two PRIMITIVE slots (ordering, value), so the plan is a
  * plain partial+final HashAggregate with whole-stage codegen: measured
  * identical results, no sorts.
  *
  * Rows with a null ordering or null value are ignored (they cannot win),
  * matching the pipeline's non-null event_time/price contract.
  */
case class ArgExtremum(ord: Expression, value: Expression, isMin: Boolean)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = value

  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType
  override def prettyName: String = if (isMin) "arg_min_tb" else "arg_max_tb"

  private lazy val bOrd = AttributeReference("bOrd", ord.dataType)()
  private lazy val bVal = AttributeReference("bVal", value.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bOrd, bVal)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, ord.dataType), Literal.create(null, value.dataType))

  private def beats(candOrd: Expression, candVal: Expression,
                    curOrd: Expression, curVal: Expression): Expression = {
    val ordWins =
      if (isMin) LessThan(candOrd, curOrd) else GreaterThan(candOrd, curOrd)
    val valWins =
      if (isMin) LessThan(candVal, curVal) else GreaterThan(candVal, curVal)
    Or(IsNull(curOrd),
      Or(ordWins, And(EqualTo(candOrd, curOrd), valWins)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(And(IsNotNull(ord), IsNotNull(value)),
      beats(ord, value, bOrd, bVal))
    Seq(If(take, ord, bOrd), If(take, value, bVal))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bOrd.right),
      beats(bOrd.right, bVal.right, bOrd.left, bVal.left))
    Seq(If(take, bOrd.right, bOrd.left), If(take, bVal.right, bVal.left))
  }

  override lazy val evaluateExpression: Expression = bVal

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgExtremum =
    copy(ord = newLeft, value = newRight)
}

object ArgExtremum {
  /** value at the minimum ordering; ties take the smaller value. */
  def argMin(value: Column, ord: Column): Column =
    ExpressionUtils.column(
      ArgExtremum(ExpressionUtils.expression(ord),
        ExpressionUtils.expression(value), isMin = true)
        .toAggregateExpression())

  /** value at the maximum ordering; ties take the larger value. */
  def argMax(value: Column, ord: Column): Column =
    ExpressionUtils.column(
      ArgExtremum(ExpressionUtils.expression(ord),
        ExpressionUtils.expression(value), isMin = false)
        .toAggregateExpression())
}
