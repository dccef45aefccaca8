package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for dense-vector dot products.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)` —
  * is semantically right but interpreted (higher-order functions don't
  * participate in codegen) and allocates lambda frames per element: ~100×
  * slower in the O(n²) similarity-join hot path. This expression emits a
  * tight primitive loop under whole-stage codegen and an allocation-free
  * interpreted eval, with EXACTLY the same numeric semantics (sequential
  * left-fold of products over IEEE doubles) so oracle comparisons are
  * unchanged bit-for-bit.
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` and the
  * Expression→Column lift are `private[sql]`; this file is the only
  * sql-internal touchpoint in the codebase.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // NULL on length mismatch (below), even for non-nullable inputs.
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Match the HOF form on ragged inputs too: zip_with pads the shorter
    // array with nulls and null propagates through the fold, so
    // aggregate(zip_with(...)) yields NULL — not a min-length sum.
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column lift (ExpressionUtils is private[sql]). */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
