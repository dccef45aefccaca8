package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for squared L2 distance between dense
  * vectors — the inner loop of product-quantization training, encoding
  * and ADC table construction ([[graft.operators.Similarity.annPqAdc]]).
  *
  * Same rationale as [[VecDot]]: the composable form
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, +)` is
  * interpreted (higher-order functions don't codegen) and allocates
  * lambda frames per element; this emits a tight primitive loop under
  * whole-stage codegen with EXACTLY the same numeric semantics
  * (sequential left-fold of squared differences over IEEE doubles), so
  * the DuckDB oracle mirror `list_sum(list_transform(list_zip(...)))`
  * stays bit-identical.
  */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // NULL on length mismatch (below), even for non-nullable inputs.
  override def nullable: Boolean = true

  override def prettyName: String = "vec_l2sq"

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
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecL2Sq {
  /** Column lift (ExpressionUtils is private[sql]). */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(VecL2Sq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
