package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Registered via the standard extension point:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * }}}
  * after which `SELECT vec_dot(a, b)`, `arg_min_tb(value, ord)` and
  * `arg_max_tb(value, ord)` work from plain SQL. [[GraftExtensions.register]]
  * adds the same functions to an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => StructExtremumRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  /** SQL-callable builders see whatever argument list the user typed, so
    * every builder validates arity up front — a proper AnalysisException
    * (standard WRONG_NUM_ARGS error class) instead of the
    * IndexOutOfBounds/NoSuchElement a bare `children(i)` would throw at
    * plan time.
    */
  private def checkArity(name: String, expected: Int,
                         children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** (identifier, info, builder) triples for every SQL-exposed function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-fold dot product of two array<double>"),
      (children: Seq[Expression]) => {
        checkArity("vec_dot", 2, children)
        VecDot(children(0), children(1))
      }),
    (FunctionIdentifier("arg_min_tb"),
      info("arg_min_tb", "arg_min_tb(value, ord) - value at min ord; ties take smaller value"),
      (children: Seq[Expression]) => {
        checkArity("arg_min_tb", 2, children)
        ArgExtremum(children(1), children(0), isMin = true)
      }),
    (FunctionIdentifier("arg_max_tb"),
      info("arg_max_tb", "arg_max_tb(value, ord) - value at max ord; ties take larger value"),
      (children: Seq[Expression]) => {
        checkArity("arg_max_tb", 2, children)
        ArgExtremum(children(1), children(0), isMin = false)
      }),
    (FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text) - 60-bit SimHash of space-tokenized text"),
      (children: Seq[Expression]) => {
        checkArity("simhash60", 1, children)
        SimHash60(children.head)
      }),
    (FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - sequential-fold squared L2 distance of two array<double>"),
      (children: Seq[Expression]) => {
        checkArity("vec_l2sq", 2, children)
        VecL2Sq(children(0), children(1))
      }))

  /** Register on an existing session (temp-function registry + the
    * struct-extremum optimizer rule).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(StructExtremumRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StructExtremumRewrite
  }
}
