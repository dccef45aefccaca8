package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VecDot

/** Column-level vector math built on the custom codegen'd
  * [[org.apache.spark.sql.graft.VecDot]] Catalyst expression — see that
  * file for why a custom Expression (and not `aggregate`/`zip_with` or a
  * UDF) backs the similarity-search hot path.
  */
object Vectors {

  /** Sequential-fold dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column = VecDot.column(a, b)

  /** L2 norm via the same fold (sum of squares, then sqrt). */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))
}
