package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column(expr)` / `Column.expr` private to the sql package
  * (Column is now a Connect-agnostic wrapper over ColumnNode). This tiny
  * bridge lives in an `org.apache.spark.sql` subpackage solely to expose
  * the classic Expression <-> Column conversion to the graft library —
  * the standard approach extension libraries use on Spark 4.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** private[sql] normalizer exposed for custom operators whose
    * grouping uses binary row equality (-0.0/0.0, NaN bit patterns). */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** `array<double> | array<float>` input spec for ImplicitCastInputTypes
    * (TypeCollection/AbstractDataType are private[sql]): exact float/
    * double arrays pass uncast, other numeric arrays widen to double. */
  def floatOrDoubleArray: org.apache.spark.sql.types.AbstractDataType =
    org.apache.spark.sql.types.TypeCollection(
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
}

/** Same bridge for LogicalPlan -> DataFrame (Dataset.ofRows is
  * private[sql]); used by custom operators that build their own
  * logical nodes (e.g. graft.plans.TopKPerKey). */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
