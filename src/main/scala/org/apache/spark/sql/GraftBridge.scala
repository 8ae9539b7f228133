package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * Column construction behind ColumnNode). Standard extension-library
  * pattern: a tiny shim compiled into the org.apache.spark.sql package. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` and `TypeCollection` are `private[sql]` in Spark 4;
    * expose the handful of expected-input shapes graft expressions need so
    * they can declare `inputTypes` (analysis-time type checking). */
  type AbstractType = types.AbstractDataType
  val stringArray: AbstractType = types.ArrayType(types.StringType)
  val longArray: AbstractType = types.ArrayType(types.LongType)
  val floatOrDoubleArray: AbstractType = types.TypeCollection(
    types.ArrayType(types.FloatType), types.ArrayType(types.DoubleType))

  /** `sessionUUID` is `private[sql]`: globally-unique session identity for
    * cache keying (identityHashCode collides across live/dead sessions). */
  def sessionUUID(spark: SparkSession): Option[String] = spark match {
    case c: classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }
}
