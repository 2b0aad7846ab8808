package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, needed
  * to expose custom Catalyst expressions (graft.functions.VectorExpressions)
  * through the public Column API on Spark 4.x (where `Column` no longer
  * wraps an `Expression` directly).
  */
object GraftInternals {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** `types.AbstractDataType` is `private[sql]`; expressions outside the
    * spark package need this alias to override `inputTypes`. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
