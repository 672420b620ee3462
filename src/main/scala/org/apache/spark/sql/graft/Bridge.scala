package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so extension
  * libraries expose it via a shim in the sql namespace — the standard
  * pattern used by open-source Spark extensions. Nothing else in this
  * repo lives outside the `graft` namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
