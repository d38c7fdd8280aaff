package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for custom Catalyst expressions.
 *
 * Spark 4 made the converters (`classic.ExpressionUtils`) `private[sql]`, so
 * third-party expression libraries use the standard extension technique of a
 * tiny adapter object inside the `org.apache.spark.sql` package scope — this
 * file contains ONLY these two one-line forwards; everything else of ours
 * lives under `graft.*`.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
