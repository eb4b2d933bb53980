package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge: Spark 4 made `ExpressionUtils`
  * private[sql], and custom Catalyst expressions (graft.plans) need both
  * directions. This is the conventional extension-point shim — the only
  * graft code living inside the org.apache.spark.sql namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
