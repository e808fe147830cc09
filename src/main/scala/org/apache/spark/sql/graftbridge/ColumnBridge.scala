package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * so graft's native Catalyst expressions (SimHash64, ...) can be
  * exposed as ordinary `Column`s. Lives under org.apache.spark.sql
  * purely for access; contains no Spark-internal copies.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** If `c` is `<something>.cast(dt)` at the Column-node level
    * (Spark 4 Columns are node trees, not catalyst expressions),
    * return the uncast inner Column and the target type name —
    * callers that need to apply a window frame INSIDE the cast
    * (cast-wrapped aggregates) peel it here.
    */
  def uncast(c: Column): Option[(Column, org.apache.spark.sql.types.DataType)] =
    c.node match {
      case org.apache.spark.sql.internal.Cast(child, dt, _, _) =>
        Some((Column(child), dt))
      case _ => None
    }
}
