package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved [[Column]] onto ColumnNode (sql-api); the catalyst
  * Expression accessors live in `org.apache.spark.sql.classic` with
  * `private[sql]` visibility. This bridge (compiled into the sql package
  * hierarchy) re-exports the two conversions the graft planner needs:
  * reading an unresolved predicate's referenced names, and wrapping custom
  * catalyst Expressions as user-facing Columns.
  */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly converted catalyst expression (ExpressionUtils.expression is
    * a lazy ColumnNodeExpression wrapper whose tree can't be walked). */
  def catalystExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** The user-visible name of a plain/aliased column reference, if any. */
  def refName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.Alias => Some(a.name.head)
    case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
      Some(a.nameParts.mkString("."))
    case _ => None
  }
}
