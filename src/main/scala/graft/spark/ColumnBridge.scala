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

  /** Wrap an internal-row RDD as a STREAMING DataFrame — what a V1
    * streaming `Source.getBatch` must return (the engine asserts
    * `isStreaming`; the public `createDataFrame` can't set it). Same
    * `internalCreateDataFrame(_, _, isStreaming = true)` call the
    * built-in file stream source makes. */
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
                         rdd: org.apache.spark.rdd.RDD[
                           org.apache.spark.sql.catalyst.InternalRow],
                         schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
