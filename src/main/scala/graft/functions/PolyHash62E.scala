package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd scalar form of [[TextFunctions.polyHash62]]: the 62-bit
  * pack `h31(s) * 2^31 + h31b(s)` of the two portable polynomial char
  * folds ([[PortableHash]] — the single source of truth for the
  * constants; the identical arithmetic runs as DuckDB `list_reduce`
  * folds in the oracle SQL).
  *
  * The column-function formulation materializes a `transform(sequence
  * (1, length))` codes array per string — one boxed Long per CHARACTER
  * — before aggregating; this expression is one primitive loop inside
  * whole-stage codegen, the same interpreted-vs-codegen'd gap
  * [[SimHash62]] closed for feature arrays. Null input → null; the
  * empty string folds over no chars (seeds 7/11), matching the column
  * version's empty-array guard. "Char" means Java char / DuckDB
  * `ascii()` of a 1-char substring — identical for ASCII; non-ASCII is
  * out of scope for the oracle corpus (see [[PortableHash]]).
  */
case class PolyHash62E(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash62 requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash62"

  override def nullSafeEval(s: Any): Any =
    PolyHash62E.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash62E.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash62E =
    copy(child = newChild)
}

object PolyHash62E {

  /** Static entry shared by interpreted eval and generated code. */
  def compute(u: UTF8String): Long = PortableHash.h62(u.toString)

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(s: Column): Column =
    ColumnBridge.column(PolyHash62E(ColumnBridge.catalystExpr(s)))
}
