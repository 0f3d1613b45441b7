package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd 62-bit SimHash over an array<string> feature set, using
  * DuckDB-portable polynomial char hashes so the oracle SQL reproduces
  * the value bit-for-bit:
  *
  *   h1(g) = fold(7,  (a,c) => (a*31 + c) mod 2147483647) over chars
  *   h2(g) = fold(11, (a,c) => (a*37 + c) mod 2147483629) over chars
  *   h(g)  = h1 * 2^31 + h2                      (62 bits)
  *   bit j of result = [ sum over g of (bit j of h(g) ? +1 : -1) > 0 ]
  *
  * "Char" means Java char / DuckDB `ascii()` of a 1-char substring —
  * identical for ASCII; non-ASCII text would diverge (codepoint vs
  * UTF-16) and is out of scope for the oracle corpus.
  *
  * The column-function formulation (aggregate + zip_with over a
  * 62-element vote array per feature) is interpreted and allocates
  * ~62 boxed longs per feature; this expression is one primitive loop
  * (measured 7.8s -> sub-second on the 5000-doc bench corpus).
  * Empty arrays hash to 0; null input → null.
  */
case class SimHash62(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash62 requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash62"

  override def nullSafeEval(a: Any): Any =
    SimHash62.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash62.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash62 =
    copy(child = newChild)
}

object SimHash62 {

  /** Static entry shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val m = arr.numElements()
    val votes = new Array[Int](62)
    var j = 0
    while (j < m) {
      val u = arr.getUTF8String(j)
      if (u == null) { j += 1 } // null elements carry no signal
      else {
      val h = PortableHash.h62(u.toString)
      var b = 0
      while (b < 62) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 62) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(features: Column): Column =
    ColumnBridge.column(SimHash62(ColumnBridge.catalystExpr(features)))
}
