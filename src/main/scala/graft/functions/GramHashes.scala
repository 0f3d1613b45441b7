package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd sliding-window substring hashes: the 62-bit
  * [[PortableHash]] pack of EVERY length-`gramLen` character gram of
  * the string, one array entry per start position (position i holds
  * `h62(s.substring(i, i + gramLen))` — bit-identical to the direct
  * per-gram fold, which is what the DuckDB oracle replays per
  * position).
  *
  * Computed with a TRUE rolling modular hash — O(n) total, not
  * O(n·gramLen): each of the two 31-bit folds maintains the seedless
  * window sum `R = Σ c_j · b^(L-1-j) mod p` (update: subtract the
  * outgoing char's `c·b^(L-1)`, multiply by b, add the incoming char)
  * and emits `(seed · b^L + R) mod p`, which algebraically equals the
  * seeded fold over the gram. All intermediates fit a Long:
  * `c·b^(L-1) mod p < 2^31`, `R·b + c < 2^36`.
  *
  * This is the corpus-scale primitive behind exact duplicated-substring
  * detection ([[graft.ops.Dedup.duplicateSubstringSpans]] — the
  * suffix-array-free form of Lee et al.'s training-data dedup): one
  * codegen pass per document, 8 bytes per gram into the shuffle
  * instead of the 2·L-byte gram itself.
  *
  * Strings shorter than `gramLen` yield an empty array; null → null.
  * "Char" = Java char, matching [[PortableHash]]'s oracle contract
  * (ASCII corpus regime).
  */
case class GramHashes(child: Expression, gramLen: Int)
    extends UnaryExpression {

  require(gramLen >= 1 && gramLen <= 10000,
    s"gram_hashes: gramLen $gramLen outside 1..10000")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(a: Any): Any = {
    val arr = GramHashes.compute(a.asInstanceOf[UTF8String], gramLen)
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions." +
        s"UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.GramHashes.compute($a, $gramLen));")

  override protected def withNewChildInternal(
      newChild: Expression): GramHashes = copy(child = newChild)
}

object GramHashes {

  private val P1 = 2147483647L // h31:  base 31, seed 7
  private val P2 = 2147483629L // h31b: base 37, seed 11

  private def powMod(b: Long, e: Int, p: Long): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = (r * b) % p; i += 1 }
    r
  }

  /** Static entry shared by interpreted eval and generated code. */
  def compute(u: UTF8String, gramLen: Int): Array[Long] = {
    val s = u.toString
    val n = s.length
    if (n < gramLen) return Array.emptyLongArray
    val pw1 = powMod(31L, gramLen - 1, P1) // b^(L-1) for the outgoing char
    val pw2 = powMod(37L, gramLen - 1, P2)
    val seed1 = (7L * powMod(31L, gramLen, P1)) % P1 // seed·b^L term
    val seed2 = (11L * powMod(37L, gramLen, P2)) % P2
    val out = new Array[Long](n - gramLen + 1)
    var r1 = 0L; var r2 = 0L
    var i = 0
    while (i < gramLen) { // first window's seedless sums
      val c = s.charAt(i).toLong
      r1 = (r1 * 31L + c) % P1
      r2 = (r2 * 37L + c) % P2
      i += 1
    }
    out(0) = ((seed1 + r1) % P1) * 2147483648L + ((seed2 + r2) % P2)
    var p = 1
    while (p <= n - gramLen) {
      val cOut = s.charAt(p - 1).toLong
      val cIn = s.charAt(p + gramLen - 1).toLong
      r1 = ((r1 - (cOut * pw1) % P1 + P1) * 31L + cIn) % P1
      r2 = ((r2 - (cOut * pw2) % P2 + P2) * 37L + cIn) % P2
      out(p) = ((seed1 + r1) % P1) * 2147483648L + ((seed2 + r2) % P2)
      p += 1
    }
    out
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column, gramLen: Int): Column =
    ColumnBridge.column(
      GramHashes(ColumnBridge.catalystExpr(text), gramLen))
}
