package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd one-deletion signature family over an array<string> token
  * set: slot 0 is the signature of the FULL set, slot i (1-based) the
  * signature with element i−1 removed — the deletion-neighborhood
  * blocking index of [[graft.ops.Dedup.deletionNeighborPairs]].
  *
  * Each element is hashed ONCE (xxhash64) and the n+1 signatures come
  * from a positional polynomial over mod-2^64 wraparound arithmetic
  * (odd base B, so positions stay distinguishable):
  * full = Σ_j h_j·B^j, and deleting rank i shifts the tail down one
  * position: del_i = prefix_i + tail_i with prefix_i = Σ_{j<i} h_j·B^j
  * and tail_i = Σ_{j>i} h_j·B^(j−1), both built in ONE right-to-left
  * pass + ONE left-to-right pass — O(n) total hashing and arithmetic.
  *
  * Rationale: the concat_ws-then-xxhash64 formulation re-serializes
  * and re-hashes the whole (n−1)-token array for EACH deletion — Θ(n²)
  * bytes hashed per set, the q247 cost ceiling at long-document scale.
  * This expression is the whole signature family in one primitive loop
  * inside whole-stage codegen. A signature is only a BLOCKING key —
  * collisions ADD candidates (removed by the exact set verify), never
  * drop a true pair — so wraparound mod-2^64 is sufficient.
  *
  * Null input → null; a null element hashes as 0 (keeps ranks aligned
  * with the input array, which callers build null-free anyway).
  */
case class DeletionSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deletion_sigs requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_sigs"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      hs(j) =
        if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, DeletionSigs.SEED)
      j += 1
    }
    val out = new Array[Long](n + 1)
    // Slot s (1-based) deletes element d = s−1: del_d = prefix_d +
    // tail_d, prefix_d = Σ_{j<d} h_j·B^j, tail_d = Σ_{j>d} h_j·B^(j−1).
    // Right-to-left accumulates tails (slot s holds tail_{s−1}, i.e.
    // the sum over j ≥ s weighted B^(j−1)); left-to-right then adds
    // prefixes and finishes the full signature into slot 0.
    var tail = 0L
    var pw = if (n >= 2) DeletionSigs.powB(n - 2) else 1L
    var i = n - 1
    while (i >= 1) {
      tail = tail + hs(i) * pw
      out(i) = tail
      pw = pw * DeletionSigs.BINV_STEP
      i -= 1
    }
    if (n >= 1) out(n) = 0L // deleting the last element: tail empty
    var prefix = 0L
    var bp = 1L
    j = 0
    while (j < n) {
      out(j + 1) += prefix
      prefix = prefix + hs(j) * bp
      bp = bp * DeletionSigs.B
      j += 1
    }
    out(0) = prefix
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val hs = ctx.freshName("hs")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val tail = ctx.freshName("tail")
      val pw = ctx.freshName("pw")
      val prefix = ctx.freshName("prefix")
      val bp = ctx.freshName("bp")
      s"""
         |final int $n = $a.numElements();
         |final long[] $hs = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |  $hs[$j] = ($s == null) ? 0L :
         |    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(),
         |      ${DeletionSigs.SEED}L);
         |}
         |final long[] $out = new long[$n + 1];
         |long $tail = 0L;
         |long $pw = graft.functions.DeletionSigs.powB($n - 2);
         |for (int $i = $n - 1; $i >= 1; $i--) {
         |  $tail += $hs[$i] * $pw;
         |  $out[$i] = $tail;
         |  $pw *= ${DeletionSigs.BINV_STEP}L;
         |}
         |if ($n >= 1) $out[$n] = 0L;
         |long $prefix = 0L;
         |long $bp = 1L;
         |for (int $j = 0; $j < $n; $j++) {
         |  $out[$j + 1] += $prefix;
         |  $prefix += $hs[$j] * $bp;
         |  $bp *= ${DeletionSigs.B}L;
         |}
         |$out[0] = $prefix;
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DeletionSigs =
    copy(child = newChild)
}

object DeletionSigs {
  /** Odd positional base (golden-ratio mix constant) — odd keeps
    * B^j ≠ 0 mod 2^64 at every position. */
  final val B: Long = 0x9E3779B97F4A7C15L
  /** The right-to-left pass needs B^(j-1) DESCENDING, i.e. each step
    * multiplies by B^{-1} — but mod-2^64 inversion is avoidable: we
    * walk powers DOWN by precomputing the top power and multiplying
    * by the modular inverse of B. Both constants are compile-time. */
  final val BINV_STEP: Long = modInverseB
  final val SEED: Long = 77L

  /** B^e mod 2^64 (e < 0 → B^0 = 1, the n ≤ 1 degenerate sizes). */
  def powB(e: Int): Long = {
    var r = 1L; var b = B; var k = math.max(e, 0)
    while (k > 0) { if ((k & 1) == 1) r *= b; b *= b; k >>= 1 }
    r
  }

  /** Newton's iteration inverse of odd B mod 2^64: 5 steps double the
    * correct low bits from 1 to 64. */
  private def modInverseB: Long = {
    var x = B // x ≡ B^{-1} mod 2^3 for odd B
    var k = 0
    while (k < 5) { x = x * (2L - B * x); k += 1 }
    x
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(tokens: Column): Column =
    ColumnBridge.column(DeletionSigs(ColumnBridge.catalystExpr(tokens)))
}
