package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Codegen'd Carter-Wegman MinHash signature over an array<string>
  * feature set: each feature is hashed ONCE (murmur3 → h1, xxhash64 → h2,
  * both reduced mod p = 2^31-1) and the `numHashes` signature slots take
  * the minima of `(h1 + i*h2) mod p` (computed incrementally: add, one
  * conditional subtract — no multiply, no division).
  *
  * The `mod p` per derived hash is load-bearing: without wraparound the
  * `i*h2` term dominates for large i, so every slot's argmin drifts
  * toward the feature with the smallest h2 — the slots correlate and the
  * banding's independence assumption collapses (observed: a jaccard-0.89
  * pair missed through 32 bands, theoretical miss probability 4e-14).
  *
  * Rationale: the `transform(sequence(0,h-1), i => array_min(transform(
  * sh, s => hash(s, i))))` formulation hashes every string h times AND
  * evaluates interpreted (boxed lambda per element); worse, staging the
  * base hashes as their own projection gets undone by CollapseProject,
  * which counts *static* references (1, inside the outer lambda) rather
  * than runtime evaluations (h per row) — measured 20s of the round-1
  * bench on 5000 docs. This expression is the whole signature as one
  * tight primitive loop inside whole-stage codegen: O(|features|) string
  * hashing + O(h*|features|) long compares.
  *
  * Values stay < 2^31, so ANSI Long arithmetic cannot overflow. Empty
  * arrays yield all-Long.MaxValue signatures (callers filter them);
  * null input → null; null elements are skipped (no signal).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> and numHashes > 0, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val s = arr.getUTF8String(j)
      if (s == null) { j += 1 } else {
      val h1 = java.lang.Math.floorMod(
        Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong,
        MinHashSig.P)
      val h2 = java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L),
        MinHashSig.P)
      var v = h1
      var i = 0
      while (i < numHashes) {
        if (v < sig(i)) sig(i) = v
        v += h2
        if (v >= MinHashSig.P) v -= MinHashSig.P
        i += 1
      }
      j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v")
      s"""
         |final int $m = $a.numElements();
         |final long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $m; $j++) {
         |  final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |  if ($s == null) continue; // null elements carry no signal
         |  final long $h1 = java.lang.Math.floorMod(
         |    (long) org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42),
         |    2147483647L);
         |  final long $h2 = java.lang.Math.floorMod(
         |    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L),
         |    2147483647L);
         |  long $v = $h1;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |    $v += $h2;
         |    if ($v >= 2147483647L) $v -= 2147483647L;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Carter-Wegman modulus (Mersenne prime 2^31-1). */
  final val P: Long = 2147483647L

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(features: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(
      ColumnBridge.catalystExpr(features), numHashes))
}
