package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd winnowing fingerprint selection (Schleimer/Wilkerson/Aiken
  * 2003) of a text column: per-token packs (31*len + first-char code),
  * k-gram pack folds mod 2^31-1, then the minimum of every w-wide
  * window over the gram-hash sequence, distinct in first-occurrence
  * order — the exact values of the HOF formulation kept as
  * [[graft.ops.TextAnalysis.winnowFingerprintsHof]] (differential spec
  * in FunctionsSpec), computed in ONE compiled pass. Window minima use
  * a monotonic deque, O(grams) total instead of O(grams*w), and no
  * per-element lambda interpretation (the same lesson as
  * [[GramMassStats]] / [[WordShingles]]: per-token inner loops belong
  * in compiled code, not nested Catalyst lambdas).
  *
  * Oracle parity: tokens = every single-space split keeping empties,
  * pack = 31*codepoint-length + first-codepoint (ASCII corpus assumed,
  * as with [[graft.functions.TextFunctions.polyHash62]] — byte-vs-
  * codepoint differences would diverge on non-ASCII). Texts with fewer
  * than k tokens yield an empty array; 1 <= grams < w yields the min
  * of all grams (one truncated window); null input → null.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument and k, w > 0, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(a: Any): Any =
    WinnowFps.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFps.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private val SPACE = UTF8String.fromString(" ")
  private val P = 2147483647L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val m = toks.length
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val packs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = toks(i)
      // first codepoint, 0 for the empty token — matches
      // ascii(substring(t, 1, 1)) on ASCII input
      val first =
        if (t.numChars() == 0) 0L
        else t.substring(0, 1).toString.codePointAt(0).toLong
      packs(i) = 31L * t.numChars() + first
      i += 1
    }
    val ng = m - k + 1
    val gh = new Array[Long](ng)
    i = 0
    while (i < ng) {
      var acc = (7L * 31L + packs(i)) % P
      var j = 1
      while (j < k) { acc = (acc * 31L + packs(i + j)) % P; j += 1 }
      gh(i) = acc
      i += 1
    }
    val nWin = math.max(ng - w + 1, 1)
    val out = new LinkedHashSet[java.lang.Long](math.max(16, nWin))
    // monotonic deque of candidate indices: values increase front to
    // back; the front is the current window's minimum
    val dq = new Array[Int](ng)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < ng) {
      while (tail > head && gh(dq(tail - 1)) >= gh(i)) tail -= 1
      dq(tail) = i; tail += 1
      // window ending at i starts at i-w+1; evict indices before it
      while (dq(head) < i - w + 1) head += 1
      // emit once the first full (or final truncated) window is formed
      if (i >= w - 1 || i == ng - 1) out.add(gh(dq(head)))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(arr)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.catalystExpr(text), k, w))
}
