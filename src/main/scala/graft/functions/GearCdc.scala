package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Codegen'd Gear-style content-defined chunking boundaries (the
  * rolling-hash cut-point detector behind CDC dedup — Xia et al.,
  * FastCDC, USENIX ATC'16, and every storage dedup system since LBFS):
  * scan the string's bytes with the rolling recurrence
  *
  *   h ← (2·h + g(b)) mod 2^31,   g(b) = ((b+1)·48271) mod (2^31−1)
  *
  * and emit a boundary AFTER byte position i (1-based) whenever
  * `h mod 2^maskBits == 0`. Because the modulus is a power of two,
  * each byte's contribution shifts out after 31 steps — h depends
  * only on the last 31 bytes, so boundaries are CONTENT-LOCAL:
  * inserting or deleting text re-cuts only the chunks it touches,
  * which is exactly the shift-resistance that makes chunk-level dedup
  * robust where fixed-width spans ([[graft.ops.Dedup.duplicateSpans]])
  * re-align everything downstream of an edit.
  *
  * Expected chunk length ≈ 2^maskBits bytes. No min/max clamping: a
  * clamp makes each boundary depend on the PREVIOUS one (sequential
  * state), while the pure form is position-independent — fully
  * parallel, and replayable in the SQL oracle as a per-position
  * 31-term window sum (q451). All arithmetic is small-integer exact
  * (terms < 2^61, sums < 2^36) — portable to any engine.
  *
  * The hash scans UTF-8 BYTES, but cut points are emitted only where
  * they fall on a CHARACTER boundary and as CHARACTER positions, so
  * `substring` slicing is always well formed on multibyte text; on
  * ASCII (the oracle's regime) byte and character positions coincide.
  *
  * Null input → null; returns the strictly ascending char positions
  * (an empty array when no boundary fires).
  */
case class GearBoundaries(child: Expression, maskBits: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 30,
    s"gear_boundaries: maskBits $maskBits outside 1..30")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gear_boundaries requires string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gear_boundaries"

  private val mask: Long = (1L << maskBits) - 1L

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = s.numBytes
    val out = new Array[Int](n)
    var cnt = 0
    var h = 0L
    var chars = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if ((b & 0xc0) != 0x80) chars += 1 // byte starts a character
      h = (2L * h + ((b + 1L) * 48271L) % 2147483647L) & 0x7fffffffL
      // cut only when byte i ENDS a character (next byte is not a
      // continuation) — positions are char counts, strictly ascending
      if ((h & mask) == 0L &&
          (i == n - 1 || (s.getByte(i + 1) & 0xc0) != 0x80)) {
        out(cnt) = chars; cnt += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val chars = ctx.freshName("chars")
      s"""
         |final int $n = $a.numBytes();
         |final int[] $out = new int[$n];
         |int $cnt = 0;
         |long $h = 0L;
         |int $chars = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $b = $a.getByte($i) & 0xff;
         |  if (($b & 0xc0) != 0x80) $chars++;
         |  $h = (2L * $h + (($b + 1L) * 48271L) % 2147483647L) & 0x7fffffffL;
         |  if (($h & ${mask}L) == 0L &&
         |      ($i == $n - 1 || ($a.getByte($i + 1) & 0xc0) != 0x80)) {
         |    $out[$cnt++] = $chars;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf($out, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): GearBoundaries = copy(child = newChild)
}

object GearBoundaries {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column, maskBits: Int): Column =
    ColumnBridge.column(
      GearBoundaries(ColumnBridge.catalystExpr(text), maskBits))
}
