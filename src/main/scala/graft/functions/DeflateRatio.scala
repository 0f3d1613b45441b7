package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd deflate compressibility ratio (compressed / raw bytes) —
  * the "machine-generated or pathologically repetitive text" signal.
  * Replaces the codebase's last Scala UDF: a UDF forces the row out of
  * the Tungsten format (UTF8String → java.lang.String conversion per
  * row plus a serialization fence around the call), while this
  * expression stays inside whole-stage codegen and hands the raw UTF-8
  * bytes straight to zlib.
  *
  * The zlib state (level 6) is thread-local and reset()-reused across
  * rows — constructing and freeing a Deflater per row would be
  * billions of native alloc/free cycles at corpus scale. Empty text →
  * 1.0 (incompressible by fiat), null → null. Deterministic: zlib
  * level-6 output is a pure function of the input bytes. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires a string argument, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(a: Any): Any =
    DeflateRatio.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateRatio.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** One zlib state per executor thread, reused via reset(). */
  private val localDeflater: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6)
    }

  /** Per-thread grow-only scratch sink: only the deflate byte COUNT is
    * used, so the buffer contents are discarded — allocating it per
    * row (billions of short-lived multi-KB arrays at corpus scale)
    * would undercut the whole point of the thread-local zlib state. */
  private val localBuf: ThreadLocal[Array[Byte]] =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](8192)
    }

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Double = {
    val in = text.getBytes
    if (in.length == 0) return 1.0
    val d = localDeflater.get()
    d.reset()
    d.setInput(in); d.finish()
    var buf = localBuf.get()
    val want = math.max(64, in.length / 2)
    if (buf.length < want) { buf = new Array[Byte](want); localBuf.set(buf) }
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / in.length
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.catalystExpr(text)))
}
