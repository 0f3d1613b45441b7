package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd nearest-centroid assignment — the routing kernel of the
  * whole ANN/SemDeDup family (IVF lists, k-means Lloyd assignment,
  * cluster-routed pair generation). Semantically IDENTICAL to the
  * composed-HOF form
  *
  *   element_at(slice(transform(array_sort(transform(seq(0,k-1),
  *     i -> struct(-round(cosine(v, cents[i]), 6), i))), ...), 1, 1), 1)
  *
  * — same sequential [[ArrayDot]] summation order, same
  * `prod == 0 → 0.0` zero-vector rule, same `round(_, 6)`
  * (BigDecimal.valueOf HALF_UP, Spark's double round), same
  * (score desc, index asc) tie-break — but ONE primitive argmin loop
  * inside whole-stage codegen instead of an interpreted lambda chain
  * that materializes and sorts k structs per row. At a real list
  * count this is the corpus-scan cost: 500k rows x 256 centroids x
  * 64 dims runs the composed form's per-element lambda interpreter;
  * the kernel is a flat double[] walk (the [[MinHashSig]] class of
  * win the README documents).
  *
  * Centroid norms are precomputed ONCE driver-side with the identical
  * `sqrt(sequential dot)` the HOF form computes per row. Null input →
  * null. Empty centroid set is rejected at construction.
  */
case class NearestCentroid(child: Expression,
                           centroids: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid: empty centroid set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<double>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  // flat row-major matrix + per-centroid norms, shipped once per task
  @transient private lazy val k = centroids.size
  @transient private lazy val dim = centroids.head.size
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      var i = 0
      while (i < dim) { a(j * dim + i) = centroids(j)(i); i += 1 }
      j += 1
    }
    a
  }
  @transient private lazy val norms: Array[Double] =
    Array.tabulate(k) { j =>
      var s = 0.0
      var i = 0
      while (i < dim) {
        val x = centroids(j)(i); s += x * x; i += 1
      }
      math.sqrt(s)
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    NearestCentroid.assign(v, flat, norms, k, dim)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ncFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("ncNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NearestCentroid.assign(" +
        s"$a, $flatRef, $normsRef, $k, $dim);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroid {

  /** Spark's double `round(_, 6)`: BigDecimal.valueOf + HALF_UP. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by interpreted eval and generated code. Mirrors the HOF
    * composition exactly: dot truncates to the shorter array, the
    * norm product's == 0.0 guard yields cos = 0.0, scores round at 6,
    * ties break on the lower index (strict `<` on the negated score —
    * all zero-class scores negate to the same -0.0, so the primitive
    * compare agrees with the sort path's total order here). */
  def assign(v: ArrayData, flat: Array[Double], norms: Array[Double],
             k: Int, dim: Int): Int = {
    val vn = v.numElements()
    var vs = 0.0
    var i = 0
    while (i < vn) { val x = v.getDouble(i); vs += x * x; i += 1 }
    val vnorm = math.sqrt(vs)
    var bestNeg = 2.0
    var best = 0
    var j = 0
    while (j < k) {
      val n = math.min(vn, dim)
      var d = 0.0
      i = 0
      while (i < n) { d += v.getDouble(i) * flat(j * dim + i); i += 1 }
      val prod = vnorm * norms(j)
      val cos = if (prod == 0.0) 0.0 else d / prod
      val neg = -round6(cos)
      if (neg < bestNeg) { bestNeg = neg; best = j }
      j += 1
    }
    best
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.catalystExpr(v),
      centroids.map(_.toIndexedSeq).toIndexedSeq))
}
