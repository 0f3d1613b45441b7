package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over ArrayType(Float/Double) — pure catalyst
  * expression compositions (zip_with / aggregate), fully codegen'd.
  * Embeddings are cast to double so scores match a double-precision
  * oracle bit-for-bit at round(6). */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product — the codegen'd [[ArrayDot]] expression (bit-identical
    * to `aggregate(zip_with(a,b,_*_), 0.0, _+_)` but a primitive loop
    * inside whole-stage codegen instead of an interpreted lambda). */
  def dot(a: Column, b: Column): Column = ArrayDot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero vectors (avoids NaN propagation). */
  def cosine(a: Column, b: Column): Column = {
    val d = l2norm(a) * l2norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Sign pattern against a fixed hyperplane set → LSH bucket id.
    * `planes` must be the same deterministic set on every call
    * (see [[Hyperplanes.generate]]). */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.size <= 64,
      s"at most 64 hyperplanes fit one Long bucket id (got ${planes.size}; " +
      "1L << i wraps mod 64 and distant vectors would silently collide)")
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc.bitwiseOR(
        when(dot(v, typedlit(p)) >= 0.0, lit(1L << i)).otherwise(0L))
    }
  }
}

/** Deterministic pseudo-random hyperplanes for sign LSH (seeded — the
  * same planes on driver and in every task, no state shipped). */
object Hyperplanes {
  def generate(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
