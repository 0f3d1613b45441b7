package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the engine's native expressions, so
  * `spark.sql(...)` users get the same codegen'd hot paths as the
  * Column API (`SELECT minhash_sig(word_shingles(text, 3), 128) ...`).
  * Int parameters arrive as literal expressions and are evaluated at
  * registration-call time (they must be foldable). */
object Register {

  private def intArg(e: Expression, what: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integral literal, got non-constant $e")
    e.eval() match {
      case n: java.lang.Number
          if n.longValue >= Int.MinValue && n.longValue <= Int.MaxValue =>
        n.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be an Int-range integral literal, got $other")
    }
  }

  private def arity(es: Seq[Expression], n: Int, fn: String): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${es.length}")

  /** The single source of truth for name → expression builder — shared
    * by the per-session [[all]] registration and the
    * `spark.sql.extensions` path ([[graft.GraftExtensions]]). */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "word_shingles" -> (es => { arity(es, 2, "word_shingles")
        WordShingles(es.head, intArg(es(1), "n")) }),
      "minhash_sig" -> (es => { arity(es, 2, "minhash_sig")
        MinHashSig(es.head, intArg(es(1), "numHashes")) }),
      "simhash62" -> (es => { arity(es, 1, "simhash62")
        SimHash62(es.head) }),
      "array_dot" -> (es => { arity(es, 2, "array_dot")
        ArrayDot(es.head, es(1)) }),
      "deflate_ratio" -> (es => { arity(es, 1, "deflate_ratio")
        DeflateRatio(es.head) }),
      "gram_mass_stats" -> (es => { arity(es, 2, "gram_mass_stats")
        GramMassStats(es.head, intArg(es(1), "n")) }))

  def all(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
