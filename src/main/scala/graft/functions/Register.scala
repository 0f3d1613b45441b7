package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the engine's native expressions, so
  * `spark.sql(...)` users get the same codegen'd hot paths as the
  * Column API (`SELECT minhash_sig(word_shingles(text, 3), 128) ...`).
  * Int parameters arrive as literal expressions and are evaluated at
  * registration-call time (they must be foldable). */
object Register {

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def all(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es.head, intArg(es(1), "n")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, intArg(es(1), "numHashes")), "scala_udf")
    reg.createOrReplaceTempFunction("simhash62",
      es => SimHash62(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("array_dot",
      es => ArrayDot(es.head, es(1)), "scala_udf")
  }
}
