package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide installation of the engine's native expressions via the
  * standard extensions hook:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or in code:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Every session created from that builder (and every `newSession()`
  * fork) then resolves `word_shingles`, `minhash_sig`, `simhash62`,
  * `array_dot`, `deflate_ratio`, and `gram_mass_stats` in SQL text with
  * the same codegen'd catalyst expressions the Column API uses — no
  * per-session [[graft.functions.Register.all]] call, which is the
  * difference between "works in my notebook" and "works from every
  * JDBC/Thrift/SQL entry point on the cluster". Builders are shared
  * with [[graft.functions.Register]]: one source of truth for
  * name → expression. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Register.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
