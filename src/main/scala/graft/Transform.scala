package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import graft.dsl.{Domain, Range}
import graft.plan.{DomainLowering, RangeLowering}

/** The engine entry point — the Spark-native analog of the reference's
  * three macros (faconne `core.cljc:15-43`; SURVEY.md §2 O1-O4, §3):
  *
  *  - [[Transform.compile]] ≅ `transformer`: build a reusable
  *    `DataFrame => DataFrame` (compilation separated from data — each
  *    application produces a fresh logical plan that Catalyst optimizes).
  *  - [[Transform.apply]]   ≅ `transform`: one-shot compile + run.
  *  - [[Transform.forEach]] ≅ `for-each`/`iterator`: lower the domain to
  *    the flat bindings DataFrame and run a side-effecting action per
  *    binding tuple. NOTE the semantic shift from the reference
  *    (`README.md:75-85`): actions run distributed on executors,
  *    unordered — not in-process traversal order.
  *  - [[Transform.explain]] ≅ `print-generated-transformer`: the lowered
  *    plan, Catalyst-side.
  */
final case class Transform(domain: Domain, range: Range,
                           where: Seq[Column] = Nil,
                           rootOrder: Seq[String] = Nil) {

  /** The flat binding-tuples relation (domain side only). `rootOrder`
    * declares a total order over the input rows, enabling root-level
    * Vec(n) chunking (see DomainLowering.lower). */
  def bindings(input: DataFrame): DataFrame =
    DomainLowering.lower(input, domain, where, rootOrder)

  /** Relational result: outermost map keys become key columns, literal-key
    * struct fields become value columns, deeper maps stay MapType. */
  def apply(input: DataFrame): DataFrame =
    RangeLowering.lower(bindings(input), range)

  /** Strict-shape result: one `value` column holding the fully nested
    * structure (single row for map/scalar-rooted ranges). */
  def nested(input: DataFrame): DataFrame =
    RangeLowering.lowerNested(bindings(input), range)

  /** Side-effecting visit of every binding tuple (reference O3). */
  def forEach(input: DataFrame)(action: Row => Unit): Unit =
    bindings(input).foreach(action(_))

  /** Lowered-plan debug surface (reference O4). */
  def explain(input: DataFrame): String =
    apply(input).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
}

object Transform {
  /** One-shot: compile and run (reference `transform`). */
  def run(input: DataFrame, domain: Domain, range: Range,
          where: Seq[Column] = Nil,
          rootOrder: Seq[String] = Nil): DataFrame =
    Transform(domain, range, where, rootOrder)(input)

  /** Reusable compiled transform (reference `transformer`). */
  def compile(domain: Domain, range: Range,
              where: Seq[Column] = Nil,
              rootOrder: Seq[String] = Nil): DataFrame => DataFrame =
    Transform(domain, range, where, rootOrder).apply(_)
}
