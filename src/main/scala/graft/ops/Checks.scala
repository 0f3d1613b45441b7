package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates and snapshot auditing — the operational layer a
  * production corpus pipeline runs before and after every stage. */
object Checks {

  /** One-pass rule audit: each rule is (name, violation predicate —
    * true means the row is BAD); returns one (rule, n_bad) row per
    * rule. ALL rules evaluate in a SINGLE scan (conditional sums in
    * one aggregate — running one filter+count per rule would read the
    * corpus once per rule), with map-side partial aggregation; a null
    * predicate result counts as a violation (a rule that cannot
    * evaluate on a row has not validated it). */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be distinct")
    val aggs = rules.map { case (n, bad) =>
      sum(when(coalesce(bad, lit(true)), 1L).otherwise(0L)).as(n) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = rules.map { case (n, _) => s"'$n', `$n`" }
      .mkString(s"stack(${rules.size}, ", ", ", ") AS (rule, n_bad)")
    wide.select(expr(stackExpr))
  }

  /** Duplicate-key audit: number of EXTRA rows per duplicated key
    * value (0 rows out = key is unique). One shuffle with map-side
    * partial counts; output is duplicate-key-sized. */
  def duplicateKeys(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key")).agg((count(lit(1)) - 1L).as("n_extra"))
      .filter(col("n_extra") > 0)

  /** Keyed snapshot diff — the incremental-pipeline audit "what
    * changed between yesterday's corpus and today's": full outer join
    * on the key, rows classified `added` (key only in `neu`),
    * `removed` (only in `old`), `changed` (both, fingerprints differ),
    * `unchanged`. `oldFp`/`neuFp` are content fingerprints (a hash
    * column, a version stamp, ...) evaluated on their own side.
    * Keys must be unique per side ([[duplicateKeys]] gates that);
    * one shuffle per side on the key, null-safe fingerprint compare
    * (two null fingerprints are `unchanged`, one null is `changed`). */
  def keyedDiff(old: DataFrame, neu: DataFrame,
                oldKey: Column, neuKey: Column,
                oldFp: Column, neuFp: Column): DataFrame = {
    // presence comes from side MARKERS, not the fingerprints — a
    // present row with a null fingerprint is not an absent row
    val a = old.select(oldKey.as("key"), oldFp.as("__fp_old"),
      lit(1).as("__in_old"))
    val b = neu.select(neuKey.as("key"), neuFp.as("__fp_new"),
      lit(1).as("__in_new"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
