package graft.dsl

import org.apache.spark.sql.Column

/** The range template language — the *shape of the output* (reference
  * `parse_range.cljc:193-229`; SURVEY.md §1.3, §2 O16-O23). Four collection
  * strategies plus the reducer (`^:expand`) hook, expressed Spark-first:
  * every leaf expression is a Spark [[Column]] over the binding columns
  * produced by DomainLowering, so Catalyst codegen/pushdown apply untouched.
  *
  * Deep-merge semantics (reference `parse_range.cljc:33-57`) fall out of
  * grouping: map ranges become groupBy ladders (innermost first), colliding
  * collections concatenate via collect_list/collect_set, colliding scalars
  * are last-write-wins (→ any_value; the reference's LWW is traversal-order
  * dependent and equally nondeterministic under reordering).
  */
sealed trait Range

object Range {

  /** Top-level bare vector of expressions `[e1 e2 ...]` — a plain
    * projection, no aggregation at all (reference O16 top-level case).
    * Each output column is named. */
  final case class RRows(cols: Seq[(String, Column)]) extends Range

  /** Top-level bare set — projection + distinct (reference O17). */
  final case class RRowsDistinct(cols: Seq[(String, Column)]) extends Range

  /** `[expr]` under grouping — collect values into a list
    * (traversal order in the reference; order is partition-dependent in
    * Spark, so `sorted=true` wraps in sort_array for determinism). */
  final case class RList(expr: Column, sorted: Boolean = false) extends Range

  /** `#{expr}` under grouping — collect_set (sorted for determinism). */
  final case class RSet(expr: Column) extends Range

  /** Colliding scalar — reference deep-merge last-write-wins
    * (`parse_range.cljc:57`). Nondeterministic by construction; prefer
    * data where the scalar is functionally determined by the group key. */
  final case class RScalar(expr: Column) extends Range

  /** The `^:expand` reducer hook (reference O19-O23): `expr` is any Spark
    * aggregate expression over binding columns — recognized reference
    * reducers map to built-ins (count/avg/min/max/sum/countDistinct);
    * arbitrary reducers use `aggregate(collect_list(x), zero, merge,
    * finish)` or a custom Aggregator, still just a Column here. */
  final case class RAgg(expr: Column) extends Range

  /** `{keyExpr valueTemplate}` with a *computed* key — a group-by
    * dimension (reference O18). Nested maps become MapType columns built
    * innermost-first with map_from_entries; the outermost consecutive
    * RMaps of a transform are "peeled" into ordinary key columns so the
    * top-level result is a relational table. */
  final case class RMap(key: Column, value: Range) extends Range

  /** Map with *literal* keys — fixed field names at one grouping level
    * (e.g. `{:count ..., :avg ...}`). In a schema'd world this is a
    * struct, not a map; fields may themselves be RMaps (the reference's
    * mixed literal+computed-key map, `README.md:41-43`, which is how one
    * faconne pass emits aggregates at several granularities). */
  final case class RStruct(fields: Seq[(String, Range)]) extends Range
}
