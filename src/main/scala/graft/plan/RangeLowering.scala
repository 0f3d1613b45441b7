package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl.Range
import graft.dsl.Range._

/** Lowers a [[Range]] template over a bindings DataFrame (reference
  * `parse_range.cljc:193-229`; SURVEY.md §2 O16-O23).
  *
  * Strategy: map ranges are groupBy ladders built innermost-first; nested
  * maps are re-assembled as MapType columns with
  * `map_from_entries(sort_array(collect_list(struct(k, v))))`. The
  * outermost consecutive RMaps are *peeled* into plain key columns so a
  * transform's top-level result is a relational table (the Spark-idiomatic
  * reading of "the result is one big map"); `lowerNested` keeps them as a
  * single map value instead for strict shape parity.
  *
  * Deep-merge (reference `parse_range.cljc:33-57`) = grouping: colliding
  * collections concatenate (collect over all tuples of the group), scalars
  * are LWW (any_value). RStruct fields that are all simple aggregates
  * compile into ONE groupBy.agg — a single shuffle with partial (map-side)
  * aggregation; only nested-RMap fields need their own agg subplan, which
  * are then joined back by group key (the multi-granularity case,
  * SURVEY.md §7.4).
  */
object RangeLowering {

  /** Relational (peeled) lowering — the default surface. */
  def lower(bindings: DataFrame, range: Range): DataFrame = range match {
    case RRows(cols) =>
      bindings.select(cols.map { case (n, c) => c.as(n) }: _*)
    case RRowsDistinct(cols) =>
      bindings.select(cols.map { case (n, c) => c.as(n) }: _*).distinct()
    case r =>
      // the one-scan-vs-join decision is taken ONCE per lowering (it
      // runs the optimizer for the stats estimate; per-recursion calls
      // would repeat that driver work at every nested level) — and
      // ONLY when the range can actually reach the grouping-sets
      // branch (an RStruct with a map-valued field somewhere); plain
      // aggregations never consult it, so they skip the extra
      // analyze+optimize pass entirely
      val oneScan = hasMultigrainStruct(r) && preferOneScan(bindings)
      val (keys, inner) = peel(r, Nil)
      inner match {
        case RStruct(fields) if fields.nonEmpty =>
          flattenStruct(bindings, keys, fields, oneScan)
        case other =>
          aggregate(bindings, keys, other, "value", oneScan)
      }
  }

  /** Strict-shape lowering: the whole result as one row / one `value`
    * column (nested maps all the way up), for parity tests. */
  def lowerNested(bindings: DataFrame, range: Range): DataFrame =
    range match {
      case RRows(cols) => lower(bindings, RRows(cols))
      case RRowsDistinct(cols) => lower(bindings, RRowsDistinct(cols))
      case r => aggregate(bindings, Nil, r, "value",
        hasMultigrainStruct(r) && preferOneScan(bindings))
    }

  /** Peel outermost consecutive computed-key maps into key columns,
    * keeping user-visible names: an explicit alias or plain column
    * reference names the key column; computed keys default to keyN. */
  private def peel(r: Range, acc: List[(String, Column)])
      : (Seq[(String, Column)], Range) = r match {
    case RMap(k, v) =>
      peel(v, (keyName(k, s"key${acc.size + 1}"), k) :: acc)
    case other => (acc.reverse, other)
  }

  private def keyName(c: Column, default: String): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.refName(c).getOrElse(default)

  /** Map assembly from (k, v) entry rows: entries sorted by key for
    * deterministic serialization when orderable (map-typed values
    * aren't; key uniqueness already holds, only entry order varies).
    * Shared by the join path, the nested path, and the one-scan
    * grouping-sets path — determinism rules must not diverge.
    *
    * Null-key groups are dropped: Spark's MapType cannot hold a null
    * key (map_from_entries throws NULL_MAP_KEY), so the nested surface
    * documents this as a representation limit — the peeled relational
    * surface preserves null-key groups as ordinary rows. */
  private def mapFromSortedEntries(entry: Column, keyField: String,
                                   keyType: org.apache.spark.sql.types.DataType,
                                   valueType: org.apache.spark.sql.types.DataType)
      : Column = {
    val entryType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", keyType),
      org.apache.spark.sql.types.StructField("v", valueType)))
    val sortable = org.apache.spark.sql.catalyst.expressions
      .RowOrdering.isOrderable(entryType)
    val nonNull = filter(entry, e => e.getField(keyField).isNotNull)
    map_from_entries(if (sortable) sort_array(nonNull) else nonNull)
  }

  /** sort_array for determinism where the element type allows ordering
    * (map-typed elements don't); same degradation rule as
    * [[mapFromSortedEntries]]. */
  private def sortedIfOrderable(df: DataFrame, e: Column,
                                arr: Column): Column = {
    val elemType = df.select(e).schema.head.dataType
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(elemType)) sort_array(arr)
    else arr
  }

  /** Ranges that lower to a single aggregate expression (no further
    * grouping below this level). */
  private def isSimple(r: Range): Boolean = r match {
    case _: RList | _: RSet | _: RScalar | _: RAgg => true
    case _ => false
  }

  /** The aggregate Column for a simple range. Sorted variants degrade to
    * unsorted for non-orderable (map-typed) elements instead of failing
    * analysis — the same rule as [[mapFromSortedEntries]]. */
  private def simpleAgg(df: DataFrame, r: Range): Option[Column] = r match {
    case RList(e, false) => Some(collect_list(e))
    case RList(e, true)  => Some(sortedIfOrderable(df, e, collect_list(e)))
    case RSet(e)         => Some(sortedIfOrderable(df, e, collect_set(e)))
    case RScalar(e)      => Some(any_value(e))
    case RAgg(e)         => Some(e)
    case _               => None
  }

  /** Lower `r` grouped by `keys`; result has the key columns plus one
    * `as`-named value column. */
  private def aggregate(df: DataFrame, keys: Seq[(String, Column)],
                        r: Range, as: String, oneScan: Boolean): DataFrame = {
    val keyCols = keys.map { case (n, c) => c.as(n) }
    val keyNames = keys.map(_._1)
    simpleAgg(df, r) match {
      case Some(agg) =>
        df.groupBy(keyCols: _*).agg(agg.as(as))
      case None => r match {
        case RMap(k, v) =>
          val kn = s"${as}__k${keys.size}" // depth-unique: nested RMaps must not collide
          val inner = aggregate(df, keys :+ (kn -> k), v, as, oneScan)
          // group back up one level: entries → map
          inner
            .groupBy(keyNames.map(col): _*)
            .agg(mapFromSortedEntries(
              collect_list(struct(col(kn), col(as))), kn,
              inner.schema(kn).dataType, inner.schema(as).dataType).as(as))
        case RStruct(fields) =>
          val flat = flattenStruct(df, keys, fields, oneScan)
          flat.select(
            keyNames.map(col) :+
              struct(fields.map { case (n, _) => col(n) }: _*).as(as): _*)
        case other =>
          throw new IllegalArgumentException(s"cannot aggregate $other")
      }
    }
  }

  /** Lower an RStruct's fields as sibling columns at one grouping level.
    * All-simple fields → one groupBy.agg (single shuffle).
    *
    * Multi-granularity (nested-map fields): when every nested map is one
    * level deep with a simple-aggregate leaf — the reference's flagship
    * shape (`README.md:41-43`) — ALL granularities are computed in ONE
    * pass over the input with GROUPING SETS (SURVEY.md §4.3): at 100 TB
    * the scan dominates, so one scan + one (expanded) shuffle beats one
    * scan per granularity. The per-set rows are then reassembled into
    * MapType columns by joining *aggregated* (tiny) frames. Deeper
    * nesting falls back to one agg subplan per field joined on the keys. */
  private def flattenStruct(df: DataFrame, keys: Seq[(String, Column)],
                            fields: Seq[(String, Range)],
                            oneScan: Boolean): DataFrame = {
    require(fields.nonEmpty, "RStruct requires at least one field")
    val keyNames = keys.map(_._1)
    val (simple, complex) = fields.partition(f => isSimple(f._2))

    val oneLevelMaps = complex.forall {
      case (_, RMap(_, v)) => isSimple(v)
      case _ => false
    }
    // keys may be empty (global multi-granularity struct): GROUPING SETS
    // over the empty set plus (innerKey_i) still pays one scan where the
    // join path pays one per field
    val joined =
      if (complex.nonEmpty && oneLevelMaps && oneScan)
        flattenStructOneScan(df, keys, simple, complex)
      else
        flattenStructJoin(df, keys, simple, complex, oneScan)
    // preserve declared field order
    joined.select(keyNames.map(col) ++ fields.map(f => col(f._1)): _*)
  }

  /** Adaptive plan choice for one-level multi-granularity (measured 4x
    * either way): the one-scan GROUPING SETS path pays an Expand
    * (rows x sets) through one wide shuffle to avoid re-reading the
    * input — a win exactly when the scan dominates, i.e. on big inputs.
    * Below the size threshold the join path's extra (cheap) scans beat
    * the Expand's row multiplication. Stats-driven via Catalyst's
    * logical-plan size estimate; threshold overridable (0 forces
    * one-scan everywhere — how the plan-shape tests pin the large-input
    * behavior; Long.MaxValue forces the join path). */
  val oneScanMinBytesKey = "spark.graft.multigrain.oneScanMinBytes"
  /** Whether `r` contains an RStruct with any map-valued field — the
    * only shape whose lowering consults the one-scan decision. Pure
    * ADT walk; keeps [[preferOneScan]]'s optimizer pass off the plain
    * aggregation paths. Conservative: a hit only means the estimate
    * gets COMPUTED, the branch condition still decides the plan. */
  private def hasMultigrainStruct(r: graft.dsl.Range): Boolean = {
    import graft.dsl.Range._
    r match {
      case RStruct(fields) => fields.exists {
        case (_, RMap(_, _)) => true
        case (_, f) => hasMultigrainStruct(f)
      }
      case RMap(_, v) => hasMultigrainStruct(v)
      case _ => false
    }
  }

  private def preferOneScan(df: DataFrame): Boolean = {
    val minBytes = BigInt(df.sparkSession.conf
      .get(oneScanMinBytesKey, (1L << 30).toString))
    df.queryExecution.optimizedPlan.stats.sizeInBytes >= minBytes
  }

  /** Fallback shape: one agg subplan per nested field, full-outer-joined
    * on the group keys. */
  private def flattenStructJoin(df: DataFrame, keys: Seq[(String, Column)],
                                simple: Seq[(String, Range)],
                                complex: Seq[(String, Range)],
                                oneScan: Boolean): DataFrame = {
    val keyCols = keys.map { case (n, c) => c.as(n) }
    val keyNames = keys.map(_._1)
    val base: Option[DataFrame] =
      if (simple.nonEmpty)
        Some(df.groupBy(keyCols: _*)
          .agg(simpleAgg(df, simple.head._2).get.as(simple.head._1),
               simple.tail.map { case (n, r) =>
                 simpleAgg(df, r).get.as(n) }: _*))
      else None
    val complexDfs = complex.map { case (n, r) =>
      aggregate(df, keys, r, n, oneScan) }
    (base.toSeq ++ complexDfs).reduce { (a, b) =>
      if (keyNames.isEmpty) a.crossJoin(b)
      else {
        // null-SAFE equality: a null grouping key is a real group (the
        // one-scan path and plain groupBy both treat it as one); plain
        // USING-join equality would leave the null group unmerged as two
        // half-rows
        val cond = keyNames.map(n => a(n) <=> b(n)).reduce(_ && _)
        val merged = a.join(b, cond, "full_outer")
        merged.select(
          keyNames.map(n => coalesce(a(n), b(n)).as(n)) ++
            a.columns.filterNot(keyNames.contains).map(a(_)) ++
            b.columns.filterNot(keyNames.contains).map(b(_)): _*)
      }
    }
  }

  /** One-scan multi-granularity: GROUPING SETS over (keys) plus
    * (keys, innerKey_i) per nested-map field, rows routed by
    * grouping_id(), maps re-assembled from already-aggregated rows. */
  private def flattenStructOneScan(df: DataFrame, keys: Seq[(String, Column)],
                                   simple: Seq[(String, Range)],
                                   complex: Seq[(String, Range)]): DataFrame = {
    val keyNames = keys.map(_._1)
    val nI = complex.size
    val innerNames = complex.indices.map(i => s"__ik$i")
    // Materialize grouping keys under FRESH names: writing them under
    // their user-visible names (withColumn(keyName, expr)) would
    // overwrite same-named source columns, so inner-key and aggregate
    // expressions referencing the original column would silently read
    // the transformed key instead (the join path never mutates input).
    val gkNames = keys.indices.map(i => s"__gk$i")
    var base = df
    keys.zip(gkNames).foreach { case ((_, c), gk) =>
      base = base.withColumn(gk, c)
    }
    complex.zip(innerNames).foreach { case ((_, RMap(k2, _)), ik) =>
      base = base.withColumn(ik, k2)
    }
    val sets: Seq[Seq[Column]] =
      gkNames.map(col) +:
        innerNames.map(ik => gkNames.map(col) :+ col(ik))
    val aggs =
      simple.map { case (n, r) => simpleAgg(base, r).get.as(n) } ++
      complex.zip(innerNames).zipWithIndex.map {
        case (((_, RMap(_, v)), _), i) =>
          simpleAgg(base, v).get.as(s"__iv$i")
      } :+ grouping_id().as("__gid") // must live inside the agg list
    val gs = base
      .groupingSets(sets, (gkNames ++ innerNames).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // grouping_id bit j (from MSB over cols keyNames++innerNames) is 1
    // when that column is aggregated away; keys are in every set.
    //
    // Reassembly must have exactly ONE consumer of `gs`: with a
    // filter-per-set + join, Catalyst pushes each __gid filter into its
    // own copy of the Expand and the "one scan" degenerates back into a
    // pipeline per granularity (observed). Conditional aggregation over
    // the (tiny, already-aggregated) grouping-sets output keeps one
    // pipeline: collect_list drops the nulls the when() produces for
    // other sets' rows.
    val allInner = (1 << nI) - 1
    val reAggs =
      simple.map { case (n, _) =>
        first(when(col("__gid") === allInner, col(n)),
              ignoreNulls = true).as(n)
      } ++
      complex.zip(innerNames).zipWithIndex.map {
        case (((name, RMap(_, _)), ik), i) =>
          val gid = allInner - (1 << (nI - 1 - i))
          mapFromSortedEntries(
            collect_list(
              when(col("__gid") === gid, struct(col(ik), col(s"__iv$i")))),
            ik, gs.schema(ik).dataType, gs.schema(s"__iv$i").dataType).as(name)
      }
    gs.groupBy(gkNames.map(col): _*).agg(reAggs.head, reAggs.tail: _*)
      .select(gkNames.zip(keyNames).map { case (gk, n) => col(gk).as(n) } ++
        (simple.map(_._1) ++ complex.map(_._1)).map(col): _*)
  }
}
