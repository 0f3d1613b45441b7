package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import graft.dsl.Domain
import graft.dsl.Domain._

/** Lowers a [[Domain]] pattern to a flat *bindings DataFrame*: one column
  * per bound variable, one row per binding tuple (reference semantics:
  * "iterate every leaf binding tuple", `README.md:168-181`; SURVEY.md §2
  * O5-O15).
  *
  * Where-clauses get the reference's earliest-placement optimization
  * (`parse_domain.cljc:195-207`): each conjunct is applied as soon as all
  * the variables it references are bound, so non-matching subtrees are
  * pruned before deeper explodes. Catalyst's PushDownPredicates would
  * re-derive most of this, but emitting filters early keeps plans small
  * and lets predicates reach the parquet scan before any Generate blocks
  * them.
  *
  * Scale notes (100 TB): every step here is a narrow transformation —
  * explode / project / filter — with NO shuffle; the whole lowered domain
  * pipeline runs inside one whole-stage-codegen span per input partition.
  * Shuffles appear only in RangeLowering's groupBys.
  */
object DomainLowering {

  private final case class Where(vars: Set[String], cond: Column)

  /** Column names a (possibly unresolved) predicate references. */
  private def refs(c: Column): Set[String] =
    org.apache.spark.sql.graftbridge.ColumnBridge.catalystExpr(c).collect {
      case a: UnresolvedAttribute => a.name
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
    }.toSet

  /** Lower `domain` against `input`, applying `where` conjuncts at the
    * earliest step where their variables are all bound. Returns a
    * DataFrame whose columns are exactly the bound variable names.
    *
    * Root convention: a 1-pattern Vec/SetOf at the root consumes the
    * DataFrame's own rows (flat table ≅ vector-of-maps, the reference's
    * motivating case, `README.md:24`); any other root pattern applies to
    * each row's single `value` column (a DataFrame of whole nested
    * structures — per-row results deep-merge via the range's groupBys).
    *
    * `rootOrder`: a declared total order (column names, which must form
    * a KEY — ties would make chunk membership nondeterministic) that
    * makes the table itself a *sequence*, enabling the reference's
    * n-at-a-time chunking at the root (`compile.cljc:81-98`) over
    * unordered storage. Lowered via the range-partitioned distributed
    * prefix sum ([[graft.ops.Packing.orderedCumsum]]) plus one shuffle
    * on `pos div k` — every stage distributed (no global window), with
    * the missing-tail slots binding null (the reference's
    * partial-tail-binds-nil rule for free). The prefix sum is a LAZY
    * declarative plan (see its scaladoc), so lowering a root-chunk
    * domain launches no job — the compile/run split the reference's
    * `transformer` promises holds on every domain shape
    * (`LazyPlanSpec`). For chunking
    * WITHIN groups (collect per key and chunk the array, as q07 does)
    * the same Vec(n) pattern under any array binding stays fully
    * lazy. */
  def lower(input: DataFrame, domain: Domain, where: Seq[Column],
            rootOrder: Seq[String] = Nil): DataFrame = {
    // Isolate the input: binding columns are written under user-visible
    // names, and a binding that shares a name with a source column would
    // otherwise OVERWRITE it — every later step re-resolves the root
    // struct expression against the mutated frame and silently reads the
    // bound value instead of the original (e.g. Entries(Seq(
    // KField("b") -> Leaf("a"), KField("a") -> Leaf("c"))) binding "a"
    // first). Renaming the sources to reserved names makes collisions
    // impossible; the root struct keeps the original field names.
    val inCols = input.columns.toIndexedSeq
    val isolated = input.select(inCols.map(c => col(c).as(s"__in_$c")): _*)
    val st = new State(isolated, where.map(c => Where(refs(c), c)))
    val isValueCol = inCols == Seq("value")
    val rootValue =
      if (isValueCol) col("__in_value")
      else struct(inCols.map(c => col(s"__in_$c").as(c)): _*)
    val rootType: DataType =
      if (isValueCol) input.schema.head.dataType
      else StructType(input.schema.fields)
    val rootIsArray = isValueCol && rootType.isInstanceOf[ArrayType]
    domain match {
      // A vector/set pattern over a real array-typed `value` column is an
      // in-row collection: explode (or chunk) it per row, results merging
      // across rows. Otherwise the DataFrame's own rows are the elements.
      case v: Vec if rootIsArray   => st.step(rootValue, rootType, v)
      case s: SetOf if rootIsArray => st.step(rootValue, rootType, s)
      case Vec(Seq(p)) => st.step(rootValue, rootType, p)
      case SetOf(p)    => st.step(rootValue, rootType, p)
      case Vec(Nil) =>
        throw new IllegalArgumentException("empty vector pattern []")
      case Vec(ps) if rootOrder.nonEmpty =>
        // Table-as-sequence chunking under the declared order, on the
        // DISTRIBUTED prefix sum + one chunk-key shuffle. The previous
        // form (row_number + lead over Window.orderBy with no
        // partition) collapses the whole table into a single window
        // task — correct, but at 100 TB it is the one-task sort the
        // rest of this engine exists to avoid. Here positions come
        // from the range-partitioned prefix sum and chunks assemble by
        // grouping on `pos div k`: every stage distributed, identical
        // results (PropertySpec pins equality with grouped() for any
        // k). Each slot holds exactly one row, so first(..., ignore
        // nulls) is deterministic; missing tail slots yield the
        // reference's partial-tail-binds-nil for free. The chunk
        // leader's own row is carried as the payload, preserving the
        // previous lowering's binding environment.
        val k = ps.size
        val parts = math.max(1, st.df.sparkSession.conf
          .get("spark.sql.shuffle.partitions", "32").toInt)
        val slotted = graft.ops.Packing.orderedCumsum(
            st.df.withColumn("__elem0", rootValue),
            struct(rootOrder.map(n => col(s"__in_$n")): _*), lit(1L),
            parts, offsetName = "__pos")
          .withColumn("__chunk", expr(s"__pos div $k"))
          .withColumn("__slot", pmod(col("__pos"), lit(k)).cast("int"))
        val elemAggs = (0 until k).map(j =>
          first(when(col("__slot") === j, col("__elem0")),
                ignoreNulls = true).as(s"__elem$j"))
        val payload = first(when(col("__slot") === 0,
            struct(inCols.map(c => col(s"__in_$c").as(s"__in_$c")): _*)),
          ignoreNulls = true).as("__lead")
        val asm = slotted.groupBy(col("__chunk"))
          .agg(elemAggs.head, (elemAggs.tail :+ payload): _*)
        st.df = inCols.foldLeft(asm) { (acc, c) =>
          acc.withColumn(s"__in_$c", col("__lead")(s"__in_$c"))
        }.drop("__lead", "__chunk")
        ps.zipWithIndex.foreach { case (p, j) =>
          st.step(col(s"__elem$j"), rootType, p)
        }
      case Vec(_) =>
        throw new IllegalArgumentException(
          "n-at-a-time chunking at the root needs a declared order " +
          "(rootOrder) — tables are unordered — or an array column; " +
          "nest Vec(n) under an array binding to chunk within groups")
      case d => st.step(rootValue, rootType, d)
    }
    st.finish()
  }

  /** Mutable single-pass lowering state: the growing DataFrame, the
    * name→value-expression environment, and the not-yet-applicable
    * where conjuncts.
    *
    * Bound names are NOT materialized as columns mid-stack — the
    * environment carries each binding's value expression (over the
    * reserved `__in_*`/`__gN` columns) and [[finish]] emits all the
    * user-named aliases in ONE final select above every Generate.
    * Materializing them eagerly put same-name aliases of source
    * attributes (e.g. binding `l_orderkey` from an input whose column
    * is also `l_orderkey`) BELOW a Generate, where Spark 4.1's
    * RemoveRedundantAliases/ColumnPruning interplay mis-prunes the
    * plan (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND: the Generate's
    * unrequiredChildIndex is computed against an output the alias
    * removal then rewrites). Keeping every below-Generate alias on a
    * reserved name (never equal to its child attribute's name)
    * sidesteps the trigger for every domain shape; where-conjuncts and
    * computed keys that reference bound names are substituted through
    * the environment instead of resolving against mid-stack columns. */
  private final class State(var df: DataFrame, var pending: Seq[Where]) {
    private var env: Map[String, Column] = Map.empty
    private var n = 0
    private def fresh(): String = { n += 1; s"__g$n" }

    /** Rewrite bound-variable references in a user-written Column to
      * their value expressions (bound names only become real columns in
      * the final select). */
    private def subst(c: Column): Column = {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(ColumnBridge.catalystExpr(c).transform {
        case a: UnresolvedAttribute if env.contains(a.name) =>
          ColumnBridge.catalystExpr(env(a.name))
      })
    }

    /** Record a binding and fire any newly-satisfiable predicates. */
    private def bind(name: String, value: Column): Unit = {
      require(!env.contains(name), s"duplicate binding '$name' in domain")
      require(!name.startsWith("__"), s"binding name '$name' is reserved")
      env += name -> value
      val (ready, rest) = pending.partition(_.vars.subsetOf(env.keySet))
      pending = rest
      ready.foreach(w => df = df.filter(subst(w.cond)))
    }

    private def structField(st: StructType, f: String): DataType =
      st.fields.find(_.name.equalsIgnoreCase(f)).map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(
          s"no field '$f' in ${st.simpleString}"))

    /** Walk the pattern alongside the DataType — the lowering is
      * schema-driven, and carrying the type avoids re-analyzing the
      * whole growing plan at every Entries node (dataTypeOf via
      * df.select(c).schema was O(steps^2) driver work). */
    def step(value: Column, dt: DataType, d: Domain): Unit = d match {
      case Leaf(name) => bind(name, value)

      case As(name, inner) =>
        bind(name, value)
        step(value, dt, inner)

      case SetOf(p) => step(value, dt, Vec(Seq(p)))

      case Vec(Nil) =>
        // k=0 would divide by zero into an Int.MaxValue sequence below
        throw new IllegalArgumentException("empty vector pattern []")

      case Vec(ps) =>
        val elemType = dt match {
          case ArrayType(t, _) => t
          case other => throw new IllegalArgumentException(
            s"vector pattern over non-array type ${other.simpleString}")
        }
        ps match {
          case Seq(p) =>
            val c = fresh()
            df = df.withColumn(c, explode(value))
            step(col(c), elemType, p)
          case _ => // n-at-a-time chunking (reference O8)
            val k = ps.size
            val nChunks = ceil(size(value) / lit(k.toDouble)).cast(IntegerType)
            val chunkIdx = fresh()
            df = df.withColumn(
              chunkIdx,
              explode(when(size(value) > 0, sequence(lit(0), nChunks - 1))
                .otherwise(lit(Array.empty[Int]))))
            ps.zipWithIndex.foreach { case (p, j) =>
              // 1-based try_element_at: the partial tail chunk binds
              // nulls (matches reference `test/core.clj:101`).
              step(try_element_at(value, col(chunkIdx) * k + lit(j + 1)),
                   elemType, p)
            }
        }

      case Entries(entries) =>
        // PRE-PASS: materialize every struct-field extraction into a
        // reserved column BEFORE any entry's sub-pattern adds a
        // Generate. A GetStructField left to sit above a stack of
        // sibling Generates — whether in the final select or in a
        // later entry's extraction Project — arms Spark 4.1's
        // NestedColumnAliasing (_extract_* pushdown, triggered by any
        // unread sibling field), which loses the attribute when the
        // rewrite crosses a second Generate
        // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND: "Could not find
        // _extract_f2") — TransformSpec pins the exact shape. After
        // the pre-pass only plain reserved attributes reach the subs.
        val preExtracted: Map[String, Column] = dt match {
          case st: StructType =>
            val fields = entries.collect { case (KField(f), _) => f }
            fields.distinct.map { f =>
              val fcol = fresh()
              df = df.withColumn(fcol, value.getField(f))
              f -> col(fcol)
            }.toMap
          case _ => Map.empty
        }
        entries.foreach {
          case (KField(f), sub) =>
            dt match {
              case mt: MapType =>
                step(try_element_at(value, lit(f)), mt.valueType, sub)
              case st: StructType =>
                step(preExtracted(f), structField(st, f), sub)
              case other => throw new IllegalArgumentException(
                s"field '$f' lookup on non-struct/map ${other.simpleString}")
            }
          case (KExpr(kc), sub) =>
            // the key expression may reference earlier-bound variables
            // (reference `parse_domain.cljc:111-119`) — substitute them
            val k = subst(kc)
            dt match {
              case mt: MapType =>
                step(try_element_at(value, k), mt.valueType, sub)
              case ArrayType(t, _) =>
                step(try_element_at(value, k), t, sub)
              case other => throw new IllegalArgumentException(
                s"computed-key lookup on non-map/array ${other.simpleString}")
            }
          case (KAll(kp), sub) =>
            // Iterate all entries. Sibling KAll entries each explode the
            // same collection → the implicit self cross-join (O14).
            val e = fresh()
            // entry key/value extractions materialize immediately for
            // the same NestedColumnAliasing reason as KField-over-
            // struct above (a later sibling Generate would otherwise
            // sit between the final select's getField and this entry)
            def kv(keyT: DataType, valT: DataType): Unit = {
              val kc = fresh(); val vc = fresh()
              df = df.withColumn(kc, col(e).getField("key"))
                     .withColumn(vc, col(e).getField("value"))
              step(col(kc), keyT, kp)
              step(col(vc), valT, sub)
            }
            dt match {
              case mt: MapType =>
                df = df.withColumn(e, explode(map_entries(value)))
                kv(mt.keyType, mt.valueType)
              case ArrayType(StructType(fs), _)
                  if fs.map(_.name).sameElements(Array("key", "value")) =>
                df = df.withColumn(e, explode(value))
                kv(fs(0).dataType, fs(1).dataType)
              case other =>
                throw new IllegalArgumentException(
                  s"KAll over non-map type $other")
            }
        }
    }

    def finish(): DataFrame = {
      // one select materializes every binding under its user name —
      // the only place user-named aliases enter the plan (see class doc)
      var out = df.select(env.toSeq.sortBy(_._1)
        .map { case (nm, c) => c.as(nm) }: _*)
      // Any leftover predicate references a never-bound name — surface the
      // analysis error rather than silently dropping the filter.
      pending.foreach(w => out = out.filter(w.cond))
      out
    }
  }
}
