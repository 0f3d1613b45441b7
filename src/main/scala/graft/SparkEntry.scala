package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, LongType}
import graft.dsl.Domain._
import graft.dsl.Range._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every query goes through the graft engine (Transform DSL or graft.ops)
  * and has a DuckDB-equivalent oracle in [[oracleSql]] where expressible.
  * Query ↔ operator coverage is noted per entry against SURVEY.md §2.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) in parquet, surfaced as long nanos via
    // spark.sql.legacy.parquet.nanosAsLong — rebuild a proper timestamp.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    else df
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's README flagship (student-data 3-level nested agg,
    * `README.md:22-64`) re-cast on lineitem. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flagship_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O1/O5/O11/O18/O19-O20: row domain → two-level grouping → struct of
    // built-in reducers (count-distinct / avg / sum).
    "q01_flagship_agg" -> ((s, dir) => {
      Transform.run(t(s, dir, "lineitem"),
        rows("l_returnflag", "l_linestatus", "l_orderkey",
             "l_quantity", "l_extendedprice"),
        RMap(col("l_returnflag"),
          RMap(col("l_linestatus"),
            RStruct(Seq(
              "n_orders"  -> RAgg(countDistinct(col("l_orderkey"))),
              "avg_qty"   -> RAgg(round(avg(col("l_quantity")), 4)),
              "sum_price" -> RAgg(round(sum(col("l_extendedprice")), 2)))))))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // O11/O15/O16: projection + earliest-placed where conjuncts; bare
    // top-level vector range = plain select, no aggregation.
    "q02_project_filter" -> ((s, dir) => {
      Transform.run(t(s, dir, "lineitem"),
        rows("l_orderkey", "l_partkey", "l_quantity", "l_returnflag"),
        RRows(Seq(
          "l_orderkey" -> col("l_orderkey"),
          "l_partkey"  -> col("l_partkey"),
          "l_quantity" -> col("l_quantity"))),
        where = Seq(col("l_quantity") > 30, col("l_returnflag") === "R"))
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
    }),

    // O16: list materialization under one grouping level (sorted for
    // cross-partition determinism; reference order = traversal order).
    "q03_group_list" -> ((s, dir) => {
      Transform.run(t(s, dir, "lineitem"),
        rows("l_orderkey", "l_partkey"),
        RMap(col("l_orderkey"), RList(col("l_partkey"), sorted = true)))
        .orderBy("l_orderkey")
    }),

    // O17: set materialization (collect_set, sorted).
    "q04_group_set" -> ((s, dir) => {
      Transform.run(t(s, dir, "lineitem"),
        rows("l_returnflag", "l_linestatus"),
        RMap(col("l_returnflag"), RSet(col("l_linestatus"))))
        .orderBy("l_returnflag")
    }),

    // O6/O26: map-entry iteration + inversion idiom {k v} -> {v k}.
    "q05_map_invert" -> ((s, dir) => {
      val asMap = t(s, dir, "nation")
        .select(map(col("n_name"), col("n_nationkey")).as("value"))
      Transform.run(asMap,
        mapAll("nm", Leaf("nk")),
        RMap(col("nk").as("n_nationkey"), RScalar(col("nm"))))
        .orderBy("n_nationkey")
    }),

    // O14: self θ-join, Spark-first (crossJoin + filter; Catalyst
    // extracts the nationkey equality into a real equi-join).
    "q06_self_cross" -> ((s, dir) => {
      graft.ops.Relational.selfPairs(t(s, dir, "supplier"))
        .filter(col("a_s_nationkey") === col("b_s_nationkey") &&
                col("a_s_suppkey") < col("b_s_suppkey"))
        .select(
          col("a_s_suppkey").as("k1"),
          col("b_s_suppkey").as("k2"),
          round(col("a_s_acctbal") + col("b_s_acctbal"), 2).as("pair_sum"))
        .orderBy("k1", "k2")
    }),

    // O8: n-at-a-time vector chunking; partial tail chunk binds null
    // (reference `test/core.clj:101`).
    "q07_chunk_pairs" -> ((s, dir) => {
      val arrays = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
      Transform.run(arrays,
        Vec(Entries(Seq(
          (KField("l_orderkey"): DKey) -> Leaf("l_orderkey"),
          (KField("lns"): DKey)        -> Vec(Seq(Leaf("a"), Leaf("b")))))),
        RRows(Seq(
          "l_orderkey" -> col("l_orderkey"),
          "a" -> col("a"),
          "b" -> col("b"))))
        .orderBy(col("l_orderkey").asc, col("a").asc, col("b").asc_nulls_first)
    }),

    // O10: literal-key lookup on a dynamic MapType column (computed key
    // via KExpr ≅ faconne `(:literal expr)`), parsed from JSON props.
    "q08_json_literal_key" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("pm", from_json(col("props"), MapType(StringType, LongType)))
      Transform.run(ev,
        Vec(Entries(Seq(
          (KField("event_type"): DKey) -> Leaf("event_type"),
          (KField("pm"): DKey) -> Entries(Seq(
            (KExpr(lit("k")): DKey) -> Leaf("kval")))))),
        RMap(col("event_type"),
          RStruct(Seq(
            "n"     -> RAgg(count(lit(1))),
            "sum_k" -> RAgg(sum(col("kval")))))))
        .orderBy("event_type")
    }),

    // O18 with a *computed* grouping key (reference `README.md:139-142`).
    "q09_conditional_key" -> ((s, dir) => {
      Transform.run(t(s, dir, "lineitem"),
        rows("l_orderkey", "l_quantity"),
        RMap(
          when(pmod(col("l_quantity").cast("long"), lit(2)) === 0, "even")
            .otherwise("odd").as("parity"),
          RStruct(Seq(
            "n"   -> RAgg(count(col("l_orderkey"))),
            "qty" -> RAgg(round(sum(col("l_quantity")), 2))))))
        .orderBy("parity")
    }),

    // O7/O27: array-of-struct explode then regroup (un/re-grouping idiom)
    // — round-trips a nested input through the domain side.
    "q10_explode_regroup" -> ((s, dir) => {
      val nested = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(collect_list(struct(col("o_orderstatus"), col("o_totalprice")))
          .as("os"))
      Transform.run(nested,
        Vec(Entries(Seq(
          (KField("os"): DKey) -> Vec(Entries(Seq(
            (KField("o_orderstatus"): DKey) -> Leaf("o_orderstatus"),
            (KField("o_totalprice"): DKey)  -> Leaf("o_totalprice"))))))),
        RMap(col("o_orderstatus"),
          RStruct(Seq(
            "n"   -> RAgg(count(col("o_totalprice"))),
            "rev" -> RAgg(round(sum(col("o_totalprice")), 2))))))
        .orderBy("o_orderstatus")
    }),

    // O18 multi-granularity: a simple aggregate and a nested map at the
    // same level (reference `README.md:41-43`) → one agg subplan per
    // granularity joined on the group key; nested map emitted as MapType.
    "q12_multigrain_map" -> ((s, dir) => {
      Transform.run(t(s, dir, "lineitem"),
        rows("l_returnflag", "l_linestatus", "l_orderkey", "l_quantity"),
        RMap(col("l_returnflag"),
          RStruct(Seq(
            "n_orders" -> RAgg(countDistinct(col("l_orderkey"))),
            "by_status" -> RMap(col("l_linestatus"),
              RAgg(round(avg(col("l_quantity")), 4)))))))
        .orderBy("l_returnflag")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_flagship_agg" ->
      """SELECT l_returnflag, l_linestatus,
         count(DISTINCT l_orderkey) AS n_orders,
         round(avg(l_quantity), 4) AS avg_qty,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_project_filter" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_quantity > 30 AND l_returnflag = 'R'
         ORDER BY 1, 2, 3""",
    "q03_group_list" ->
      """SELECT l_orderkey, list_sort(list(l_partkey)) AS value
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q04_group_set" ->
      """SELECT l_returnflag, list_sort(list(DISTINCT l_linestatus)) AS value
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q05_map_invert" ->
      "SELECT n_nationkey, n_name AS value FROM nation ORDER BY 1",
    "q06_self_cross" ->
      """SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
         round(a.s_acctbal + b.s_acctbal, 2) AS pair_sum
         FROM supplier a, supplier b
         WHERE a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
         ORDER BY 1, 2""",
    "q07_chunk_pairs" ->
      """WITH x AS (SELECT l_orderkey, l_linenumber,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
           FROM lineitem)
         SELECT l_orderkey,
           max(CASE WHEN rn % 2 = 1 THEN l_linenumber END) AS a,
           max(CASE WHEN rn % 2 = 0 THEN l_linenumber END) AS b
         FROM x GROUP BY l_orderkey, (rn - 1) // 2
         ORDER BY 1, 2, 3 NULLS FIRST""",
    "q08_json_literal_key" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q09_conditional_key" ->
      """SELECT CASE WHEN CAST(l_quantity AS BIGINT) % 2 = 0
                THEN 'even' ELSE 'odd' END AS parity,
         count(l_orderkey) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q10_explode_regroup" ->
      """SELECT o_orderstatus, count(o_totalprice) AS n,
         round(sum(o_totalprice), 2) AS rev
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q12_multigrain_map" ->
      """WITH f AS (SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
                    FROM lineitem GROUP BY 1),
            s AS (SELECT l_returnflag, l_linestatus,
                         round(avg(l_quantity), 4) AS avg_q
                    FROM lineitem GROUP BY 1, 2),
            m AS (SELECT l_returnflag,
                         map_from_entries(list_sort(list(ROW(l_linestatus, avg_q))))
                           AS by_status
                    FROM s GROUP BY 1)
         SELECT f.l_returnflag, f.n_orders, m.by_status
         FROM f JOIN m USING (l_returnflag) ORDER BY 1"""
  )
}
