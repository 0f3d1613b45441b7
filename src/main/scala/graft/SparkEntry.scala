package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl.Domain._
import graft.dsl.Range._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every query goes through the graft engine (Transform DSL or graft.ops)
  * and has a DuckDB-equivalent oracle in [[oracleSql]] where expressible.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's README flagship (student-data 3-level nested agg,
    * `README.md:22-64`) re-cast on lineitem. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flagship_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1/O5/O11/O18/O19-O20: domain row-projection → two-level grouping →
    // struct of built-in reducers (count-distinct / avg / sum).
    "q01_flagship_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Transform.run(li,
        rows("l_returnflag", "l_linestatus", "l_orderkey",
             "l_quantity", "l_extendedprice"),
        RMap(col("l_returnflag"),
          RMap(col("l_linestatus"),
            RStruct(Seq(
              "n_orders"  -> RAgg(countDistinct(col("l_orderkey"))),
              "avg_qty"   -> RAgg(round(avg(col("l_quantity")), 4)),
              "sum_price" -> RAgg(round(sum(col("l_extendedprice")), 2)))))))
        .orderBy("l_returnflag", "l_linestatus")
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
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
