package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational extension surface (SURVEY.md §7.6) plus the scale path for
  * the reference's implicit self θ-join (O14, faconne `README.md:344-357`).
  *
  * The reference crosses a collection with itself by nesting loops over
  * one in-memory map. At 100 TB the Spark-first form is a real join:
  * crossJoin + filter, from which Catalyst's ExtractEquiJoinKeys pulls
  * equality conjuncts and plans a shuffled hash / sort-merge join — the
  * nested loop only remains for genuinely non-equi predicates (and then
  * as BroadcastNestedLoopJoin when one side is small).
  */
object Relational {

  /** All ordered pairs of rows of `df`, columns prefixed to keep both
    * sides addressable. Filter afterwards with θ-predicates; equality
    * conjuncts are extracted into join keys by Catalyst. */
  def selfPairs(df: DataFrame, left: String = "a_", right: String = "b_")
      : DataFrame = {
    val a = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, left + c))
    val b = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, right + c))
    a.crossJoin(b)
  }

  /** Broadcast-dimension equi-join: the 100 TB default for star-schema
    * fact→dim joins (dim fits in executor memory; no shuffle of the
    * fact side). */
  def joinDim(fact: DataFrame, dim: DataFrame, cond: Column,
              joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)

  /** Top-k rows per group without a global sort: rank inside each
    * partition-by group and keep k (window, single shuffle on the
    * group keys). Ties broken by `order` columns being total. */
  def topKPerGroup(df: DataFrame, groupBy: Seq[Column], order: Seq[Column],
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupBy: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
