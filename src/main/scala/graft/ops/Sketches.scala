package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch profiling — the O(1)-memory-per-group statistics
  * pass a pipeline runs over a 100 TB corpus BEFORE anything exact:
  * how many distinct values per group, where the value mass sits.
  * Both sketches are Spark built-ins with mergeable partial state
  * (HyperLogLog++ registers, KLL-style quantile buffers), so the plan
  * is one shuffle of k-sized buffers with map-side partials — never a
  * per-group distinct set or a sort. Error is bounded (`rsd` relative
  * stddev for distinct counts, rank-error `1/accuracy` for quantiles)
  * but results are APPROXIMATE by design, so this op is deliberately
  * not oracle-hash-checked; `SketchSpec`-style tests pin it against
  * exact counterparts within the documented bounds instead. */
object Sketches {

  def profile(df: DataFrame, groupBy: Seq[Column], value: Column,
              rsd: Double = 0.05,
              quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
              accuracy: Int = 10000): DataFrame =
    df.groupBy(groupBy: _*).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(value, rsd).as("approx_distinct"),
      percentile_approx(value,
        array(quantiles.map(lit): _*), lit(accuracy))
        .as("approx_quantiles"))

  /** Per-group approximate frequent items via the mergeable
    * [[graft.functions.Reducers.SpaceSaving]] summary: one shuffle of
    * capacity-sized buffers with map-side partials — never a full
    * per-group count table when only the head matters. Output one row
    * per (group, hitter): (…group cols…, item, cnt_est, err), top `k`
    * of each group's summary by (count desc, item asc). Size
    * `capacity` to 1/threshold-frequency (items above n/capacity are
    * guaranteed caught); with capacity above the group's distinct
    * count the result is the exact deterministic top-k with err 0. */
  def heavyHitters(df: DataFrame, groupBy: Seq[Column], item: Column,
                   k: Int, capacity: Int): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    val f = udaf(graft.functions.Reducers.SpaceSaving(capacity))
    df.groupBy(groupBy: _*)
      .agg(slice(f(item), 1, k).as("__hh"))
      .select(col("*"), explode(col("__hh")).as("__h"))
      .drop("__hh")
      .withColumn("item", col("__h._1"))
      .withColumn("cnt_est", col("__h._2"))
      .withColumn("err", col("__h._3"))
      .drop("__h")
  }
}
