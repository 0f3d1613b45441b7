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
}
