package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link analysis over item graphs derived from transaction data.
  *
  * The motivating 100 TB use is crawl/corpus curation: rank pages or
  * domains by link importance to prioritize what gets crawled,
  * deduplicated, and kept (reference's query surface covers the
  * relational analytics; this extends it with the iterative graph step a
  * web-scale pipeline needs). Here the graph is a co-occurrence network
  * (items linked when they appear in the same basket/order), the retail
  * analog of a link graph.
  *
  * Scale design: edge generation is one self-equi-join shuffled on the
  * container key (never all-pairs across containers); each PageRank
  * iteration is join(ranks, edges on src) + groupBy(dst) — two shuffles
  * on the node key, the canonical Pregel-as-DataFrame step. Ranks are
  * O(nodes) — orders of magnitude smaller than edges — so at scale the
  * edge list is the thing to co-locate: store it bucketed by src and the
  * per-iteration join is shuffle-free on the edge side (Sources.bucketed
  * provides exactly that); with few-enough nodes the rank frame
  * broadcasts instead. Arithmetic is fixed-point integer (micro-units,
  * exact `div` floor division) so results are bit-identical across
  * engines and partitionings — no float summation-order drift — and the
  * DuckDB oracle replays the identical loop as a CTE chain.
  */
object Graph {

  /** Directed weighted co-occurrence edges: one edge src→dst per
    * UNORDERED container in which both appear (both directions emitted,
    * so the graph is symmetric and has no dangling nodes). Weight = the
    * number of distinct containers sharing the pair. */
  def coOccurrenceEdges(df: DataFrame, container: Column, item: Column)
      : DataFrame = {
    val m = df.select(container.as("o"), item.as("p")).distinct()
    val a = m.select(col("o"), col("p").as("src"))
    val b = m.select(col("o"), col("p").as("dst"))
    a.join(b, Seq("o"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Fixed-point weighted PageRank. Ranks are micro-units of 1.0
    * (init 1e6 per node); each iteration routes
    * `(r_src * w) div out_w(src)` along every edge and renews
    * `r' = 0.15e6 + (17 * inbound) div 20` — damping 0.85 kept exact as
    * 17/20 in integer arithmetic. Every value is a nonnegative BIGINT,
    * every division an exact floor `div`, so the result is deterministic
    * bit-for-bit regardless of partitioning (floats would drift with
    * summation order). Nodes = edge endpoints (symmetric input ⇒ no
    * dangling mass). Lineage grows one join+agg per iteration; callers
    * running deep iteration counts should localCheckpoint every ~10
    * rounds — at the 3–5 iterations link-curation needs, not required.
    *
    * Returns (id, rank_fp) with rank_fp the micro-unit rank. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val outW = edges.groupBy("src").agg(sum(col("w")).as("out_w"))
    // edges carry their src's total outgoing weight; this join is
    // loop-invariant so it happens once, outside the iteration
    val routed = edges.join(outW, Seq("src"))
    var ranks = outW.select(col("src").as("id"), lit(1000000L).as("r"))
    for (_ <- 0 until iters) {
      ranks = routed
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("(r * w) div out_w").as("contrib"))
        .groupBy(col("dst").as("id"))
        .agg((lit(150000L) +
              expr("(17 * sum(contrib)) div 20")).as("r"))
        .select(col("id"), col("r"))
    }
    ranks
  }
}
