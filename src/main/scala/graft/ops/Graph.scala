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
    * dangling mass). Lineage grows one join+agg per iteration, so the
    * loop localCheckpoints every 10 rounds — deep runs (50+) keep a
    * bounded plan while shallow link-curation runs (3–5) never pay it.
    *
    * Returns (id, rank_fp) with rank_fp the micro-unit rank. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val outW = edges.groupBy("src").agg(sum(col("w")).as("out_w"))
    // edges carry their src's total outgoing weight; this join is
    // loop-invariant so it happens once, outside the iteration
    val routed = edges.join(outW, Seq("src"))
    var ranks = outW.select(col("src").as("id"), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      ranks = routed
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("(r * w) div out_w").as("contrib"))
        .groupBy(col("dst").as("id"))
        .agg((lit(150000L) +
              expr("(17 * sum(contrib)) div 20")).as("r"))
        .select(col("id"), col("r"))
      // bound lineage on deep runs: without this, 50+ iterations stack
      // 100+ plan nodes and analysis/codegen time blows up; the cut is
      // value-invariant (exact integer ranks), only the DAG is truncated
      if (i % 10 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts of the undirected graph whose edges are
    * the (id1, id2) pairs of `edges` (direction and multiplicity
    * ignored; self-loops and null endpoints dropped). Triangles are the
    * graph's local-density signal — clustering coefficients, community
    * cores, and link-spam farms (tightly interlinked crawl domains) all
    * start from this count.
    *
    * Scale shape — the standard degree-ordered orientation (Cohen's
    * MapReduce triangle enumeration, Suri & Vassilvitskii WWW'11):
    * each undirected edge is oriented from its (degree, id)-smaller to
    * its (degree, id)-larger endpoint, making the graph a DAG in which
    * every node's OUT-degree is O(√m). Wedges are enumerated only at
    * each triangle's unique out-degree-2 apex — `join` of the oriented
    * list with itself on the source key — so a power-law hub with 10⁶
    * neighbors contributes wedges only toward its few
    * HIGHER-degree peers, not the 10¹² pairs a naive neighbor-pair
    * expansion would emit; the closing-edge check is one more
    * equi-join against the canonical edge list. Three shuffles total
    * (degree agg, wedge self-join, closing join), never a nested loop.
    *
    * Returns (id, n_tri) for every node in at least one triangle —
    * each triangle credits all three corners. */
  def triangleCounts(edges: DataFrame, id1: Column, id2: Column)
      : DataFrame = {
    // materialize the canonical list ONCE: its upstream (often a
    // container self-join) is the expensive part, and it feeds the
    // degree count, the orientation join, and the closing join —
    // recomputing it per consumer tripled the edge-build cost
    val e = canonicalEdges(edges, id1, id2).localCheckpoint()
    val oriented = orientFrom(e).localCheckpoint() // both wedge sides
    // wedges at the apex: two out-edges of one source; y < z in id
    // order so each unordered wedge is formed exactly once
    val wedges = oriented.as("a")
      .join(oriented.as("b"),
            col("a.s") === col("b.s") && col("a.d") < col("b.d"))
      .select(col("a.s").as("x"), col("a.d").as("y"), col("b.d").as("z"))
    // close against the canonical (u < v) edge list — y < z already
    val tri = wedges.join(e,
      col("u") === col("y") && col("v") === col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Bounded k-core peel: `rounds` iterations of "drop every node
    * whose degree in the surviving subgraph is < k", over the
    * undirected graph of (id1, id2) pairs (direction/multiplicity
    * ignored). The k-core is the classic dense-subgraph screen — link
    * farms and community cores survive, tendrils and one-off
    * co-occurrences peel away. A FIXED round count (rather than
    * loop-until-stable) keeps the result a deterministic function of
    * the input at every scale factor — the oracle replays the same R
    * peels as a generated CTE chain — and matches how a 100 TB run
    * budgets the pass anyway: each round is one degree aggregation
    * plus two semi-joins on the node key (3 shuffles), so R is chosen,
    * not discovered. Convergence, when wanted, is `coreDegrees(...,
    * rounds = diameter-ish)` — extra rounds past the fixed point are
    * no-ops on an already-stable subgraph.
    *
    * Returns (id, core_deg): nodes surviving all `rounds` peels with
    * their degree inside the surviving subgraph (≥ k iff stable). */
  def kCorePeel(edges: DataFrame, id1: Column, id2: Column,
                k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"kCorePeel: k must be >= 1, got $k")
    require(rounds >= 1, s"kCorePeel: rounds must be >= 1, got $rounds")
    var e = canonicalEdges(edges, id1, id2).localCheckpoint()
    def degrees(ed: DataFrame): DataFrame = ed
      .select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    for (i <- 1 to rounds) {
      val keep = degrees(e).filter(col("dg") >= k).select("id")
      // semi-joins keep the edge frame narrow (u, v) — no degree
      // columns ride along into the next round's aggregation
      e = e.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
        .select("u", "v")
      // same lineage bound as pageRank: each round stacks a join+agg;
      // the cut changes no values, only truncates the DAG
      if (i % 5 == 0 && i < rounds) e = e.localCheckpoint()
    }
    degrees(e).select(col("id"), col("dg").as("core_deg"))
  }

  /** Canonical undirected edge list: u < v, nulls/self-loops dropped,
    * duplicates and reverse duplicates collapsed. The DISTINCT here is
    * load-bearing — a multi-edge surviving into the orientation would
    * mint phantom wedges (and phantom triangles when it closes), and
    * its cost is one shuffle the degree count needs anyway. */
  private[graft] def canonicalEdges(edges: DataFrame, id1: Column,
                                  id2: Column): DataFrame =
    edges
      .select(least(id1, id2).as("u"), greatest(id1, id2).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull &&
              col("u") =!= col("v"))
      .distinct()

  /** Degree-orientation of [[canonicalEdges]]: each edge points from
    * its (degree, id)-smaller to its (degree, id)-larger endpoint — a
    * DAG whose per-node out-degree is O(√m), which bounds the wedge
    * volume at Σ_s C(outdeg(s), 2). Exposed for the wedge-volume
    * property spec; production enumeration sits on top. */
  private[graft] def orientedEdges(edges: DataFrame, id1: Column,
                                 id2: Column): DataFrame =
    orientFrom(canonicalEdges(edges, id1, id2))

  private def orientFrom(e: DataFrame): DataFrame = {
    val deg = e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    // orient by the (degree, id) total order; ties broken by id keep
    // the orientation a DAG even on regular graphs
    e.join(deg.select(col("id").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("dg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("d")))
          .otherwise(struct(col("v").as("s"), col("u").as("d")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
  }
}
