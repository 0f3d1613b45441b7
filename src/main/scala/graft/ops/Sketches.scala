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

  /** Exact scalar twin of [[profile]]: same survey shape, but exact
    * `count(distinct)` + exact interpolated `percentile`, one scalar
    * column per quantile (`q25`/`q50`/`q75`, rounded) instead of an
    * array. This is the oracle-hashable variant — array columns crash
    * the driver's pandas compare, and approx values can't hash-match
    * DuckDB anyway. Costs a real distinct + sort per group (fine at
    * audit scale; the [[profile]] sketch remains the 100 TB survey
    * pass and is spec-pinned against this within its error bounds).
    *
    * QUANTIZATION CONTRACT: values are snapped to a 1/`quantScale`
    * grid (default 100 = integer cents) BEFORE percentile
    * interpolation, which pins cross-engine ulp behavior (see inline
    * note). Callers whose values are not money-scaled — ratios in
    * [0,1], log-probs — must pass a `quantScale` fine enough for
    * their domain (e.g. 1e6), or the distribution is coarsened to the
    * grid before quantiles are taken. */
  def profileExact(df: DataFrame, groupBy: Seq[Column], value: Column,
                   quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
                   quantScale: Double = 100.0)
      : DataFrame = {
    // counts and percentiles aggregate SEPARATELY and join on the group
    // keys: a distinct aggregate beside a percentile buffer makes
    // Catalyst plan the whole thing through Expand — every input row
    // duplicated per aggregate family and the percentile buffer fed
    // through the non-partial path (measured 5x slower than two scans
    // at sf0.1). Both frames are group-cardinality-sized, so the join
    // is trivial and AQE broadcasts it.
    val base = df.groupBy(groupBy: _*).agg(
      count(lit(1)).as("n"), countDistinct(value).as("n_distinct"))
    val keyCols = base.columns.dropRight(2).toSeq
    // interpolate over EXACT INTEGER CENTS, divide once at the end:
    // with integer neighbors and quarter fractions every interpolation
    // intermediate is exactly representable, so the quantile double is
    // identical regardless of the engine's a+(b−a)·f vs a·(1−f)+b·f
    // op order — a raw-double percentile differed from DuckDB by 1 ulp
    // at sf0.001 and flipped a round-to-2 boundary (52724.245)
    val cents = floor(value * quantScale + lit(0.5)).cast("long")
    val pcts = df.groupBy(groupBy: _*).agg(
      percentile(cents, array(quantiles.map(lit): _*)).as("__ps"))
    quantiles.zipWithIndex.foldLeft(base.join(pcts, keyCols)) {
      case (d, (q, i)) =>
        d.withColumn("q" + math.round(q * 100).toInt,
          round(element_at(col("__ps"), i + 1) / quantScale, 2))
    }.drop("__ps")
  }

  /** Sketch-once, roll-up-everywhere distinct counts: build a
    * Datasketches HLL sketch per finest-granularity group ONE scan of
    * the corpus, persist the (group keys, hll binary) frame, and
    * answer every coarser-granularity distinct question by merging
    * sketches — [[rollupDistinct]] — without ever rescanning. This is
    * THE 100 TB distinct-count discipline: `approx_count_distinct`
    * answers one grouping per corpus pass, while a stored sketch
    * frame (thousands of rows, kilobytes each) serves the whole
    * rollup lattice from the driver's coffee break. `lgK` trades
    * sketch size (2^lgK registers) for error (~1.04/√2^lgK rsd;
    * lgK=12 → ~1.6%). Returns (groupBy..., hll: binary). */
  def distinctSketches(df: DataFrame, groupBy: Seq[Column], value: Column,
                       lgK: Int = 12): DataFrame =
    df.groupBy(groupBy: _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("hll"))

  /** Merge a [[distinctSketches]] frame down to coarser keys: one
    * aggregation over SKETCHES (no corpus access), same error bounds
    * as building at the coarse granularity directly — HLL union is
    * lossless over register maxima. `estimateAs` ≠ null appends the
    * rounded estimate while keeping the merged sketch for further
    * rollups. */
  def rollupDistinct(sketches: DataFrame, keep: Seq[Column],
                     hll: Column = col("hll"),
                     estimateAs: String = "approx_distinct"): DataFrame =
    sketches.groupBy(keep: _*)
      .agg(hll_union_agg(hll).as("hll"))
      .withColumn(estimateAs,
        round(hll_sketch_estimate(col("hll"))).cast("long"))

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): per-group
    * depth×width counter grids supporting point-frequency queries with
    * one-sided error (estimate >= truth, overshoot bounded by
    * Σcounts·e/width with probability 1 - e^-depth). The pipeline use:
    * a tiny mergeable summary answering "how often does THIS token /
    * URL / shingle appear per stratum" without materializing the full
    * per-stratum count table — O(depth·width) state per group versus a
    * vocabulary-sized frame.
    *
    * Scale shape: occurrences aggregate to the (group, item) count
    * frame first (map-side partials), the char-fold hash runs once per
    * DISTINCT item ([[TextAnalysis.hashFeatures]] discipline), and the
    * depth rows explode from that vocab frame — so the counter build
    * is one shuffle on (group, row, bucket) and the grid is mergeable
    * across any partitioning (integer sums commute). Buckets derive
    * from two independent 31-bit char-folds via Kirsch–Mitzenmacher
    * double hashing (h1 + i·h2 mod P mod width) — depth independent
    * functions from two evaluations, and the oracle replays the exact
    * arithmetic. Deterministic end to end: no floats, no RNG.
    *
    * Returns the counter grid (group, row, bucket, c) — sparse, absent
    * buckets are zero. Feed to [[countMinEstimate]]. */
  def countMin(df: DataFrame, group: Column, item: Column,
               depth: Int = 3, width: Int = 32): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"need depth, width >= 1, got depth=$depth width=$width")
    val tc = df.select(group.as("grp"), item.as("it"))
      .filter(col("it").isNotNull)
      .groupBy("grp", "it").agg(count(lit(1)).as("cnt"))
    val hashed = tc.select("it").distinct()
      .select(col("it"), cmBuckets(col("it"), depth, width).as("bks"))
    tc.join(hashed, "it")
      .select(col("grp"), col("cnt"), explode(col("bks")).as("rb"))
      .groupBy(col("grp").as("group"), col("rb.row").as("row"),
               col("rb.bucket").as("bucket"))
      .agg(sum("cnt").as("c"))
  }

  /** Point-frequency estimates from a [[countMin]] grid: for each
    * (group, probe item) the minimum counter over the depth rows —
    * missing cells read zero (sparse grid). `probes` is the small
    * (group, item) frame to query (typically groups × a key list);
    * it broadcasts against the grid. Output:
    * (group, item, cm_est) with the one-sided guarantee
    * cm_est >= true count. */
  def countMinEstimate(counters: DataFrame, probes: DataFrame,
                       group: Column, item: Column,
                       depth: Int = 3, width: Int = 32): DataFrame = {
    val p = probes.select(group.as("group"), item.as("it")).distinct()
      .filter(col("it").isNotNull) // a null probe has no buckets
      .select(col("group"), col("it"),
              explode(cmBuckets(col("it"), depth, width)).as("rb"))
      .select(col("group"), col("it"),
              col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    p.join(counters, Seq("group", "row", "bucket"), "left")
      .groupBy(col("group"), col("it").as("item"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
  }

  /** Equi-join size estimation from two [[countMin]] grids (the
    * AMS/CM inner-product estimator): |A ⋈ B| on the sketched key =
    * Σ_k a_k·b_k, estimated as min over rows of Σ_buckets A[r,b]·B[r,b]
    * — one-sided like the point estimate (collisions only ADD), and
    * computed from two O(depth·width) summaries WITHOUT touching
    * either input again. This is how a planner prices a join between
    * corpora it only has sketches of. Grids must share depth/width/
    * group keys; the group column pairs strata (pass lit("") grids
    * for global). Output: (group, est) per group present in BOTH
    * grids. */
  def joinSizeEstimate(gridA: DataFrame, gridB: DataFrame): DataFrame =
    gridA.select(col("group"), col("row"), col("bucket"),
        col("c").as("ca"))
      .join(gridB.select(col("group"), col("row"), col("bucket"),
        col("c").as("cb")), Seq("group", "row", "bucket"))
      .groupBy("group", "row")
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .groupBy("group").agg(min(col("ip")).as("est"))

  /** The depth (row, bucket) pairs for one item: two independent
    * 31-bit modular char-folds (seeds 7 and 11), rows via double
    * hashing. Runs on vocab-sized frames in batch;
    * [[graft.streaming.EventStreams.countMinStream]] evaluates it
    * per occurrence (streams have no materialized vocab frame). */
  private[graft] def cmBuckets(it: Column, depth: Int, width: Int)
      : Column = {
    val P = 2147483647L
    val codes = transform(sequence(lit(1), length(it)), i =>
      ascii(it.substr(i, lit(1))).cast("long"))
    def fold(seed: Long) =
      aggregate(codes, lit(seed), (a, ch) => (a * 31L + ch) % P)
    val h1 = fold(7L)
    val h2 = fold(11L)
    array((0 until depth).map { i =>
      struct(lit(i).as("row"),
             ((h1 + lit(i.toLong) * h2) % P % width)
               .cast("int").as("bucket"))
    }: _*)
  }

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

  /** The KMV hash space size: 2^31 − 1 — the MINSTD permutation's
    * range (see [[kmvSketch]]'s hash note). */
  private[graft] val KmvSpace: Long = 2147483647L

  /** KMV theta sketch per group: the k smallest distinct hash values
    * of `key` (cast to string — the portable-hash domain). One
    * shuffle with O(k) mergeable partials per (task, group) — a 100 TB
    * scan never shuffles the distinct keys themselves, which is the
    * whole point vs `count_distinct` (full distinct shuffle) when the
    * SAME sketches must also answer union/intersection questions
    * ([[kmvSetOps]]) that HLL cannot (HLL unions but never intersects
    * without inclusion-exclusion error blowup).
    *
    * Hash note: the k-th-minimum estimator needs UNIFORM hashes, and
    * raw [[graft.functions.TextFunctions.polyHash62]] is not uniform
    * on short keys (a 3-char key's polynomial value is ≤ ~7·31³ — the
    * whole corpus piles up at the bottom of the space and the
    * estimator explodes by orders of magnitude). The fix is the
    * repo's standard scatter step: [[Sampling.idHash]]'s double-round
    * MINSTD Lehmer permutation, which maps the clustered polynomial
    * values uniformly across [0, 2^31−1) while staying 100% integer
    * and SQL-replayable.
    *
    * Deterministic by construction (hash order, no RNG) — the DuckDB
    * oracle rebuilds the identical sketch with an ORDER BY hash LIMIT k,
    * so estimates hash-match bit-for-bit. Returns (group..., kmv). */
  /** The sketch hash: portable polyHash62 scattered by the
    * double-MINSTD permutation (see [[kmvSketch]]'s hash note). */
  def kmvHash(key: Column): Column =
    Sampling.idHash(
      graft.functions.TextFunctions.polyHash62(key.cast("string")))

  def kmvSketch(df: DataFrame, group: Seq[Column], key: Column,
                k: Int): DataFrame = {
    val agg = graft.functions.Reducers.kmvBottomK(k)
    // group by the select's OUTPUT columns: a group expression like
    // year(ts).as("yr") no longer resolves against the projected frame
    val pre = df.select(group :+ kmvHash(key).as("__h"): _*)
    pre.groupBy(pre.columns.dropRight(1).map(col).toSeq: _*)
      .agg(agg(col("__h")).as("kmv"))
  }

  /** Theta (exclusive sampling threshold) of a sketch: the k-th minimum
    * when saturated, the whole space otherwise. Never zero for k ≥ 2:
    * hash 0 is the unique minimum, so it cannot be the k-th smallest of
    * k DISTINCT values. */
  private def kmvTheta(ks: Column, k: Int): Column =
    when(size(ks) < k, lit(KmvSpace)).otherwise(element_at(ks, k))

  /** Distinct estimate from a KMV sketch array: exact size below
    * saturation (every distinct hash is retained), else
    * floor((k−1)·M / h_(k)). The numerator is exact in double and both
    * engines run the same divide-then-floor IEEE ops — bit-portable. */
  def kmvEstimateCol(ks: Column, k: Int): Column =
    when(size(ks) < k, size(ks).cast("long"))
      .otherwise(floor(lit(((k - 1).toLong * KmvSpace).toDouble) /
        element_at(ks, k)).cast("long"))

  /** Roll a [[kmvSketch]] frame up to a coarser grouping: bottom-k of
    * the union of the fine sketches. LOSSLESS for KMV — a hash among
    * the k smallest of a union is among the k smallest of its own
    * side, so the merged bottom-k equals the sketch a direct coarse
    * build would produce (the HLL register-maxima property, in
    * order-statistics form; `OpsSpec` pins frame equality and q424's
    * oracle builds the coarse sketch directly). Sketch once at the
    * finest granularity, answer every coarser distinct/overlap
    * question without touching the corpus again — the rollup input is
    * groups × k longs, nothing else. Returns (keep..., kmv, est). */
  def kmvRollup(sketches: DataFrame, keep: Seq[Column], k: Int)
      : DataFrame = {
    val agg = graft.functions.Reducers.kmvBottomK(k)
    sketches.select(keep :+ explode(col("kmv")).as("__h"): _*)
      .groupBy(keep: _*)
      .agg(agg(col("__h")).as("kmv"))
      .withColumn("est", kmvEstimateCol(col("kmv"), k))
  }

  /** Theta-sketch set operations over two KMV sketch frames (same
    * group columns, sketch arrays built by [[kmvSketch]] with the same
    * k): per group, distinct estimates for A, B, A∪B, A∩B, A∖B.
    *
    * The theta framework (Dasgupta et al., "Theta-Sketch Framework"):
    * under the joint threshold θ = min(θ_A, θ_B) both retained sets
    * are uniform hash samples of their sides, so |{h < θ} ∩ ...| / θ
    * estimates any set expression — the operation HLL fundamentally
    * lacks. Union re-sketches as bottom-k of the merged arrays (the
    * KMV union is closed); intersection/difference scale the sub-θ
    * sample counts by M/θ. All arithmetic is integer (decimal div),
    * so the oracle replays it exactly.
    *
    * Scale shape: sketches are k longs per group — the join is
    * group-cardinality-sized, broadcastable, with every set estimate
    * computed in-row; the corpora are never revisited. Groups absent
    * from one side estimate against an empty sketch (full outer join,
    * empty array default). */
  def kmvSetOps(a: DataFrame, b: DataFrame, group: Seq[String],
                k: Int): DataFrame = {
    // (k−1)·M ≤ ~1.4e11 and nX·M ≤ k·M — every numerator is exactly
    // representable in double, and both engines perform the SAME
    // multiply-then-divide-then-floor IEEE ops, so the floored
    // estimates are bit-portable without any decimal machinery
    val emptyArr = array().cast("array<bigint>")
    val ja = a.withColumnRenamed("kmv", "ka")
    val jb = b.withColumnRenamed("kmv", "kb")
    val joined = ja.join(jb, group, "full_outer")
      .withColumn("ka", coalesce(col("ka"), emptyArr))
      .withColumn("kb", coalesce(col("kb"), emptyArr))
      // KMV union: bottom-k of the distinct merged hashes — again a
      // KMV sketch, so the same estimator applies
      .withColumn("ku", slice(array_sort(array_distinct(
        concat(col("ka"), col("kb")))), 1, k))
      .withColumn("__theta",
        least(kmvTheta(col("ka"), k), kmvTheta(col("kb"), k)))
    // distinct estimate: exact size below saturation (every distinct
    // hash is retained — and theta = M makes the scaled set estimates
    // exact too), else floor((k−1)·M / h_(k)). CaseWhen evaluates
    // lazily per row, so element_at(ks, k) never fires on an
    // unsaturated sketch (ANSI out-of-bounds).
    def est(ks: Column): Column = kmvEstimateCol(ks, k)
    val nI = size(filter(col("ka"),
      h => array_contains(col("kb"), h) && h < col("__theta")))
    val nD = size(filter(col("ka"),
      h => !array_contains(col("kb"), h) && h < col("__theta")))
    joined
      .withColumn("est_a", est(col("ka")))
      .withColumn("est_b", est(col("kb")))
      .withColumn("est_union", est(col("ku")))
      .withColumn("est_intersect",
        floor(nI.cast("double") * lit(KmvSpace.toDouble) /
          col("__theta")).cast("long"))
      .withColumn("est_diff",
        floor(nD.cast("double") * lit(KmvSpace.toDouble) /
          col("__theta")).cast("long"))
      .select(group.map(col) ++ Seq(col("est_a"), col("est_b"),
        col("est_union"), col("est_intersect"), col("est_diff")): _*)
  }
}
