package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling, splitting, and corpus mixing —
  * the reproducibility layer of a training-data pipeline. Every
  * decision is a pure function of the row's id (MINSTD Lehmer hash,
  * integer-only arithmetic), so runs are bit-reproducible across
  * engines, re-runs, and cluster sizes: no RNG state, no
  * partition-order dependence, and the DuckDB oracle replays the
  * identical assignment with the identical formula. All per-row ops
  * are narrow (filter / projection — no shuffle): at 100 TB a split
  * or a mixture re-weighting is a single map pass that preserves the
  * upstream partitioning, and the hash predicate sits directly above
  * the scan so column pruning and partition pruning survive. The one
  * inherently-wide op, [[tokenBudget]] (a running total), uses the
  * distributed two-pass scan — see its doc. */
object Sampling {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Double-round MINSTD hash of an integer id into [0, 2^31-1):
    * x = (id + seed + 1) mod p made non-negative, then TWO Lehmer
    * rounds (x * 48271 mod p, twice). One round is NOT enough: for a
    * dense small id space (ids < ~22k), id * 48271 never reaches
    * p/2, so every row of a small corpus would sort below any >=0.5
    * threshold — a 0.5 "sample" that keeps 100%. The second round
    * spreads those partial products across the full range. The +1
    * offset moves id 0 off the Lehmer fixed point at 0 (which would
    * land in the first split bucket under every seed). `seed`
    * decorrelates independent sampling decisions on the same ids
    * (sample-then-split must not reuse one hash, or the second
    * decision is a deterministic function of the first and strata
    * collapse). Still 100% integer arithmetic — no overflow (operands
    * stay < 2^31 * 48271 < 2^47) and bit-reproducible in the oracle's
    * SQL replay. */
  def idHash(id: Column, seed: Long = 0L): Column = {
    val r = (id + lit(seed + 1L)) % P
    val r1 = (((r + P) % P) * 48271L) % P
    (r1 * 48271L) % P
  }

  /** Keep a deterministic `fraction` of rows: idHash(id) < floor(
    * fraction * p). Integer threshold compare — no float boundary
    * ambiguity between engines. */
  def sampleByHash(df: DataFrame, id: Column, fraction: Double,
                   seed: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    df.filter(idHash(id, seed) < math.floor(fraction * P).toLong)
  }

  /** EXACTLY k rows per group, deterministically: the k smallest
    * [[idHash]] values (ties broken by id) — the fixed-size per-group
    * sample fractions can't give ("200 eval docs per source", "k
    * examples per class for the eyeball file"). Because the hash is a
    * fixed function of the id, a row's membership changes only when
    * its RANK does — stable under appends that don't displace it, and
    * bit-reproducible in a SQL replay. One shuffle on the group key;
    * the window keeps k per group (partial top-k would also work; the
    * window form keeps the rank visible). */
  def sampleExactK(df: DataFrame, id: Column, group: Column, k: Int,
                   seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val reserved = Seq("__h", "__rk")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"sampleExactK: input already has ${clash.mkString(", ")}")
    val w = Window.partitionBy(group).orderBy(col("__h"), id)
    df.withColumn("__h", idHash(id, seed))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__h", "__rk")
  }

  /** Assign each row a split label ("train"/"val"/"test", any names)
    * by consecutive integer hash ranges sized to `weights` (need not
    * sum to 1 — normalized). Appends a `split` column; rows never move,
    * so this is a zero-shuffle projection and the split is stable under
    * corpus growth (a row's label never depends on other rows). */
  def hashSplit(df: DataFrame, id: Column,
                weights: Seq[(String, Double)],
                seed: Long = 0L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0) &&
            weights.map(_._2).sum > 0.0,
      "weights must be non-empty, non-negative, and not all zero")
    val total = weights.map(_._2).sum
    val cums = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
    // integer upper bounds per split; the last is forced to p so
    // float rounding can never leave an unlabeled sliver at the top
    val his = cums.tail.map(c => math.floor(c * P).toLong)
      .updated(weights.size - 1, P)
    val h = idHash(id, seed)
    val los = 0L +: his.init
    val labeled = weights.map(_._1).lazyZip(los).lazyZip(his).toSeq
      .foldLeft(Option.empty[Column]) { case (acc, (name, lo, hi)) =>
        val cond = h >= lo && h < hi
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }.get
    df.withColumn("split", labeled)
  }

  /** Split assignment that near-duplicate pairs can never straddle.
    * Documents are first clustered into near-dup components
    * ([[graft.ops.Dedup.connectedComponents]] over `pairs`), then every
    * member of a component hashes on the component's canonical
    * representative (minimum member id) instead of its own id — the
    * whole cluster lands in one split by construction. Singletons (no
    * near-dup pair) hash on their own id, so the assignment is
    * IDENTICAL to [[hashSplit]] wherever no near-dup exists, and stays
    * growth-stable there. This CLOSES the train/eval contamination
    * channel that a split-leakage check (q87) merely measures: per-doc
    * hashing lets a near-dup pair land in train and test and leak the
    * eval answer into training; per-component hashing makes that
    * impossible.
    *
    * Scale: the component frame is proportional to documents that HAVE
    * a near-dup (a small fraction of any real corpus), keyed by id —
    * the left join broadcasts when small and AQE picks a shuffle join
    * past that; everything else is the same zero-shuffle projection as
    * [[hashSplit]]. */
  def leakageSafeSplit(df: DataFrame, id: Column, pairs: DataFrame,
                       pid1: Column, pid2: Column,
                       weights: Seq[(String, Double)],
                       seed: Long = 0L): DataFrame = {
    Seq("__lss_id", "__lss_comp").foreach(n =>
      require(!df.columns.contains(n),
        s"leakageSafeSplit: input already has reserved column '$n'"))
    val comp = graft.ops.Dedup.connectedComponents(pairs, pid1, pid2)
      .select(col("id").as("__lss_id"), col("comp").as("__lss_comp"))
    hashSplit(df.join(comp, id === col("__lss_id"), "left"),
              coalesce(col("__lss_comp"), id), weights, seed)
      .drop("__lss_id", "__lss_comp")
  }

  /** Deterministic k-fold cross-validation assignment: fold =
    * idHash mod k — every row labeled 0..k-1, folds near-equal-sized,
    * stable under corpus growth (a row's fold never depends on other
    * rows) and decorrelated from splits/samples on the same ids via
    * `seed`. Zero shuffle: a pure projection above the scan. */
  def kFold(df: DataFrame, id: Column, k: Int, seed: Long = 0L)
      : DataFrame = {
    require(k >= 2, s"kFold: need k >= 2 folds, got $k")
    require(!df.columns.contains("fold"),
      "kFold: input already has a 'fold' column — rename it first")
    df.withColumn("fold", pmod(idHash(id, seed), lit(k.toLong)))
  }

  /** Leakage-safe k-fold: near-duplicate components fold on their
    * canonical representative (smallest member id), so no near-dup
    * pair ever straddles a train/eval fold boundary — the same
    * contamination guarantee as [[leakageSafeSplit]], in fold form.
    * Singletons get exactly their plain [[kFold]] assignment. */
  def kFoldLeakageSafe(df: DataFrame, id: Column, pairs: DataFrame,
                       pid1: Column, pid2: Column, k: Int,
                       seed: Long = 0L): DataFrame = {
    Seq("__lss_id", "__lss_comp").foreach(n =>
      require(!df.columns.contains(n),
        s"kFoldLeakageSafe: input already has reserved column '$n'"))
    val comp = graft.ops.Dedup.connectedComponents(pairs, pid1, pid2)
      .select(col("id").as("__lss_id"), col("comp").as("__lss_comp"))
    kFold(df.join(comp, id === col("__lss_id"), "left"),
          coalesce(col("__lss_comp"), id), k, seed)
      .drop("__lss_id", "__lss_comp")
  }

  /** Per-stratum deterministic sampling: each row keeps or drops by the
    * MINSTD hash of its id under its stratum's rate (e.g. downsample
    * "en" to 0.5 while keeping all of "de"). The standard
    * language/source-rebalancing op of a training-data pipeline.
    *
    * `rates` is ordered — stratum i hashes with seed offset
    * 1000003*(i+1) (same decorrelation scheme as [[mixCorpora]]) so
    * identical id spaces in different strata make independent keep
    * decisions. Strata not listed fall to `defaultRate` (seed offset 0).
    * Zero shuffle: the keep predicate is a pure projection over
    * (id, stratum) sitting directly above the scan. */
  def stratifiedSample(df: DataFrame, id: Column, strata: Column,
                       rates: Seq[(String, Double)],
                       defaultRate: Double = 0.0,
                       seed: Long = 0L): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0,1]")
    val keep = rates.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((name, rate), i)) =>
        val cond = strata === name
        val pass = idHash(id, seed + 1000003L * (i + 1)) <
          math.floor(rate * P).toLong
        Some(acc.fold(when(cond, pass))(_.when(cond, pass)))
    }.get.otherwise(idHash(id, seed) < math.floor(defaultRate * P).toLong)
    df.filter(keep)
  }

  /** Deterministic epoch upsampling for rates ABOVE 1.0 — the "repeat
    * the books corpus 2.5 times" side of mixture weighting
    * ([[mixCorpora]] covers rates <= 1). Every row gets
    * floor(rate) full copies plus a hash-sampled fractional copy,
    * each tagged with an `epoch` column (0-based) so downstream
    * shuffling/packing treats repeats as distinct rows. The fractional
    * decision hashes with seed offset 1000003 * ceil(rate) — same
    * decorrelation scheme as the other ops, so it is independent of
    * splits/samples on the same ids. Narrow: an explode over a
    * copies-sized literal range plus a filter, no shuffle; replayable
    * as SQL (q92). */
  def epochUpsample(df: DataFrame, id: Column, rate: Double,
                    seed: Long = 0L): DataFrame = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    val full = math.floor(rate).toLong
    val frac = rate - full
    val copies = full + (if (frac > 0) 1L else 0L)
    if (copies == 0L)
      return df.withColumn("epoch", lit(0L)).limit(0)
    val thresh = math.floor(frac * P).toLong
    df.withColumn("epoch", explode(sequence(lit(0L), lit(copies - 1L))))
      .filter(col("epoch") < full ||
        idHash(id, seed + 1000003L * copies) < thresh)
  }

  /** Weighted corpus mixture: union the sources, each deterministically
    * downsampled to its rate, tagged with its source name. The standard
    * "mixture weights" op (sample web at 0.3, books at 1.0, ...).
    * Per-source seeds are offset so identical id spaces in different
    * sources make independent keep decisions. Schemas must match
    * (select your columns first); union is a zero-shuffle concat. */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], id: Column,
                 seed: Long = 0L): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.zipWithIndex.map { case ((name, df, rate), i) =>
      sampleByHash(df, id, rate, seed + 1000003L * (i + 1))
        .withColumn("mix_source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Temperature-scaled mixture (the multilingual-LM alpha-sampling
    * knob): per-source keep rates proportional to n_i^(alpha-1),
    * normalized so the most-upweighted source keeps everything —
    * alpha=1 reproduces natural proportions (all rates 1), alpha->0
    * approaches uniform over sources. Realized by [[mixCorpora]]'s
    * deterministic hash sampling. Driver state: one count per source
    * (a metadata-cheap agg each, never row data). */
  def mixCorporaTemperature(sources: Seq[(String, DataFrame)],
                            id: Column, alpha: Double,
                            seed: Long = 0L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    require(sources.nonEmpty, "need at least one source")
    val weights = sources.map { case (name, df) =>
      val n = df.count()
      require(n > 0, s"source $name is empty")
      name -> math.pow(n.toDouble, alpha - 1.0)
    }.toMap
    val maxW = weights.values.max
    mixCorpora(sources.map { case (name, df) =>
      (name, df, weights(name) / maxW)
    }, id, seed)
  }

  /** Token-budget head per group: keep each group's documents — in the
    * deterministic [[idHash]] order, ties by id — until that group's
    * token budget is exhausted (a row survives iff the running token
    * total THROUGH it is <= the budget). This is mixture weighting the
    * way trainers actually specify it: "200 B tokens of web, 40 B of
    * books", not per-document keep rates ([[mixCorpora]]). Rows whose
    * group has no budget are dropped.
    *
    * Scale shape — the naive form is a window
    * `sum over (partition by group order by hash)`, which funnels each
    * group onto ONE task (a handful of groups = a handful of straggler
    * tasks at 100 TB). Instead, the same two-pass distributed scan as
    * [[Packing.orderedCumsum]], grouped: range-partition on (group,
    * hash, id), aggregate per-(partition, group) token totals
    * (O(partitions x groups) rows to the driver), convert to
    * per-(partition, group) starting offsets, broadcast them back, and
    * finish with a within-partition running sum. Every stage is
    * distributed; re-execution determinism follows the orderedCumsum
    * argument (explicit partition count exempts the exchange from AQE
    * coalescing; range boundaries are sampled with deterministic
    * seeds). Ids must give a total order within each group.
    *
    * `orderKey` overrides the hash sort key: pass a numeric column and
    * the budget head is taken in ITS ascending order (ties by id)
    * instead of the uniform-random one — see [[tokenBudgetBestFirst]]
    * for the quality-ordered form. */
  def tokenBudget(df: DataFrame, id: Column, group: Column, tokens: Column,
                  budgets: Map[String, Long], seed: Long = 0L,
                  partitions: Int = 32,
                  orderKey: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty, "need at least one group budget")
    require(budgets.values.forall(_ >= 0L), "budgets must be >= 0")
    val reserved = Seq("__g", "__h", "__v", "__pid", "__base",
      "__budget", "__cum")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"tokenBudget: column(s) ${clash.mkString(", ")} already exist")
    val spark = df.sparkSession
    import spark.implicits._
    // materialized (localCheckpoint) for the same reason as
    // orderedCumsum: the totals job and the final job must see the
    // SAME range boundaries, and RangePartitioner samples with a
    // per-job rdd.id-derived seed — without the pin, a strict
    // subsample at scale can cut different boundaries per job and
    // mis-base the running totals
    val p = df.withColumn("__g", group)
      .filter(col("__g").isin(budgets.keys.toSeq: _*))
      .withColumn("__h", orderKey.getOrElse(idHash(id, seed)))
      .withColumn("__v", coalesce(tokens.cast("long"), lit(0L)))
      .repartitionByRange(partitions, col("__g"), col("__h"), id)
      .sortWithinPartitions(col("__g"), col("__h"), id)
      .withColumn("__pid", spark_partition_id())
      .cut()
    // per-(partition, group) totals -> per-group prefix offsets; the
    // driver sees O(partitions x groups) longs, never row data. The
    // group's budget rides along in the same broadcast frame (a
    // when-ladder over budgets would grow a case expression per group
    // — fine for 20 sources, pathological for 20k domains)
    val totals = p.groupBy("__pid", "__g").agg(sum(col("__v")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val bases = totals.groupBy(_._2).iterator.flatMap { case (g, rows) =>
      val byPid = rows.sortBy(_._1)
      byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _)).map {
        case (pid, off) => (pid, g, off, budgets(g))
      }
    }.toSeq.toDF("__pid", "__g", "__base", "__budget")
    val w = Window.partitionBy(col("__pid"), col("__g"))
      .orderBy(col("__h"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.join(broadcast(bases), Seq("__pid", "__g"))
      .withColumn("__cum", col("__base") + sum(col("__v")).over(w))
      .filter(col("__cum") <= col("__budget"))
      .drop(reserved: _*)
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis exponential keys): per stratum, keep the k
    * rows with the smallest `-ln(u)/w` where u is the row's [[idHash]]
    * uniform and w its weight — selection probability proportional to
    * weight, no RNG state, reproducible under re-runs, engine replays,
    * and corpus repartitioning. The quality-WEIGHTED middle ground
    * between the uniform hash sample (all docs equal) and best-first
    * curation (only the top docs survive): high-quality docs are
    * favored, low-quality ones still appear at their proportional
    * rate — the mixture actually wanted for "mostly good with a long
    * tail" training sets.
    *
    * Portability: u = (hash+1)/(2^31-1) is an IEEE-exact division,
    * ln is rounded to micro-units (`floor(-ln(u)*1e6 + 0.5)` — the
    * proven cross-engine idiom), and the final key is the exact
    * integer `(eln * 1e6) div w`, so the selected set is identical in
    * the SQL replay. Weights must be positive integers (fixed-point
    * scores); nonpositive/null weights mean zero selection mass and
    * those rows are excluded. One shuffle on the stratum key via the
    * per-group top-k window; at 100 TB swap in the map-side
    * [[graft.functions.Reducers]] partial top-k like the ANN paths. */
  def weightedSample(df: DataFrame, id: Column, stratum: Column,
                     weight: Column, k: Int, seed: Long = 0L)
      : DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    val reserved = Seq("__eln", "__w", "__wkey")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"weightedSample: reserved column(s) ${clash.mkString(", ")} " +
      "already on the input — rename them first")
    val u = (idHash(id, seed) + lit(1L)).cast("double") / lit(P.toDouble)
    val keyed = df
      .withColumn("__w", weight.cast("long"))
      .filter(col("__w") > 0L)
      .withColumn("__eln",
        floor(-log(u) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("__wkey", expr("(__eln * 1000000) div __w"))
    Relational.topKPerGroup(keyed, Seq(stratum),
        Seq(col("__wkey").asc, id.asc), k)
      .withColumnRenamed("__wkey", "key_fp")
      .drop("__eln", "__w")
  }

  /** Best-first token-budget curation: [[tokenBudget]] taken in
    * `score`-DESCENDING order (ties by id) instead of the uniform
    * hash — "the highest-quality N tokens per domain", the budgeted
    * complement of quality-quantile curation
    * ([[graft.ops.Relational.topFractionPerGroup]]: that keeps a
    * fraction of DOCS, this keeps the best docs that fit a TOKEN
    * budget). Same distributed grouped prefix sum; `score` must be an
    * integer column (fixed-point quality) so its negation is an exact
    * range-partitionable sort key. */
  def tokenBudgetBestFirst(df: DataFrame, id: Column, group: Column,
                           tokens: Column, score: Column,
                           budgets: Map[String, Long],
                           partitions: Int = 32): DataFrame =
    tokenBudget(df, id, group, tokens, budgets, partitions = partitions,
                orderKey = Some((score * -1).cast("long")))
}
