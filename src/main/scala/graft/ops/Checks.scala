package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates and snapshot auditing — the operational layer a
  * production corpus pipeline runs before and after every stage. */
object Checks {

  /** One-pass rule audit: each rule is (name, violation predicate —
    * true means the row is BAD); returns one (rule, n_bad) row per
    * rule. ALL rules evaluate in a SINGLE scan (conditional sums in
    * one aggregate — running one filter+count per rule would read the
    * corpus once per rule), with map-side partial aggregation; a null
    * predicate result counts as a violation (a rule that cannot
    * evaluate on a row has not validated it). */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be distinct")
    val aggs = rules.map { case (n, bad) =>
      sum(when(coalesce(bad, lit(true)), 1L).otherwise(0L)).as(n) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = rules.map { case (n, _) => s"'$n', `$n`" }
      .mkString(s"stack(${rules.size}, ", ", ", ") AS (rule, n_bad)")
    wide.select(expr(stackExpr))
  }

  /** Duplicate-key audit: number of EXTRA rows per duplicated key
    * value (0 rows out = key is unique). One shuffle with map-side
    * partial counts; output is duplicate-key-sized. */
  def duplicateKeys(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key")).agg((count(lit(1)) - 1L).as("n_extra"))
      .filter(col("n_extra") > 0)

  /** Keyed snapshot diff — the incremental-pipeline audit "what
    * changed between yesterday's corpus and today's": full outer join
    * on the key, rows classified `added` (key only in `neu`),
    * `removed` (only in `old`), `changed` (both, fingerprints differ),
    * `unchanged`. `oldFp`/`neuFp` are content fingerprints (a hash
    * column, a version stamp, ...) evaluated on their own side.
    * Keys must be unique per side ([[duplicateKeys]] gates that);
    * one shuffle per side on the key, null-safe fingerprint compare
    * (two null fingerprints are `unchanged`, one null is `changed`). */
  def keyedDiff(old: DataFrame, neu: DataFrame,
                oldKey: Column, neuKey: Column,
                oldFp: Column, neuFp: Column): DataFrame = {
    // presence comes from side MARKERS, not the fingerprints — a
    // present row with a null fingerprint is not an absent row
    val a = old.select(oldKey.as("key"), oldFp.as("__fp_old"),
      lit(1).as("__in_old"))
    val b = neu.select(neuKey.as("key"), neuFp.as("__fp_new"),
      lit(1).as("__in_new"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") <=> col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Robust per-group outlier screen + winsorization over an INTEGER
    * metric column (cents / micro-units): median and MAD by exact
    * rank (lower median — the value at rank `(n+1) div 2` — not the
    * interpolated midpoint, so every statistic is a value that
    * actually occurs and the whole op stays integer-exact across
    * engines), outlier = deviation beyond 3.5 MAD (the standard
    * robust-z cut, compared as `dev*10 > mad*35` — no floats), and
    * values clipped to the rank-based [p05, p95]. Median/MAD resist
    * the very outliers a mean/stddev screen would absorb — the right
    * screen for skewed web metrics (doc lengths, prices, latencies).
    *
    * Scale shape: two sorted windows over the group key (value order,
    * then deviation order) and three O(groups)-row stat frames joined
    * back — AQE broadcasts them; the data's only shuffles are the two
    * group-key sorts. Ids must be unique (row_number tiebreak).
    * Returns (id, group, v, v_wins, is_outlier). */
  def robustWinsorize(df: DataFrame, group: Column, id: Column,
                      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy(col("__g"))
    val wv = wg.orderBy(col("v"), col("id"))
    val base = df.select(group.as("__g"), id.as("id"),
      value.cast("long").as("v"))
    val r = base.withColumn("n", count(lit(1)).over(wg))
      .withColumn("rn", row_number().over(wv))
    def at(rank: String, as: String) =
      r.filter(col("rn") === expr(rank))
        .select(col("__g"), col("v").as(as))
    val med = at("(n + 1) div 2", "med")
    val p05 = at("greatest(1, (5 * n) div 100)", "p05")
    val p95 = at("greatest(1, (95 * n) div 100)", "p95")
    val dev = base.join(med, Seq("__g"))
      .withColumn("dev", abs(col("v") - col("med")))
    val wd = wg.orderBy(col("dev"), col("id"))
    val mad = dev.withColumn("n", count(lit(1)).over(wg))
      .withColumn("rn", row_number().over(wd))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("__g"), col("dev").as("mad"))
    dev.join(mad, Seq("__g")).join(p05, Seq("__g")).join(p95, Seq("__g"))
      .select(col("id"), col("__g").as("group"), col("v"),
        least(greatest(col("v"), col("p05")), col("p95")).as("v_wins"),
        (col("dev") * 10 > col("mad") * 35).as("is_outlier"))
  }

  /** Rolling robust z-score anomaly flags: per key, each value is
    * judged against the median and MAD of its own trailing
    * `windowRows`-row frame (itself included) in (ts, order) —
    * outlier = deviation beyond 3.5 rolling MADs. The streaming-shaped
    * sibling of [[robustWinsorize]]: global statistics flag a level
    * shift forever, a rolling frame flags only the CHANGE — the right
    * screen for drifting per-entity series (latencies, spend, rates).
    *
    * Median/MAD are computed IN-ROW from the frame's collected values
    * (sorted array, interpolated midpoint — both at most `windowRows`
    * doubles), so the whole row costs O(W log W) with no second
    * window pass; the frame collect itself is the op's cost: each row
    * carries its W-value list through the one per-key sort, a
    * windowRows× row-width blowup that is the documented price of
    * exact rolling order statistics (keep W modest — 25/50/100; an
    * approximate-sketch rolling form can't answer a per-row exact
    * MAD). The MAD frame is centered on the CURRENT row's median,
    * which is what makes it inexpressible as a plain window aggregate
    * in either engine — the oracle replays the same list math. Floats
    * stay deterministic: both engines sort the same doubles and run
    * the identical interpolate/abs/compare sequence, and the 3.5-MAD
    * cut is the cross-multiplied `2·dev > 7·mad`.
    * Returns (key, id, v, med, mad, is_outlier). */
  def rollingRobustZ(df: DataFrame, key: Column, ts: Column, order: Column,
                     value: Column, windowRows: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowRows >= 2,
      s"rollingRobustZ: windowRows must be >= 2, got $windowRows")
    val reserved = Seq("__l", "__med", "__mad")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"rollingRobustZ: input already has reserved working column(s) " +
      s"${clash.mkString(", ")} — rename them first")
    val w = Window.partitionBy(key).orderBy(ts, order)
      .rowsBetween(-(windowRows - 1), 0)
    def medOf(arr: String) =
      s"""CASE WHEN size($arr) % 2 = 1 THEN $arr[size($arr) div 2]
          ELSE ($arr[size($arr) div 2 - 1] + $arr[size($arr) div 2]) / 2
          END"""
    df.filter(ts.isNotNull && value.isNotNull)
      .withColumn("__l",
        sort_array(collect_list(value.cast("double")).over(w)))
      .withColumn("__med", expr(medOf("__l")))
      .withColumn("__mad", expr(medOf(
        "sort_array(transform(__l, x -> abs(x - __med)))")))
      .select(key.as("key"), order.as("id"),
        value.cast("double").as("v"),
        col("__med").as("med"), col("__mad").as("mad"),
        (abs(value.cast("double") - col("__med")) * 2 >
           col("__mad") * 7).as("is_outlier"))
  }

  /** CUSUM change-point detection (Page 1954): per key, the classic
    * two-sided cumulative-sum monitor over the (ts, order) series —
    * s⁺ ← max(0, s⁺ + (x − μ − k)), s⁻ ← max(0, s⁻ + (μ − x − k)),
    * alarm and reset when a side exceeds h — with μ the key's OWN
    * integer-cents mean (self-referenced drift: "did this entity's
    * level shift against its history"). The sibling of
    * [[rollingRobustZ]]: the rolling screen flags single spikes, CUSUM
    * accumulates small persistent shifts a per-point test never sees.
    *
    * Everything is integer (cents, truncated mean, slack k and
    * threshold h in cents), folded in-row over the key's sorted
    * series like [[graft.ops.Events.tokenBucketAudit]] — the
    * max(0,·) clamp breaks affine composition, so the exact
    * sequential fold is the form, bit-replayable by a recursive-CTE
    * oracle; per-key state is the key's event array (the documented
    * bound). One shuffle. Returns (key, n_events, mu_cents,
    * n_up_alarms, n_down_alarms, final_s_up, final_s_dn). */
  def cusumChangePoints(df: DataFrame, key: Column, ts: Column,
                        order: Column, value: Column,
                        slackCents: Long, thresholdCents: Long): DataFrame = {
    require(slackCents >= 0, "cusumChangePoints: slackCents must be >= 0")
    require(thresholdCents > 0,
      "cusumChangePoints: thresholdCents must be > 0")
    val k = slackCents; val h = thresholdCents
    def step(s: String, dev: String) =
      s"greatest(CAST(0 AS BIGINT), st.$s + ($dev - $k))"
    df.filter(ts.isNotNull && value.isNotNull)
      .groupBy(key.as("key"))
      .agg(sort_array(collect_list(struct(ts.as("t"), order.as("o"),
             floor(value * 100 + lit(0.5)).cast("long").as("c"))))
             .as("__xs"),
           sum(floor(value * 100 + lit(0.5)).cast("long")).as("__sum"),
           count(lit(1)).as("n_events"))
      .withColumn("mu_cents", expr("__sum div n_events"))
      .withColumn("__st", expr(
        s"""aggregate(__xs,
             named_struct('su', CAST(0 AS BIGINT), 'sd', CAST(0 AS BIGINT),
                          'nu', CAST(0 AS BIGINT), 'nd', CAST(0 AS BIGINT)),
             (st, x) -> named_struct(
               'su', CASE WHEN ${step("su", "(x.c - mu_cents)")} > $h
                          THEN CAST(0 AS BIGINT)
                          ELSE ${step("su", "(x.c - mu_cents)")} END,
               'sd', CASE WHEN ${step("sd", "(mu_cents - x.c)")} > $h
                          THEN CAST(0 AS BIGINT)
                          ELSE ${step("sd", "(mu_cents - x.c)")} END,
               'nu', st.nu + CASE WHEN ${step("su", "(x.c - mu_cents)")}
                                       > $h THEN 1 ELSE 0 END,
               'nd', st.nd + CASE WHEN ${step("sd", "(mu_cents - x.c)")}
                                       > $h THEN 1 ELSE 0 END))"""))
      .select(col("key"), col("n_events"), col("mu_cents"),
              col("__st.nu").as("n_up_alarms"),
              col("__st.nd").as("n_down_alarms"),
              col("__st.su").as("final_s_up"),
              col("__st.sd").as("final_s_dn"))
  }

  /** Score-decile lift table — the calibration check for every scoring
    * model in the pipeline (quality classifiers, dedup risk, DSIR
    * weights): rank all rows by score, cut into `buckets` rank-exact
    * bins, and report each bin's flag rate in integer permille. A
    * score that predicts the flag shows a monotone permille ramp; a
    * flat table says the model is noise. Integer-exact end to end.
    *
    * Scale shape: the global rank comes from the two-pass distributed
    * prefix sum ([[Packing.orderedCumsum]] over struct(-score, id) —
    * range shuffle + O(partitions) driver offsets), NEVER a
    * single-partition `row_number() OVER ()` window; the bin cut
    * `(rank·buckets) div n` needs only the total count riding in via
    * one broadcast scalar. Ties break by id, so bins are unique.
    * A null flag counts as false (unflagged), matching "no evidence".
    * Output: (bucket 1..buckets, n_rows, n_flag, flag_permille). */
  def liftTable(df: DataFrame, id: Column, score: Column, flag: Column,
                buckets: Int = 10, partitions: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // null scores drop rather than rank: engines disagree on null
    // placement under DESC ordering, so a null-scored row would make
    // the bin cut partitioning-dependent
    val base = df.select(id.as("id"), score.cast("long").as("s"),
        coalesce(flag.cast("boolean"), lit(false)).as("f"))
      .filter(col("s").isNotNull)
    val ranked = Packing.orderedCumsum(base,
      struct((-col("s")).as("sneg"), col("id").as("id")), lit(1L),
      partitions, offsetName = "rnk")
    val tot = base.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("bucket",
        expr(s"(rnk * $buckets) div n_total + 1").cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("f"), 1L).otherwise(0L)).as("n_flag"))
      .withColumn("flag_permille", expr("(1000 * n_flag) div n_rows"))
  }

  /** Rank-exact trimmed mean per group: the mean over values whose
    * within-group rank sits in (lo_permille, hi_permille] — outliers
    * are DROPPED, not clamped (the [[robustWinsorize]] sibling;
    * trimming is the right call when extremes are garbage rather than
    * censored). Rank cuts use the integer formulas of
    * [[robustWinsorize]] (ties by id), sums are exact, and the mean is
    * emitted as the exact integer pair (sum, n) plus a convenience
    * micro-fixed-point ratio from one shared float division.
    * One group-keyed rank window (per-group row counts bound it) and
    * one conditional aggregate.
    * Output: (group, n_kept, sum_kept, mean_fp). */
  def trimmedMean(df: DataFrame, group: Column, id: Column,
                  value: Column, loPermille: Int = 50,
                  hiPermille: Int = 950): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(0 <= loPermille && loPermille < hiPermille &&
      hiPermille <= 1000,
      s"need 0 <= lo < hi <= 1000, got $loPermille/$hiPermille")
    val base = df.select(group.as("__g"), id.as("id"),
        value.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val wg = Window.partitionBy(col("__g"))
    val r = base
      .withColumn("n", count(lit(1)).over(wg))
      .withColumn("rn",
        row_number().over(wg.orderBy(col("v"), col("id"))))
      .filter(col("rn") > expr(s"($loPermille * n) div 1000") &&
              col("rn") <= expr(s"($hiPermille * n) div 1000"))
    r.groupBy(col("__g").as("group"))
      .agg(count(lit(1)).as("n_kept"), sum(col("v")).as("sum_kept"))
      .withColumn("mean_fp",
        floor(col("sum_kept").cast("double") /
              col("n_kept").cast("double") * lit(1000000.0) +
              lit(0.5)).cast("long"))
  }

  /** Funnel attrition report: one row per named pipeline stage with
    * its surviving row count — the per-deploy sanity table ("the
    * quality gate suddenly eats 90%" is a bug you want BEFORE the
    * 100 TB run). Each stage is a scalar count over its (lazy) frame;
    * Spark shares the common lineage prefix between stages' scans.
    * Output: (stage_idx, stage, n_rows) in declaration order. */
  def stageAttrition(stages: Seq[(String, DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"),
                col("n_rows"))
    }.reduce(_ unionByName _)
  }

  /** Population Stability Index per bin: the standard score-drift
    * metric between a baseline and a current snapshot,
    * PSI = Σ (p−q)·ln(p/q) over score bins, with add-one smoothing on
    * the bin counts ((c+1)/(T+B)) so empty bins stay defined — run it
    * per deploy to catch "the quality scorer shifted under us".
    * Convention: PSI < 0.1 stable, > 0.25 investigate.
    *
    * Each bin's term evaluates ONE shared float expression over exact
    * integer counts and quantizes to micro-units (so the total is an
    * order-independent integer sum, [[mixtureEntropy]] discipline).
    * Bins are the integer `bin` values present in EITHER snapshot.
    * Two scans → two bin-count frames → one full-outer join, all
    * bin-frame sized after the count aggregates.
    * Output: (bin, n_base, n_cur, psi_term_fp), plus total via sum. */
  def psiDrift(base: DataFrame, cur: DataFrame, bin: Column)
      : DataFrame = {
    def counts(df: DataFrame) = df.select(bin.cast("long").as("bin"))
      .filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val cb = counts(base)
    val cc = counts(cur)
    val joined = cb.withColumnRenamed("n", "n_base")
      .join(cc.withColumnRenamed("n", "n_cur"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("n_base"), lit(0L)).as("n_base"),
              coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .cut() // totals + the term pass both consume it
    val tots = joined.agg(sum("n_base").as("tb"), sum("n_cur").as("tc"),
      count(lit(1)).as("nb"))
    def d(c: Column) = c.cast("double")
    val p = (d(col("n_base")) + 1.0) / (d(col("tb")) + d(col("nb")))
    val q = (d(col("n_cur")) + 1.0) / (d(col("tc")) + d(col("nb")))
    joined.crossJoin(broadcast(tots))
      .select(col("bin"), col("n_base"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(1000000.0) + lit(0.5))
          .cast("long").as("psi_term_fp"))
  }

  /** Chi-square independence contributions: for a two-way contingency
    * (group × category), each group's Σ over categories of
    * (o−e)²/e with e = row·col/N — "is language independent of
    * source", the drift/bias screen over any pair of labels. The
    * per-cell term is algebraically lifted to integer products,
    * (o·N − r·c)² / (r·c·N), evaluated as ONE shared float expression
    * over exact integer aggregates and quantized micro before the
    * per-group integer sum. Frames after the first count are
    * contingency-sized. Output: (group, n_rows, chi2_fp); the global
    * statistic is the sum, dof = (groups−1)(cats−1). */
  def chiSquareContrib(df: DataFrame, group: Column, category: Column)
      : DataFrame = {
    val cells = df.select(group.as("g"), category.as("c"))
      .filter(col("g").isNotNull && col("c").isNotNull)
      .groupBy("g", "c").agg(count(lit(1)).as("o"))
      .cut() // marginals + term pass consume it
    val rows = cells.groupBy("g").agg(sum("o").as("r"))
    val cols_ = cells.groupBy("c").agg(sum("o").as("cc"))
    val n = cells.agg(sum("o").as("nn"))
    def d(c: Column) = c.cast("double")
    val num = d(col("o")) * d(col("nn")) - d(col("r")) * d(col("cc"))
    val term = num * num /
      (d(col("r")) * d(col("cc")) * d(col("nn")))
    cells.join(rows, "g").join(cols_, "c").crossJoin(broadcast(n))
      .select(col("g"), col("o"),
        floor(term * lit(1000000.0) + lit(0.5)).cast("long").as("t"))
      .groupBy(col("g").as("group"))
      .agg(sum("o").as("n_rows"), sum("t").as("chi2_fp"))
  }

  /** Gini coefficient of a per-group measure (volume concentration):
    * 0 = perfectly even, →1 = one group holds everything — the
    * one-number corpus-balance report ("is the mixture dominated by
    * two sources?"). Standard rank formula
    * G = (2·Σ i·x_(i))/(n·Σx) − (n+1)/n over ascending-sorted group
    * totals (ties by group id for a total order). Σ i·x_i accumulates
    * exactly in decimal(38,0); one shared float expression at the
    * end. The rank window runs over the GROUP frame (strata-sized).
    * Output (one row): (n_groups, total, gini_fp). */
  def giniConcentration(df: DataFrame, group: Column, value: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = df.select(group.as("g"), value.cast("long").as("v"))
      .groupBy("g").agg(sum(col("v")).as("x"))
    val ranked = base.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("g"))))
    def d(c: Column) = c.cast("double")
    ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("tot"),
        sum((col("i") * col("x")).cast(d38)).as("ix"))
      .select(col("n").as("n_groups"), col("tot").as("total"),
        floor((lit(2.0) * d(col("ix")) / (d(col("n")) * d(col("tot")))
               - (d(col("n")) + 1.0) / d(col("n")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("gini_fp"))
  }

  /** Column-completeness and cardinality profile: per listed column,
    * its null count and exact distinct count in ONE scan (conditional
    * sums + distinct aggregates fused into a single aggregate, then
    * unpivoted to a row per column) — the first thing a pipeline
    * prints about an unfamiliar table. Exact countDistinct is the
    * point at audit time; swap [[Sketches.profile]]'s HLL when the
    * column is ultra-wide. Output: (column, n_rows, n_null,
    * n_distinct), one row per listed column. */
  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "need at least one column")
    require(columns.forall(df.columns.contains),
      s"unknown column(s): ${columns.filterNot(df.columns.contains)}")
    val aggs = count(lit(1)).as("__n") +: columns.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(columns.map(c =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
               col(s"__null_$c").as("n_null"),
               col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  /** Equal-width histogram with EXPLICIT empty bins: integer values
    * bucketed by `binWidth` over the [min, max] bin span — empty bins
    * matter (a gap in a distribution is a finding, and downstream
    * plotting/drift math needs aligned bins). Floor division uses the
    * sign-safe `(v - ((v % w + w) % w)) / w` identity — Spark's `div`
    * truncates toward zero on negatives while DuckDB's `//` floors,
    * so a bare div would disagree below zero. One scan to the sparse
    * bin counts; the spine explodes from a 2-row aggregate
    * ([[Events.gapFillHourly]]'s shape). Output: (bin, lo, hi, n). */
  def histogram(df: DataFrame, value: Column, binWidth: Long)
      : DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val b = df.select(value.cast("long").as("v")).filter(col("v").isNotNull)
      // the adjusted numerator divides EXACTLY, so truncating `div`
      // equals floor division — and stays in integer arithmetic
      // (a `/` would detour through double and lose precision on
      // large longs)
      .select(expr(s"(v - ((v % $binWidth + $binWidth) % $binWidth))" +
        s" div $binWidth").as("bin"))
    val counts = b.groupBy("bin").agg(count(lit(1)).as("n"))
    val spine = b.agg(min(col("bin")).as("b0"), max(col("bin")).as("b1"))
      .filter(col("b0").isNotNull)
      .select(explode(sequence(col("b0"), col("b1"))).as("bin"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"), (col("bin") * binWidth).as("lo"),
        ((col("bin") + 1) * binWidth - 1).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Benford's-law first-digit audit: the distribution of leading
    * digits of a positive integer measure vs the Benford expectation
    * log10(1 + 1/d) — the classic fabricated-numbers / broken-ETL
    * screen (organically-grown magnitudes track Benford; truncated,
    * capped, or synthesized columns don't). One scan to 9 digit
    * counts; observed and expected shares in micro fixed point with
    * the single float division shared between engines. The leading
    * digit comes from the DECIMAL STRING head — no float log10 on the
    * value, whose boundary rounding at powers of ten would misbucket.
    * Nonpositive/null values are excluded (no leading digit).
    * Output: (digit 1..9, n, obs_fp, benford_fp, dev_fp). */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val digits = df.select(value.cast("long").as("v"))
      .filter(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("int")
        .as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("t"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        floor(col("n").cast("double") / col("t").cast("double")
          * lit(1000000.0) + lit(0.5)).cast("long").as("obs_fp"),
        floor(log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          / log(lit(10.0)) * lit(1000000.0) + lit(0.5)).cast("long")
          .as("benford_fp"))
      .withColumn("dev_fp", abs(col("obs_fp") - col("benford_fp")))
  }

  /** Per-group category-mixture entropy (nats, micro-fixed-point):
    * H = ln(T) − (Σ c·ln c)/T over the group's category counts — the
    * diversity check run per shard/fold/day after any partitioning op
    * ("did round-robin actually mix the sources?"; a shard that
    * collapsed to one source reads 0). Each c·ln c term quantizes to
    * integer micro-units BEFORE the sum, so the aggregate is
    * order-independent integer arithmetic and both engines agree
    * bit-for-bit (a float Σ c·ln c would be partition-order-dependent);
    * the result is the quantized estimator, deterministic by
    * definition. Two aggregates, category-frame sized.
    * Output: (group, n_rows, n_cats, entropy_fp). */
  def mixtureEntropy(df: DataFrame, group: Column, category: Column)
      : DataFrame = {
    val counts = df.groupBy(group.as("g"), category.as("c"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy("g").agg(
        sum("n").as("n_rows"),
        count(lit(1)).as("n_cats"),
        sum(floor(col("n").cast("double") * log(col("n").cast("double"))
              * lit(1000000.0) + lit(0.5)).cast("long")).as("__clnc"))
      .select(col("g").as("group"), col("n_rows"), col("n_cats"),
        (floor(log(col("n_rows").cast("double")) * lit(1000000.0)
           + lit(0.5)).cast("long")
         - expr("__clnc div n_rows")).as("entropy_fp"))
  }

  /** K-anonymity audit: how much of the table sits in quasi-identifier
    * equivalence classes smaller than `k` — the re-identification risk
    * screen run before releasing any dataset with demographic-ish
    * columns. A row whose (quasi-id tuple) is shared by fewer than k
    * rows is "at risk" (k-anonymity, Sweeney 2002). Null quasi-id
    * values group together (SQL GROUP BY semantics — a null tuple is
    * its own class).
    *
    * One shuffle to the equivalence-class count frame, then a scalar
    * aggregate over CLASSES (class-count rows, not data rows).
    * Output (one row): (n_rows, n_classes, n_rows_at_risk,
    * n_classes_at_risk, risk_permille). */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column], k: Long)
      : DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1L, s"k must be >= 1, got $k")
    df.groupBy(quasiIds: _*).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_rows"),
           count(lit(1)).as("n_classes"),
           sum(when(col("__n") < k, col("__n")).otherwise(0L))
             .as("n_rows_at_risk"),
           sum(when(col("__n") < k, 1L).otherwise(0L))
             .as("n_classes_at_risk"))
      .withColumn("risk_permille",
        expr("(1000 * n_rows_at_risk) div n_rows"))
  }

  /** Referential-integrity orphan audit: per group, how many child
    * rows reference a key absent from the parent key set — dangling
    * foreign keys, events from users who never signed up, chunks
    * pointing at deleted documents. The join-health check a pipeline
    * runs after every incremental merge.
    *
    * One left join against the DISTINCT parent-key frame plus one
    * grouped conditional sum (map-side partials); a null child key is
    * an orphan (it can never reference anything — same convention as
    * [[ruleViolations]]'s null-predicate rule). Output:
    * (group, n_rows, n_orphans, orphan_permille). */
  def orphanAudit(child: DataFrame, childKey: Column, group: Column,
                  parent: DataFrame, parentKey: Column): DataFrame = {
    val p = parent.select(parentKey.as("__pk")).distinct()
      .withColumn("__hit", lit(1))
    child.select(group.as("group"), childKey.as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left")
      .groupBy("group")
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("__hit").isNull, 1L).otherwise(0L))
             .as("n_orphans"))
      .withColumn("orphan_permille",
        expr("(1000 * n_orphans) div n_rows"))
  }

  /** Cross-stratum quantile normalization: each row's score is replaced
    * by the GLOBAL score at its within-stratum quantile — the
    * batch-effect correction that makes per-source scorer biases
    * comparable before one global threshold cuts the corpus (a source
    * whose scorer runs hot stops flooding the keep set). Rank-based
    * and integer-exact: within-stratum rank r of n_g maps to global
    * rank ((r-1)·N) div n_g + 1, ties broken by id on both sides, so
    * the result is deterministic and engine-replayable.
    *
    * Scale shape: both rank passes are the two-pass distributed prefix
    * sum ([[Packing.orderedCumsum]]) — stratum-major and global — never
    * a single-partition window; per-stratum starts/sizes and the total
    * are O(strata) broadcast frames, and the final lookup is ONE
    * equi-join on the computed global rank. Output:
    * (id, group, v, v_norm). */
  def quantileNormalize(df: DataFrame, id: Column, group: Column,
                        value: Column, partitions: Int = 32)
      : DataFrame = {
    val base = df.select(id.as("id"), group.as("grp"),
      value.cast("long").as("v"))
    val bySrc = Packing.orderedCumsum(base,
      struct(col("grp").as("g"), col("v").as("v"), col("id").as("id")),
      lit(1L), partitions, offsetName = "goff")
    val starts = bySrc.groupBy("grp")
      .agg(min(col("goff")).as("g0"), count(lit(1)).as("ng"))
    val tot = base.agg(count(lit(1)).as("n"))
    val local = bySrc.join(broadcast(starts), Seq("grp"))
      .crossJoin(broadcast(tot))
      .withColumn("r", col("goff") - col("g0") + 1L)
      .withColumn("tr", expr("(r - 1) * n div ng + 1"))
    val glob = Packing.orderedCumsum(base,
        struct(col("v").as("v"), col("id").as("id")), lit(1L),
        partitions, offsetName = "off")
      .select((col("off") + 1L).as("tr"), col("v").as("v_norm"))
    local.join(glob, Seq("tr"))
      .select(col("id"), col("grp").as("group"), col("v"),
              col("v_norm"))
  }

  /** Per-group ordinary-least-squares line fit over integer fixed-point
    * points — the engine-portable form of `regr_slope`/`regr_intercept`
    * (whose internal accumulation order engines don't specify). The five
    * sufficient statistics (n, Σx, Σy, Σxy, Σx²) accumulate as EXACT
    * decimal(38,0) integers — order-independent, so partial aggregation
    * commutes and the result is bit-reproducible on any partitioning —
    * and only the final closed-form slope/intercept touches floats, as
    * one shared expression over correctly-rounded int→double casts
    * (the [[graft.ops.Similarity]] fixed-point discipline).
    *
    * One shuffle on the group key with map-side partials; O(1) state
    * per group. Precondition: |x|,|y| < 3e9 so x·y and x² fit a long
    * before the decimal cast (micro-unit ln/ratio encodings are ~2e7).
    * Groups with < 2 points or zero x-variance have no defined line and
    * are dropped (a null slope would poison downstream ranking).
    * Output: (group, n_points, slope, intercept), floats rounded to 6. */
  def olsFitFp(df: DataFrame, group: Column, x: Column, y: Column)
      : DataFrame = {
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    // a null coordinate is not a point: without the filter the count
    // n would include rows the Σ aggregates skipped, silently bending
    // every fit that sees a null
    val b = df.select(group.as("group"),
        x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val ag = b.groupBy("group").agg(
      count(lit(1)).as("n_points"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"))
    def d(c: String): Column = col(c).cast("double")
    val den = d("n_points") * d("sxx") - d("sx") * d("sx")
    val slope = (d("n_points") * d("sxy") - d("sx") * d("sy")) / den
    ag.filter(col("n_points") >= 2 && den =!= 0.0)
      .select(col("group"), col("n_points"),
        round(slope, 6).as("slope"),
        round((d("sy") - slope * d("sx")) / d("n_points"), 6)
          .as("intercept"))
  }

  /** Row quarantine: tag every row with the FIRST rule it violates
    * (null when clean) — the split behind every ingest pipeline's
    * good-path/dead-letter fork. One pure expression per row (a
    * coalesced when-chain in declaration order), so the tagging fuses
    * into the scan and both forks (`filter(violated_rule.isNull)` /
    * `.isNotNull`) share it; a rule that cannot evaluate (null
    * predicate) counts as violated, same contract as
    * [[ruleViolations]]. */
  def quarantineRows(df: DataFrame, rules: Seq[(String, Column)])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be distinct")
    require(!df.columns.contains("violated_rule"),
      "input already has a violated_rule column")
    val tag = rules.foldRight(lit(null).cast("string")) {
      case ((name, bad), rest) =>
        when(coalesce(bad, lit(true)), lit(name)).otherwise(rest)
    }
    df.withColumn("violated_rule", tag)
  }

  /** Join-key discovery (inclusion-dependency mining): for every
    * ordered pair of candidate columns, how much of column A's
    * distinct value set is contained in column B's — containment at
    * 1000000 ppm means every A value joins, the foreign-key signal
    * schema archaeology on an undocumented lake starts from.
    * `candidates` is (label, frame, column); values compare as
    * strings so cross-typed columns (int id vs varchar id) still
    * match textually.
    *
    * Shape at 100 TB: each candidate collapses to its DISTINCT value
    * frame first (map-side combine), the pairwise meet is ONE
    * value-keyed equi-join over those deduplicated frames — candidate
    * pairs never enumerate raw rows, and the counts frame is
    * labels²-sized. Containment is integer ppm (floor division). */
  def inclusionDependencies(candidates: Seq[(String, DataFrame, String)])
      : DataFrame = {
    require(candidates.size >= 2, "need at least two candidate columns")
    require(candidates.map(_._1).distinct.size == candidates.size,
      "candidate labels must be distinct")
    val values = candidates.map { case (label, df, c) =>
        df.select(col(c).cast("string").as("v"))
          .filter(col("v").isNotNull).distinct()
          .select(lit(label).as("l"), col("v"))
      }.reduce(_ unionByName _)
    val sizes = values.groupBy(col("l")).agg(count(lit(1)).as("n"))
    val common = values.as("a")
      .join(values.as("b"), col("a.v") === col("b.v"))
      .filter(col("a.l") =!= col("b.l"))
      .groupBy(col("a.l").as("col_a"), col("b.l").as("col_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.select(col("l").as("col_a"),
        col("n").as("n_a"))), "col_a")
      .join(broadcast(sizes.select(col("l").as("col_b"),
        col("n").as("n_b"))), "col_b")
      .select(col("col_a"), col("col_b"), col("n_a"), col("n_b"),
        col("n_common"),
        expr("n_common * 1000000 div n_a").as("containment_ppm"))
  }
}
