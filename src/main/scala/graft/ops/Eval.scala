package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact, engine-portable binary-classifier evaluation at corpus
  * scale — the measurement side of every quality-classifier gate in
  * the curation pipeline (seed NB, DSIR, LM scores): ROC-AUC
  * (Mann-Whitney U with average-rank tie handling), the
  * precision-recall curve and its step-interpolated area, and
  * reliability (calibration) bins.
  *
  * Numeric contract: `score` is an INTEGER column (the engine's
  * micro-unit fixed-point convention — a float-scored caller quantizes
  * first, the [[Sketches.profileExact]] precedent) and `label` is
  * boolean (null = negative). Every output is an exact integer: sums
  * run in decimal(38,0) (= DuckDB's HUGEINT), ratios emerge as
  * HALF-UP-rounded micro-units via integral division
  * (`(2·10^6·num + den) div (2·den)`, operands kept non-negative so
  * truncation == floor in both engines) — no IEEE summation order
  * anywhere, so a SQL oracle replays each value bit-for-bit.
  *
  * Scale shape: one `groupBy(score)` collapses the corpus to the
  * distinct-score table (micro-unit classifier scores repeat heavily;
  * worst case it is corpus-sized and everything still distributes);
  * rank / suffix statistics come from [[Packing.orderedCumsums]]'s
  * range-partitioned prefix sum over that table — never a
  * single-task `ORDER BY` window over the corpus, no driver state
  * beyond the prefix sum's O(partitions) offsets.
  */
object Eval {

  private val dec = DecimalType(38, 0)

  /** Distinct-score table: (s, n, p) = score, rows, positives. */
  private def byScore(df: DataFrame, score: Column,
                      label: Column): DataFrame =
    df.select(score.cast("long").as("s"),
        when(coalesce(label.cast("boolean"), lit(false)), 1L)
          .otherwise(0L).as("__y"))
      .groupBy("s")
      .agg(count(lit(1)).as("n"), sum("__y").as("p"))

  /** Exact ROC-AUC, one row: (n_pos, n_neg, auc_num2, auc_den,
    * auc_micro). AUC = P(score⁺ > score⁻) + ½·P(tie) computed as the
    * Mann-Whitney rank sum with average ranks over tie groups; to stay
    * integer the rank sum is carried DOUBLED (a tie group occupying
    * positions b+1..b+n has average rank (2b+n+1)/2), so
    * `auc_num2 = 2·Σranks⁺ − n_pos(n_pos+1) = 2·U` and
    * `auc_den = 2·n_pos·n_neg`; `auc_micro` is the half-up-rounded
    * micro-unit quotient (null when one class is absent — den 0).
    * num2/den/micro fit a long through n ≈ 4·10⁶ rows; the decimal
    * intermediates themselves never overflow. */
  def rocAuc(df: DataFrame, score: Column, label: Column,
             partitions: Int = 32): DataFrame = {
    val ranked = Packing.orderedCumsums(byScore(df, score, label),
      col("s"), Seq("__nb" -> col("n")), partitions)
    ranked.agg(
        sum(col("p").cast(dec)).as("__np"),
        sum((col("n") - col("p")).cast(dec)).as("__nn"),
        // 2× the average rank of s's tie group = 2·(rows before) + n + 1
        sum(col("p").cast(dec) *
          (col("__nb").cast(dec) * 2 + col("n") + 1)).as("__rs2"))
      .withColumn("__num2", col("__rs2") - col("__np") * (col("__np") + 1))
      .withColumn("__den", col("__np") * col("__nn") * 2)
      .select(
        col("__np").cast("long").as("n_pos"),
        col("__nn").cast("long").as("n_neg"),
        col("__num2").cast("long").as("auc_num2"),
        col("__den").cast("long").as("auc_den"),
        when(col("__np") === 0 || col("__nn") === 0,
            lit(null).cast("long"))
          .otherwise(
            expr("(__num2 * 1000000 + __np * __nn) div __den"))
          .as("auc_micro"))
  }

  /** Per-group exact ROC-AUC — [[rocAuc]] with one row per `group`
    * (classifier health across sources/domains/languages: one
    * pass answers "where does the gate degrade"). Rank statistics
    * come from the GROUPED two-pass prefix sum ([[Sampling.tokenBudget]]'s
    * shape): range-partition the distinct (group, score) table on
    * (g, s), per-(partition, group) totals → per-group bases on the
    * driver (O(partitions × groups) longs, never row data), broadcast
    * back under a per-(partition, group) window — no one-task-per-
    * group global window, so 20k domains cost the same shuffle as 2. */
  def rocAucByGroup(df: DataFrame, group: Column, score: Column,
                    label: Column, partitions: Int = 32): DataFrame = {
    import graft.Checkpoints.CheckpointOps
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // Null group keys surface as their own "<null>" group instead of
    // silently vanishing (a null source/domain is exactly the slice a
    // health check must not lose): the inner join with the broadcast
    // bases frame would never match a null g, so coalesce to a
    // sentinel before anything keys on it. Known limit: a corpus
    // whose group column already CONTAINS the literal string "<null>"
    // pools with true nulls — callers with such data should
    // pre-encode their keys (the alternative, a (is_null, key)
    // struct, would change the output schema for every caller).
    val g0 = df.select(
        coalesce(group.cast("string"), lit("<null>")).as("g"),
        score.cast("long").as("s"),
        when(coalesce(label.cast("boolean"), lit(false)), 1L)
          .otherwise(0L).as("__y"))
      .groupBy("g", "s")
      .agg(count(lit(1)).as("n"), sum("__y").as("p"))
    // materialized so the totals job and the final job see the SAME
    // range boundaries (the tokenBudget/orderedCumsum invariant)
    val p0 = g0.repartitionByRange(partitions, col("g"), col("s"))
      .sortWithinPartitions(col("g"), col("s"))
      .withColumn("__pid", spark_partition_id())
      .cut()
    val totals = p0.groupBy("__pid", "g").agg(sum(col("n")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val bases = totals.groupBy(_._2).iterator.flatMap {
      case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _)).map {
          case (pid, off) => (pid, g, off) }
    }.toSeq.toDF("__pid", "g", "__base")
    val w = Window.partitionBy(col("__pid"), col("g"))
      .orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p0.join(broadcast(bases), Seq("__pid", "g"))
      .withColumn("__nb",
        col("__base") + sum(col("n")).over(w) - col("n"))
      .groupBy("g")
      .agg(sum(col("p").cast(dec)).as("__np"),
           sum((col("n") - col("p")).cast(dec)).as("__nn"),
           sum(col("p").cast(dec) *
             (col("__nb").cast(dec) * 2 + col("n") + 1)).as("__rs2"))
      .withColumn("__num2",
        col("__rs2") - col("__np") * (col("__np") + 1))
      .withColumn("__den", col("__np") * col("__nn") * 2)
      .select(col("g"),
        col("__np").cast("long").as("n_pos"),
        col("__nn").cast("long").as("n_neg"),
        col("__num2").cast("long").as("auc_num2"),
        col("__den").cast("long").as("auc_den"),
        when(col("__np") === 0 || col("__nn") === 0,
            lit(null).cast("long"))
          .otherwise(
            expr("(__num2 * 1000000 + __np * __nn) div __den"))
          .as("auc_micro"))
  }

  /** Precision-recall curve, one row per distinct threshold
    * (predict positive at score ≥ threshold): (threshold, n, p, tp,
    * pp, prec_micro, rec_micro) — tie groups share one threshold, tp /
    * pp are the exact suffix counts of positives / predictions, and
    * the two ratios are half-up micro-units. The suffix counts are
    * ONE [[Packing.orderedCumsums]] pass over the negated score. */
  def prCurve(df: DataFrame, score: Column, label: Column,
              partitions: Int = 32): DataFrame = {
    val g = byScore(df, score, label)
    val ranked = Packing.orderedCumsums(g, col("s") * lit(-1L),
      Seq("__nb" -> col("n"), "__pb" -> col("p")), partitions)
    val tot = g.agg(sum(col("p").cast(dec)).as("__np"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("tp", col("__pb") + col("p"))
      .withColumn("pp", col("__nb") + col("n"))
      .withColumn("__tpd", col("tp").cast(dec))
      .withColumn("__ppd", col("pp").cast(dec))
      .select(col("s").as("threshold"), col("n"), col("p"),
        col("tp"), col("pp"),
        expr("(__tpd * 2000000 + __ppd) div (__ppd * 2)")
          .as("prec_micro"),
        when(col("__np") === 0, lit(null).cast("long"))
          .otherwise(expr("(__tpd * 2000000 + __np) div (__np * 2)"))
          .as("rec_micro"))
  }

  /** Step-interpolated PR-AUC, one row: (n_pos, n_neg, n_thresholds,
    * pr_auc_micro). Area = Σᵢ ΔRecallᵢ · Precisionᵢ over thresholds
    * descending (ΔTPᵢ = the tie group's positives pᵢ), each term
    * rounded half-up to micro-units BEFORE the sum — the established
    * integer-portability trade (per-term error ≤ 0.5 µ, and both
    * engines compute the identical integers). Zero-positive tie groups
    * contribute exactly 0, so no special-casing. */
  def prAuc(df: DataFrame, score: Column, label: Column,
            partitions: Int = 32): DataFrame = {
    val g = byScore(df, score, label)
    val ranked = Packing.orderedCumsums(g, col("s") * lit(-1L),
      Seq("__nb" -> col("n"), "__pb" -> col("p")), partitions)
    val tot = g.agg(sum(col("p").cast(dec)).as("__np"),
                    sum((col("n") - col("p")).cast(dec)).as("__nn"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("__tp", (col("__pb") + col("p")).cast(dec))
      .withColumn("__pp", (col("__nb") + col("n")).cast(dec))
      .withColumn("__term",
        when(col("__np") === 0, lit(0L)).otherwise(expr(
          "(p * __tp * 2000000 + __pp * __np) div (__pp * __np * 2)")))
      .agg(max(col("__np")).cast("long").as("n_pos"),
           max(col("__nn")).cast("long").as("n_neg"),
           count(lit(1)).as("n_thresholds"),
           sum(col("__term")).cast("long").as("pr_auc_micro"))
  }

  /** Best-F1 operating point, one row: the [[prCurve]] threshold
    * maximizing F1 = 2·tp/(pp + n_pos), with its exact counts and the
    * half-up micro F1/precision/recall. The argmax orders by
    * (f1_micro, threshold) — micro rounding can tie neighboring
    * thresholds, and the higher threshold wins deterministically on
    * both engines. This is the "pick the classifier's cut" step after
    * [[rocAuc]]/[[prAuc]] say the scores are worth using. */
  def bestF1(df: DataFrame, score: Column, label: Column,
             partitions: Int = 32): DataFrame = {
    val curve = prCurve(df, score, label, partitions)
    // total positives = tp at the lowest threshold = max(tp)
    val tot = curve.agg(max("tp").as("__np"))
    curve.crossJoin(broadcast(tot))
      .withColumn("__den", col("pp") + col("__np"))
      .withColumn("f1_micro",
        expr("(tp * 4000000 + __den) div (__den * 2)"))
      .agg(max_by(
        struct(col("threshold"), col("tp"), col("pp"),
          col("f1_micro"), col("prec_micro"), col("rec_micro")),
        struct(col("f1_micro"), col("threshold"))).as("b"))
      // global agg over an EMPTY frame yields one all-null row; the
      // SQL ORDER BY ... LIMIT 1 equivalent yields zero — drop it so
      // an empty corpus gives an empty result on both engines (and no
      // caller NPEs reading b.threshold).
      .where(col("b").isNotNull)
      .select(col("b.threshold").as("threshold"), col("b.tp").as("tp"),
        col("b.pp").as("pp"), col("b.f1_micro").as("f1_micro"),
        col("b.prec_micro").as("prec_micro"),
        col("b.rec_micro").as("rec_micro"))
  }

  /** Reliability (calibration) bins, one row per occupied equal-width
    * score bin: (bin, n, n_pos, sum_shift, pos_rate_micro).
    * `bin = ((s − min)·bins) div (max − min + 1)` — integer-exact and
    * never out of [0, bins); `sum_shift` is the exact Σ(s − min) so a
    * caller reconstructs the bin's mean score without the op ever
    * dividing a possibly-negative sum (Spark `div` truncates toward
    * zero, DuckDB `//` likewise — agreement holds, but non-negative
    * operands make floor == trunc self-evident). One agg for min/max
    * (broadcast back), one groupBy(bin). */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
                      bins: Int): DataFrame = {
    require(bins >= 1, s"calibrationBins: need bins >= 1, got $bins")
    val base = df.select(score.cast("long").as("s"),
      when(coalesce(label.cast("boolean"), lit(false)), 1L)
        .otherwise(0L).as("__y"))
    val mm = base.agg(min("s").as("__lo"), max("s").as("__hi"))
    base.crossJoin(broadcast(mm))
      .withColumn("__shift", col("s") - col("__lo"))
      .withColumn("bin", expr(
        s"(cast(__shift as decimal(38,0)) * $bins) div (__hi - __lo + 1)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"),
           sum(col("__shift").cast(dec)).as("__ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        col("__ss").cast("long").as("sum_shift"),
        expr("(n_pos * 2000000 + n) div (n * 2)").as("pos_rate_micro"))
  }

  /** Spearman rank correlation between two score columns, one row:
    * (n, rho_micro) — the ranking-AGREEMENT statistic behind "do my
    * two quality classifiers order the corpus the same way", which
    * AUC (agreement with a binary gold) cannot answer. Average-rank
    * tie handling via the same doubled-rank trick as [[rocAuc]]
    * (a tie group at positions b+1..b+n has doubled average rank
    * 2b+n+1), ranks from the distributed prefix sum over each
    * column's distinct-value table, joined back by value — two hash
    * shuffles sized by distinct values, never a global window.
    *
    * Exactness contract: every moment sum is an exact DECIMAL(38,0);
    * the final rho applies IEEE double ops (convert, multiply, sqrt,
    * divide, half-up floor) to IDENTICAL exact integers on both
    * engines, so the micro value replays bit-for-bit while the
    * moment magnitudes stay below 2^53 (n ≲ 50k rows at doubled-rank
    * scale; beyond that the conversion rounding of the two engines'
    * decimal→double may differ in the last ulp — the q526 oracle
    * corpus stays inside the envelope). Degenerate inputs (n < 2 or
    * a constant column) yield NULL rho.
    *
    * Null handling is PAIRWISE DELETION: a row with a null x or y is
    * dropped before the rank tables are built, so the ranks and the
    * moment sums cover the identical population (ranking a value
    * against rows the moments never see would silently shift rho —
    * and Spark orders nulls first while DuckDB orders them last, so
    * the two engines would not even shift it the same way). */
  def spearmanMicro(df: DataFrame, x: Column, y: Column,
                    partitions: Int = 32): DataFrame = {
    def ranks2(rows: DataFrame, v: String, out: String): DataFrame = {
      val g = rows.groupBy(v).agg(count(lit(1)).as("n"))
      Packing.orderedCumsums(g, col(v), Seq("__nb" -> col("n")),
          partitions)
        .select(col(v), (col("__nb") * 2 + col("n") + 1).as(out))
    }
    val rows = df.select(x.cast("long").as("__x"),
      y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val j = rows
      .join(ranks2(rows, "__x", "rx2"), "__x")
      .join(ranks2(rows, "__y", "ry2"), "__y")
    j.agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("rx2").cast(dec)).as("__sx"),
        sum(col("ry2").cast(dec)).as("__sy"),
        sum((col("rx2") * col("rx2")).cast(dec)).as("__sxx"),
        sum((col("ry2") * col("ry2")).cast(dec)).as("__syy"),
        sum((col("rx2") * col("ry2")).cast(dec)).as("__sxy"))
      .withColumn("__num", col("__n") * col("__sxy") -
        col("__sx") * col("__sy"))
      .withColumn("__dx", col("__n") * col("__sxx") -
        col("__sx") * col("__sx"))
      .withColumn("__dy", col("__n") * col("__syy") -
        col("__sy") * col("__sy"))
      .select(
        col("__n").cast("long").as("n"),
        when(col("__dx") <= 0 || col("__dy") <= 0,
            lit(null).cast("long"))
          .otherwise(floor(
            col("__num").cast("double") * lit(1000000.0) /
              sqrt(col("__dx").cast("double") *
                   col("__dy").cast("double")) + lit(0.5))
            .cast("long"))
          .as("rho_micro"))
  }

  /** Doubled average rank of each distinct (g, v): a tie group at
    * positions b+1..b+n within its GROUP has doubled average rank
    * 2b+n+1. The grouped two-pass prefix sum ([[rocAucByGroup]]'s
    * shape): range-partition the distinct table on (g, v),
    * per-(partition, group) totals → per-group bases on the driver
    * (O(partitions × groups) longs, never row data), broadcast back
    * under a per-(partition, group) window — 20k groups cost the
    * same shuffle as 2. Input columns (g, v, n); output (g, v, out). */
  private def groupedRanks2(gv: DataFrame, out: String,
                            partitions: Int): DataFrame = {
    import graft.Checkpoints.CheckpointOps
    import org.apache.spark.sql.expressions.Window
    val spark = gv.sparkSession
    import spark.implicits._
    val p0 = gv.repartitionByRange(partitions, col("g"), col("v"))
      .sortWithinPartitions(col("g"), col("v"))
      .withColumn("__pid", spark_partition_id())
      .cut()
    val totals = p0.groupBy("__pid", "g").agg(sum(col("n")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val bases = totals.groupBy(_._2).iterator.flatMap {
      case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.map(_._1).zip(byPid.map(_._3).scanLeft(0L)(_ + _)).map {
          case (pid, off) => (pid, g, off) }
    }.toSeq.toDF("__pid", "g", "__base")
    val w = Window.partitionBy(col("__pid"), col("g"))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p0.join(broadcast(bases), Seq("__pid", "g"))
      .withColumn(out,
        (col("__base") + sum(col("n")).over(w) - col("n")) * 2 +
          col("n") + 1)
      .select(col("g"), col("v"), col(out))
  }

  /** Per-group [[spearmanMicro]] — one row per `group` with (g, n,
    * rho_micro): rank-ordering stability across sources/domains/
    * languages, the slice view AUC-by-group gives to a binary gold
    * applied to two CONTINUOUS scorers. Ranks are within-group
    * doubled average ranks from [[groupedRanks2]] (two grouped
    * prefix-sum passes, one per score column — no per-group window
    * over the corpus, so 20k groups cost the same shuffle as 2), the
    * moments and the final rho per group exactly as the global op —
    * same numeric envelope (per-GROUP n ≲ 50k at doubled-rank scale),
    * same pairwise deletion of null-bearing rows, same NULL rho for
    * degenerate groups. Null group keys surface as "<null>" (the
    * [[rocAucByGroup]] convention and caveat). */
  def spearmanByGroup(df: DataFrame, group: Column, x: Column,
                      y: Column, partitions: Int = 32): DataFrame = {
    val rows = df.select(
        coalesce(group.cast("string"), lit("<null>")).as("g"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def ranks(vName: String, out: String): DataFrame =
      groupedRanks2(
        rows.groupBy(col("g"), col(vName).as("v"))
          .agg(count(lit(1)).as("n")),
        out, partitions)
        .withColumnRenamed("v", vName)
    val j = rows
      .join(ranks("__x", "rx2"), Seq("g", "__x"))
      .join(ranks("__y", "ry2"), Seq("g", "__y"))
    j.groupBy("g")
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("rx2").cast(dec)).as("__sx"),
        sum(col("ry2").cast(dec)).as("__sy"),
        sum((col("rx2") * col("rx2")).cast(dec)).as("__sxx"),
        sum((col("ry2") * col("ry2")).cast(dec)).as("__syy"),
        sum((col("rx2") * col("ry2")).cast(dec)).as("__sxy"))
      .withColumn("__num", col("__n") * col("__sxy") -
        col("__sx") * col("__sy"))
      .withColumn("__dx", col("__n") * col("__sxx") -
        col("__sx") * col("__sx"))
      .withColumn("__dy", col("__n") * col("__syy") -
        col("__sy") * col("__sy"))
      .select(col("g"),
        col("__n").cast("long").as("n"),
        when(col("__dx") <= 0 || col("__dy") <= 0,
            lit(null).cast("long"))
          .otherwise(floor(
            col("__num").cast("double") * lit(1000000.0) /
              sqrt(col("__dx").cast("double") *
                   col("__dy").cast("double")) + lit(0.5))
            .cast("long"))
          .as("rho_micro"))
  }

  /** Per-group Kendall tau-b, one row per group: (g, n, concordant,
    * discordant, tau_b_micro) — the rank statistic that stays
    * meaningful in the HEAVY-TIE regime micro-quantized scores
    * create (Spearman's denominator collapses as tie mass grows;
    * tau-b corrects both margins):
    * tau_b = (C − D) / √((n0 − n1)(n0 − n2)) with n0 = n(n−1)/2,
    * n1/n2 = Σ t(t−1)/2 over x/y tie groups.
    *
    * Scale shape: concordance is counted on the distinct
    * (g, x, y) CELL table — C and D are cell-pair sums, so the
    * self-join costs O(cells² per group), not O(rows²). That is
    * exactly the heavy-tie contract: quantized/bucketed scores keep
    * cells per group small while rows grow unbounded (a
    * continuous-score caller quantizes first — the module's standing
    * convention). The join ships each group's cells once (hash on
    * g); ties and n0 come from two cell-level aggregates.
    *
    * Exactness: C, D and the tie sums are exact decimal(38,0); the
    * final tau applies the same IEEE (convert, multiply, sqrt,
    * divide, half-up floor) pipeline to identical integers on both
    * engines. NULL tau for groups with n < 2 or an all-tied margin.
    * Pairwise deletion and "<null>" group keys as [[spearmanByGroup]]. */
  def kendallTauBByGroup(df: DataFrame, group: Column, x: Column,
                         y: Column): DataFrame = {
    import graft.Checkpoints.CheckpointOps
    val rows = df.select(
        coalesce(group.cast("string"), lit("<null>")).as("g"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = rows.groupBy("g", "__x", "__y")
      .agg(count(lit(1)).as("f")).cut()
    val a = cells.select(col("g"), col("__x").as("x1"),
      col("__y").as("y1"), col("f").cast(dec).as("f1"))
    val b = cells.select(col("g").as("g2"), col("__x").as("x2"),
      col("__y").as("y2"), col("f").cast(dec).as("f2"))
    // every unordered cell pair once (x1 < x2); equal-x pairs are x
    // ties, never concordant/discordant
    val pairs = a.join(b, col("g") === col("g2") && col("x1") < col("x2"))
      .groupBy("g")
      .agg(
        sum(when(col("y1") < col("y2"), col("f1") * col("f2"))
          .otherwise(lit(0).cast(dec))).as("__c"),
        sum(when(col("y1") > col("y2"), col("f1") * col("f2"))
          .otherwise(lit(0).cast(dec))).as("__d"))
    // margins: n, n0, and the two tie corrections — all from cells
    val xt = cells.groupBy("g", "__x").agg(sum(col("f")).as("t"))
      .groupBy("g").agg(sum((col("t").cast(dec) * (col("t") - 1))
        .cast(dec)).as("__n1x2")) // 2·n1
    val yt = cells.groupBy("g", "__y").agg(sum(col("f")).as("t"))
      .groupBy("g").agg(sum((col("t").cast(dec) * (col("t") - 1))
        .cast(dec)).as("__n2x2")) // 2·n2
    val ng = cells.groupBy("g").agg(sum(col("f")).cast(dec).as("__n"))
    ng.join(xt, Seq("g")).join(yt, Seq("g"))
      .join(pairs, Seq("g"), "left")
      .na.fill(0, Seq("__c", "__d"))
      .withColumn("__n0x2", col("__n") * (col("__n") - 1)) // 2·n0
      .withColumn("__dx", col("__n0x2") - col("__n1x2"))
      .withColumn("__dy", col("__n0x2") - col("__n2x2"))
      .select(col("g"),
        col("__n").cast("long").as("n"),
        col("__c").cast("long").as("concordant"),
        col("__d").cast("long").as("discordant"),
        when(col("__dx") <= 0 || col("__dy") <= 0,
            lit(null).cast("long"))
          // (C−D)/√(dx/2 · dy/2) = 2(C−D)/√(dx·dy) on the doubled
          // margins — one less division to replicate
          .otherwise(floor(
            (col("__c") - col("__d")).cast("double") * lit(2000000.0) /
              sqrt(col("__dx").cast("double") *
                   col("__dy").cast("double")) + lit(0.5))
            .cast("long"))
          .as("tau_b_micro"))
  }
}
