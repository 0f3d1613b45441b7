package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series / event-stream operators. The batch forms below share
  * their logical shape with Structured Streaming (the tumbling window is
  * literally the same `window()` aggregation; see graft.streaming) —
  * write once, run batch or streaming. */
object Events {

  /** Tumbling-window aggregation: (window start, event_type) →
    * count + sum. Streaming-compatible (append mode with a watermark). */
  def tumbling(df: DataFrame, ts: Column, duration: String): DataFrame =
    df.groupBy(window(ts, duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** SCD-2 history build: turn a per-key stream of observed states
    * into validity intervals — each observation is valid from its own
    * timestamp until the NEXT observation of the same key (the current
    * state gets a null `valid_to`). The slowly-changing-dimension
    * pattern every warehouse keeps entity history with; one window per
    * key (`lead` over (ts, order)), one shuffle. `order` totalizes ties
    * the same way [[sessionize]]'s tieBreak does. Consecutive equal
    * states are NOT collapsed — this is the raw-observation form
    * (audit trails, sensor readings, every observation is a row);
    * [[scd2Intervals]] is the change-log sibling that collapses
    * repeats before closing versions. */
  def scd2(df: DataFrame, key: Column, ts: Column, order: Column,
           attrs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, order)
    df.filter(ts.isNotNull)
      .select((key.as("key") +: ts.as("valid_from") +: attrs) :+
        lead(ts, 1).over(w).as("valid_to"): _*)
  }

  /** OHLC resampling: per tumbling bar, the series' open (value at the
    * smallest (ts, order)), close (largest), high, low, row count, and
    * an order-independent integer-cents sum — the time-series
    * downsampling every metrics/market-data pipeline runs before
    * charting or feature extraction. ONE aggregation, no window function: open and
    * close ride `min_by`/`max_by` over the (ts, order) struct, so the
    * plan is a plain partial+final groupBy on the bar key — the same
    * map-side-combine shape as [[tumbling]], and the 100 TB path
    * (a per-bar sort would shuffle the raw series; this shuffles one
    * row per bar per map task). `order` must make (ts, order) unique
    * (an event id) or open/close are partition-dependent on ts ties.
    * Null timestamps and null values are excluded: a null has no bar
    * and no price. Returns
    * (bar_start, open, high, low, close, n, sum_cents). */
  def ohlcBars(df: DataFrame, ts: Column, order: Column, value: Column,
               barDuration: String = "1 hour"): DataFrame =
    df.filter(ts.isNotNull && value.isNotNull)
      .groupBy(window(ts, barDuration).as("w"))
      .agg(
        min_by(value, struct(ts, order)).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, struct(ts, order)).as("close"),
        count(lit(1)).as("n"),
        sum(floor(value * 100 + lit(0.5)).cast("long")).as("sum_cents"))
      .select(col("w.start").as("bar_start"), col("open"), col("high"),
              col("low"), col("close"), col("n"), col("sum_cents"))

  /** Gap-based sessionization: a new session starts when the gap from
    * the previous event of the same user exceeds `gapSeconds`. One
    * shuffle on user_id; the cumulative-sum window runs sorted within
    * each user partition. Null-timestamp events are excluded — they
    * have no position in time, and NULLS FIRST ordering would otherwise
    * count each one as its own session. */
  def sessionize(df: DataFrame, user: Column, ts: Column,
                 gapSeconds: Long,
                 tieBreak: Seq[Column] = Nil): DataFrame = {
    // tieBreak totalizes the per-user order when timestamps can
    // collide: a tie GROUP can never straddle a session boundary (the
    // gap between tied rows is 0), but the running session-id sum
    // walks rows in window order, so an id assigned mid-tie-group
    // would be engine/partitioning-dependent without a total order.
    val clash = df.columns.intersect(Seq("__new", "session_id"))
    require(clash.isEmpty,
      s"sessionize: input already has ${clash.mkString(", ")} — rename " +
      "first (the working/output columns would silently overwrite it)")
    val w = Window.partitionBy(user).orderBy(ts +: tieBreak: _*)
    val clean = df.filter(ts.isNotNull)
    val newSession =
      when(unix_timestamp(ts) - unix_timestamp(lag(ts, 1).over(w)) >
             gapSeconds, 1)
        .when(lag(ts, 1).over(w).isNull, 1)
        .otherwise(0)
    clean.withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Session path strings: each session serialized as its ordered
    * event-type sequence ("signup>view>click") — the path-mining /
    * session-replay export behind "what do users do before X", and the
    * input to any frequent-path count. Events order by (ts, event id)
    * — a TOTAL order, so tied timestamps cannot make the path string
    * partitioning-dependent (the same tiebreak feeds [[sessionize]]).
    *
    * Scale shape: sessionization's per-user window (its skew caveat —
    * and [[sessionizeBucketed]] remedy — apply), then ONE grouped
    * collect per session; the sort runs inside each session's array,
    * bounded by session length, never corpus-wide. Output:
    * (user, session_id, t0, n_events, path). */
  def sessionPaths(df: DataFrame, user: Column, ts: Column,
                   eventType: Column, eventId: Column,
                   gapSeconds: Long): DataFrame = {
    val sess = sessionize(df.filter(user.isNotNull), user, ts,
      gapSeconds, tieBreak = Seq(eventId))
    sess.groupBy(user.as("user"), col("session_id"))
      .agg(min(ts).as("t0"), count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(ts.as("t"), eventId.as("e"),
              eventType.as("et")))),
            x => x.getField("et")), ">").as("path"))
  }

  /** Per-user session stats from [[sessionize]]. */
  def sessionStats(df: DataFrame, user: Column, ts: Column,
                   gapSeconds: Long): DataFrame =
    sessionize(df, user, ts, gapSeconds)
      .groupBy(user.as("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
           count(lit(1)).as("n_events"))

  /** Skew-resistant [[sessionize]]: identical session ids, but every
    * event-proportional window partitions on (user, coarse time bucket)
    * so one power-law user spreads over its buckets instead of
    * serializing into a single straggler task. The only per-user-alone
    * windows run over BUCKET SUMMARIES (rows ~ active buckets, bounded
    * by time range / `bucketSeconds` — never by event count).
    *
    * Stitching: the first event of a bucket takes its previous-event
    * time from the prior non-empty bucket's max (a lag over summaries);
    * session ids add a within-bucket running count of session starts to
    * the total starts of all earlier buckets (a prefix sum over
    * summaries). */
  def sessionizeBucketed(df: DataFrame, user: Column, ts: Column,
                         gapSeconds: Long, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val reserved = Seq("__sec", "__b", "__u", "__b2", "__prevmax", "__new",
      "__u2", "__b3", "__bnews", "__off", "__sin", "session_id")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"sessionizeBucketed: input already has reserved working column(s) " +
      s"${clash.mkString(", ")} — rename them first (withColumn would " +
      "silently overwrite and the re-select would return internal state)")
    val outCols = df.columns.toSeq
    val clean = df.filter(ts.isNotNull)
    val e = clean.withColumn("__sec", unix_timestamp(ts))
      .withColumn("__b", floor(col("__sec") / bucketSeconds))
    val wIn = Window.partitionBy(user, col("__b")).orderBy(ts)

    // previous-event time across bucket boundaries: per-user lag over
    // (user, bucket, maxTs) summaries
    val sums = e.groupBy(user.as("__u"), col("__b").as("__b2"))
      .agg(max(col("__sec")).as("__bmax"))
    val wB = Window.partitionBy(col("__u")).orderBy(col("__b2"))
    val prevMax = sums
      .withColumn("__prevmax", lag(col("__bmax"), 1).over(wB))
      .drop("__bmax")
    val j = e.join(prevMax,
      user <=> col("__u") && col("__b") <=> col("__b2"), "left")

    val prevSec = coalesce(lag(col("__sec"), 1).over(wIn), col("__prevmax"))
    val e2 = j.withColumn("__new",
      when(prevSec.isNull, 1)
        .when(col("__sec") - prevSec > gapSeconds, 1)
        .otherwise(0))

    // session id = within-bucket running starts + starts in earlier
    // buckets (prefix sum over summaries)
    val newCnt = e2.groupBy(user.as("__u2"), col("__b").as("__b3"))
      .agg(sum(col("__new")).as("__bnews"))
    val wB2 = Window.partitionBy(col("__u2")).orderBy(col("__b3"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = newCnt
      .withColumn("__off", coalesce(sum(col("__bnews")).over(wB2), lit(0L)))
      .drop("__bnews")
    e2.withColumn("__sin",
        sum(col("__new")).over(wIn.rowsBetween(Window.unboundedPreceding, 0)))
      .join(offs, user <=> col("__u2") && col("__b") <=> col("__b3"), "left")
      .withColumn("session_id", col("__sin") + col("__off"))
      .select(outCols.map(col) :+ col("session_id"): _*)
  }

  /** Per-user session stats from [[sessionizeBucketed]] — q31's exact
    * output shape on the skew-resistant path. */
  def sessionStatsBucketed(df: DataFrame, user: Column, ts: Column,
                           gapSeconds: Long, bucketSeconds: Long): DataFrame =
    sessionizeBucketed(df, user, ts, gapSeconds, bucketSeconds)
      .groupBy(user.as("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
           count(lit(1)).as("n_events"))

  /** Sequential conversion funnel: per user, the earliest timestamp of
    * stage 1, then the earliest stage-2 event STRICTLY AFTER it, and so
    * on — the standard product-analytics "signup → view → click →
    * purchase" question, where naive per-stage minima overcount (a
    * purchase BEFORE the signup must not complete the funnel). Output
    * is one row per user who completed stage 1, with `t1..tk`
    * timestamps, null from the first uncompleted stage onward (nulls
    * propagate: a null t_i makes every later stage null by comparison
    * semantics, no special-casing).
    *
    * Scale shape: stage i is one user-keyed left join of the current
    * funnel frame (users-completing-stage-1-sized, shrinking) against
    * only that stage's events (filter pushed to the scan) followed by
    * a partial-aggregating min — k-1 equi-joins on the same user key,
    * which AQE plans broadcast once the funnel frame shrinks below the
    * threshold. No window over all events, no per-user sort. Null
    * timestamps are excluded up front (an event with no position in
    * time can neither start nor advance a funnel). */
  def funnel(df: DataFrame, user: Column, ts: Column, eventType: Column,
             stages: Seq[String],
             withinSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct (a repeated stage name would " +
      "match the same events twice)")
    require(withinSeconds.forall(_ > 0), "withinSeconds must be positive")
    val clean = df.filter(ts.isNotNull)
    var cur = clean.filter(eventType === stages.head)
      .groupBy(user.as("user_id")).agg(min(ts).as("t1"))
    for (i <- 1 until stages.size) {
      val evs = clean.filter(eventType === stages(i))
        .select(user.as("user_id"), ts.as("__ts"))
      val keys = col("user_id") +: (1 to i).map(j => col(s"t$j"))
      // strictly after the previous stage; with a conversion window,
      // also within `withinSeconds` OF THAT STAGE (per-step bound —
      // the common product-analytics definition)
      val ok = withinSeconds.foldLeft(col("__ts") > col(s"t$i")) {
        (c, sec) => c && unix_timestamp(col("__ts")) -
          unix_timestamp(col(s"t$i")) <= sec
      }
      cur = cur.join(evs, Seq("user_id"), "left")
        .groupBy(keys: _*)
        .agg(min(when(ok, col("__ts"))).as(s"t${i + 1}"))
    }
    cur
  }

  /** Recency-decayed activity score: each event inside the
    * `horizonDays` lookback contributes 2^(horizon - age_days), so
    * today's events weigh 2^horizon and weights halve per day of age —
    * the standard churn/engagement ranking signal, here EXACTLY
    * integer (the decay table is a literal array of longs indexed by
    * age; no pow(), whose rounding differs across engines). Score =
    * Σ weights is an order-independent integer sum — mergeable,
    * partition-proof, oracle-replayable.
    *
    * Scale shape: one corpus aggregate keyed by user with map-side
    * partials; the corpus max-day anchor is a 1-row broadcast. Events
    * older than the horizon (or with null time) contribute nothing but
    * still count toward n_total. Output:
    * (user, score, n_recent, n_total). */
  def decayedActivity(df: DataFrame, user: Column, ts: Column,
                      horizonDays: Int = 30): DataFrame = {
    require(horizonDays >= 0 && horizonDays <= 62,
      s"horizonDays must be in [0, 62] (2^h must fit a long), " +
      s"got $horizonDays")
    val weights = typedlit((0 to horizonDays)
      .map(age => 1L << (horizonDays - age)))
    val anchor = df.filter(ts.isNotNull)
      .agg(max(to_date(ts)).as("d_max"))
    df.filter(user.isNotNull)
      .select(user.as("user"), to_date(ts).as("day"))
      .crossJoin(broadcast(anchor))
      .withColumn("__age", datediff(col("d_max"), col("day")))
      .withColumn("__w",
        when(col("__age").isNotNull && col("__age") >= 0 &&
             col("__age") <= horizonDays,
          element_at(weights, col("__age") + 1)).otherwise(0L))
      .groupBy("user")
      .agg(sum(col("__w")).as("score"),
           sum(when(col("__w") > 0L, 1L).otherwise(0L)).as("n_recent"),
           count(lit(1)).as("n_total"))
  }

  /** Gaps-and-islands over activity days: each user's maximal runs of
    * CONSECUTIVE active days (an island breaks at the first missing
    * day). The classic streak/churn primitive — "how long do users
    * stay active", "find coverage holes in a feed" — and the canonical
    * day-minus-row_number grouping trick, here run distributed.
    *
    * Scale shape: events collapse to the distinct (user, day) frame
    * first (one corpus shuffle with map-side partials — the window
    * never sees raw events); the row_number window then orders each
    * user's DAYS (bounded by the calendar span, thousands at most, so
    * per-user skew is structurally capped no matter how hot the user's
    * event stream is). `day - row_number` is constant within a
    * consecutive run and strictly drops at every gap, so grouping by
    * it yields the islands. Output:
    * (user, island_start, island_end, n_days). */
  def activityIslands(df: DataFrame, user: Column, ts: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.filter(user.isNotNull && ts.isNotNull)
      .select(user.as("user"), to_date(ts).as("day")).distinct()
    val w = Window.partitionBy(col("user")).orderBy(col("day"))
    days.withColumn("__grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user"), col("__grp"))
      .agg(min(col("day")).as("island_start"),
           max(col("day")).as("island_end"),
           count(lit(1)).as("n_days"))
      .drop("__grp")
  }

  /** Dense hourly series with explicit zeros: per-key hourly event
    * counts over the corpus-wide [min, max] hour span, absent
    * (key, hour) cells filled with 0 — downstream rate/anomaly math
    * needs aligned series, and "no data" must be distinguishable from
    * "not scanned". The sparse→dense step every monitoring pipeline
    * runs after a raw event count.
    *
    * Scale shape: events reduce to the sparse (key, hour) count frame
    * first (ONE corpus shuffle with map-side partials); the dense grid
    * is distinct-keys × hour-spine — both tiny derived frames (the
    * spine is span-hours rows from a 2-row aggregate; keys are the
    * stratum cardinality), so the fill join is broadcast-sized and the
    * corpus is never touched again. Null keys/timestamps drop (they
    * have no cell). Output: (key, h, n). */
  def gapFillHourly(df: DataFrame, key: Column, ts: Column): DataFrame = {
    val base = df.filter(ts.isNotNull && key.isNotNull)
      .select(key.as("key"), date_trunc("hour", ts).as("h"))
    val counts = base.groupBy("key", "h").agg(count(lit(1)).as("n"))
    val spine = base.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .filter(col("h0").isNotNull)
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    counts.select("key").distinct()
      .crossJoin(broadcast(spine))
      .join(counts, Seq("key", "h"), "left")
      .select(col("key"), col("h"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Shared touch→conversion attachment for the attribution family
    * ([[linearAttribution]], [[positionAttribution]]): second-truncated
    * events, touches of the allowed types, conversion representatives
    * (min event id per (user, second)), forward as-of attach of the
    * NEXT conversion, window gate. Returns (user_id, t, et, eid,
    * conv_t, conv_id) with conv_id null when unattributed — the one
    * place the gate/representative rules live. */
  private def touchConversionFrame(df: DataFrame, user: Column,
                                   ts: Column, eventType: Column,
                                   eventId: Column,
                                   touchTypes: Seq[String],
                                   convType: String,
                                   withinSeconds: Long): DataFrame = {
    val base = df.filter(ts.isNotNull && user.isNotNull)
      .select(user.as("user_id"), unix_timestamp(ts).as("t"),
              eventType.as("et"), eventId.as("eid"))
    val touches = base.filter(col("et").isin(touchTypes: _*))
      .select(col("user_id"), col("t"), col("et"), col("eid"))
    val convs = base.filter(col("et") === convType)
      .groupBy(col("user_id"), col("t"))
      .agg(min(col("eid")).as("c_id"))
      .select(col("user_id"), col("t").as("c_t"), col("c_id"))
    Relational.asofJoinForward(touches, convs,
        key = "user_id", leftTime = "t", rightTime = "c_t",
        payload = Map("c_t" -> "conv_t", "c_id" -> "conv_id"))
      .withColumn("conv_id",
        when(col("conv_t") - col("t") <= withinSeconds, col("conv_id")))
  }

  /** Multi-touch LINEAR attribution — [[lastTouchAttribution]]'s
    * complement: a conversion's credit splits EQUALLY across all its
    * touches within the window (the marketing model that values the
    * whole path, not just the closer). Each touch credits the NEXT
    * conversion at-or-after it via the forward as-of join — one
    * shuffle, no (touch × conversion) range explosion — gated by
    * `withinSeconds`; per-conversion touch counts then split 1e6
    * micro-credits integer-exactly (floor division — the ≤ n−1 ppm
    * remainder stays unassigned rather than tie-breaking, so sums
    * are deterministic and engine-portable). Conversions pre-reduce
    * to one representative per (user, second) (min event id): two
    * same-second conversions pool their path's credit onto the
    * representative — deterministic, documented. Times truncate to
    * epoch seconds (the [[funnel]] parity rule).
    *
    * Returns per-channel totals: (touch_type, n_touches,
    * n_attributed, credit_ppm). */
  def linearAttribution(df: DataFrame, user: Column, ts: Column,
                        eventType: Column, eventId: Column,
                        touchTypes: Seq[String], convType: String,
                        withinSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "linearAttribution: no touch types")
    require(withinSeconds >= 0,
      s"linearAttribution: negative window $withinSeconds")
    val fwd = touchConversionFrame(df, user, ts, eventType, eventId,
      touchTypes, convType, withinSeconds)
    val perConv = fwd.filter(col("conv_id").isNotNull)
      .groupBy("conv_id").agg(count(lit(1)).as("n"))
    // no broadcast hint: perConv is conversion-cardinality-sized —
    // AQE broadcasts when it is actually small
    fwd
      .join(perConv, Seq("conv_id"), "left")
      .groupBy(col("et").as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
           count(col("n")).as("n_attributed"),
           coalesce(sum(when(col("n").isNotNull,
             expr("1000000 div n"))), lit(0L)).as("credit_ppm"))
  }

  /** Position-based ("U-shaped") attribution — the third member of
    * the family ([[lastTouchAttribution]], [[linearAttribution]]):
    * the FIRST touch gets 40%, the LAST 40%, the middles share the
    * remaining 20% equally (the discover/close weighting). Integer
    * micro-credits with the same floor discipline: single-touch paths
    * take the whole 1e6; two-touch paths split 500000/500000; n ≥ 3
    * gives 400000/400000 and 200000 div (n−2) per middle (the ≤ n−3
    * ppm remainder stays unassigned). Same forward-as-of skeleton and
    * same determinism rules as [[linearAttribution]] (conversion
    * representative per (user, second) = min event id; touch
    * positions ordered by (time, event id)).
    *
    * Returns per-channel totals: (touch_type, n_touches,
    * n_attributed, credit_ppm). */
  def positionAttribution(df: DataFrame, user: Column, ts: Column,
                          eventType: Column, eventId: Column,
                          touchTypes: Seq[String], convType: String,
                          withinSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "positionAttribution: no touch types")
    require(withinSeconds >= 0,
      s"positionAttribution: negative window $withinSeconds")
    val fwd = touchConversionFrame(df, user, ts, eventType, eventId,
      touchTypes, convType, withinSeconds)
    // per-conversion path shape: touch count + the (time, id)-first
    // and -last touches, one struct-min/max aggregate (no window)
    val pos = struct(col("t"), col("eid"))
    val perConv = fwd.filter(col("conv_id").isNotNull)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n"),
           min(pos).as("first_p"), max(pos).as("last_p"))
    val credit =
      when(col("n") === 1, lit(1000000L))
        .when(col("n") === 2, lit(500000L))
        .when(pos === col("first_p") || pos === col("last_p"),
          lit(400000L))
        .otherwise(expr("200000 div (n - 2)"))
    fwd
      .join(perConv, Seq("conv_id"), "left")
      .groupBy(col("et").as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
           count(col("n")).as("n_attributed"),
           coalesce(sum(when(col("n").isNotNull, credit)), lit(0L))
             .as("credit_ppm"))
  }

  /** Last-touch attribution: each conversion event credits the most
    * recent touch event (same user, touch time <= conversion time, ASOF
    * semantics) of an allowed touch type, provided it happened within
    * `withinSeconds`; stale or absent touches attribute null. The
    * standard marketing/product-analytics credit assignment, and the
    * same shape as "which crawl snapshot produced this document".
    *
    * Scale shape: rides [[Relational.asofJoinBackward]] — one shuffle
    * on the user key, no per-pair range explosion. Touches pre-reduce
    * to one row per (user, ts) keeping the max event id (struct-max,
    * map-side partials), which makes the at-equal-time winner — and
    * therefore the whole result — deterministic; conversion ties at one
    * timestamp each independently take the same carried payload.
    * Freshness truncates both sides to epoch seconds (the [[funnel]]
    * parity rule). Output: (conv_id, user_id, conv_ts, touch_id,
    * touch_type, touch_ts). */
  def lastTouchAttribution(df: DataFrame, user: Column, ts: Column,
                           eventType: Column, eventId: Column,
                           touchTypes: Seq[String], convType: String,
                           withinSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType),
      s"conversion type '$convType' cannot also be a touch type — a " +
      "conversion would attribute to itself")
    require(withinSeconds > 0, "withinSeconds must be positive")
    val conv = df.filter(eventType === convType && ts.isNotNull)
      .select(eventId.as("conv_id"), user.as("user_id"),
              ts.as("conv_ts"))
    val touches = df
      .filter(eventType.isin(touchTypes: _*) && ts.isNotNull)
      .groupBy(user.as("user_id"), ts.as("touch_ts"))
      .agg(max(struct(eventId.as("touch_id"),
                      eventType.as("touch_type"))).as("__p"))
      .select(col("user_id"), col("touch_ts"),
              col("__p.touch_id").as("touch_id"),
              col("__p.touch_type").as("touch_type"))
    val j = Relational.asofJoinBackward(conv, touches,
      "user_id", "conv_ts", "touch_ts",
      Map("touch_id" -> "touch_id", "touch_type" -> "touch_type",
          "touch_ts" -> "touch_ts"))
    val fresh = col("touch_ts").isNotNull &&
      unix_timestamp(col("conv_ts")) - unix_timestamp(col("touch_ts")) <=
        withinSeconds
    j.select(col("conv_id"), col("user_id"), col("conv_ts"),
      when(fresh, col("touch_id")).as("touch_id"),
      when(fresh, col("touch_type")).as("touch_type"),
      when(fresh, col("touch_ts")).as("touch_ts"))
  }

  /** Per-user event-type transition counts — the Markov matrix behind
    * path analysis ("what do users do after an error?"). One window
    * shuffle on the user key, identical shape to [[sessionize]] (and
    * with the same skew remedy available: a power-law user serializes
    * its partition, so pre-bucket by coarse time exactly as
    * [[sessionizeBucketed]] does if that ever dominates). Ties on a
    * user's timestamp are broken by `order` (must make the per-user
    * order total, e.g. an event id) so the lag is deterministic; the
    * first event of each user has no predecessor and contributes no
    * transition. Null timestamps are excluded (no position in time). */
  def eventTransitions(df: DataFrame, user: Column, ts: Column,
                       eventType: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, order)
    df.filter(ts.isNotNull)
      .select(user.as("user_id"), eventType.as("to_type"),
        lag(eventType, 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Rolling active users (DAU / trailing-WAU "stickiness"): for every
    * day in the span, how many distinct users were active that day and
    * within the trailing `windowDays` — the product-health curve, and
    * a DISTINCT-over-range aggregate no plain window frame computes
    * (count(distinct) over a moving range isn't decomposable; the
    * correct distributed shape is below).
    *
    * Scale shape: events collapse to the distinct (user, day) frame
    * (one corpus shuffle); each activity day then emits its
    * `windowDays` covering days (a bounded explode of the SMALL
    * frame), and the per-(cover day, user) distinct + count is a
    * day-keyed aggregate — cost is active-days × window, never
    * events × window. The day spine rides from a 2-row aggregate so
    * gap days report zeros. Output: (day, dau, wau,
    * stickiness_permille). */
  def rollingActiveUsers(df: DataFrame, user: Column, ts: Column,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val act = df.filter(user.isNotNull && ts.isNotNull)
      .select(user.as("u"), to_date(ts).as("d")).distinct()
      .cut() // dau + the cover explode both consume it
    val dau = act.groupBy("d").agg(count(lit(1)).as("dau"))
    val cover = act.select(col("u"),
        explode(sequence(col("d"),
          date_add(col("d"), windowDays - 1))).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    val spine = act.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .filter(col("d0").isNotNull)
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    spine.join(dau, Seq("d"), "left").join(cover, Seq("d"), "left")
      .select(col("d").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .withColumn("stickiness_permille",
        when(col("wau") === 0L, 0L)
          .otherwise(expr("(1000 * dau) div wau")))
  }

  /** Kaplan-Meier survival (single-event, right-censored): for the
    * signup→purchase delay, the estimated probability of still being
    * "unconverted" after t days. Users who never convert are censored
    * at the observation horizon (the corpus max day). Standard
    * estimator S(t) = Π over event days <= t of (1 − d_i/n_i),
    * carried in LOG space as a cumulative integer sum of per-day
    * quantized ln(1 − d/n) terms (the [[graft.ops.Checks
    * .mixtureEntropy]] discipline — a float product would be
    * order-dependent), so the curve is bit-reproducible; consumers
    * exp() it for display. Days where every at-risk subject converts
    * (survival hits 0) end the curve.
    *
    * Scale shape: users reduce to one (entry, delay, converted) row
    * each; the life table is a DAY-keyed aggregate (at-risk counts
    * derive from total minus cumulative exits via one prefix window
    * over the day frame, which is span-bounded, not user-bounded).
    * Output: (t_days, n_risk, n_events, n_censored, ln_surv_fp). */
  def survivalCurve(df: DataFrame, user: Column, ts: Column,
                    eventType: Column, startType: String,
                    endType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = df.filter(ts.isNotNull)
    val starts = clean.filter(eventType === startType)
      .groupBy(user.as("u")).agg(min(to_date(ts)).as("t0"))
    val ends = clean.filter(eventType === endType)
      .select(user.as("u"), to_date(ts).as("te"))
    val horizon = clean.agg(max(to_date(ts)).as("h"))
    val subjects = starts
      .join(ends.groupBy("u").agg(min(col("te")).as("te")), Seq("u"),
            "left")
      .crossJoin(broadcast(horizon))
      // conversion = the subject's FIRST-EVER end event, provided it
      // is at/after the start; a first end before the start censors
      // (simple, deterministic convention — mirrored by the oracle)
      .withColumn("conv",
        col("te").isNotNull && col("te") >= col("t0"))
      .withColumn("t",
        when(col("conv"), datediff(col("te"), col("t0")))
          .otherwise(datediff(col("h"), col("t0"))).cast("long"))
    val total = subjects.agg(count(lit(1)).as("n_total"))
    val days = subjects.groupBy(col("t").as("t_days"))
      .agg(sum(when(col("conv"), 1L).otherwise(0L)).as("n_events"),
           sum(when(col("conv"), 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    days.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(
          sum(col("n_events") + col("n_censored")).over(w), lit(0L)))
      .withColumn("__term",
        when(col("n_events") === 0L, 0L)
          // every at-risk subject converting makes ln(0) = -inf; emit
          // a documented floor sentinel (curve has ended) instead of
          // a NaN-poisoned cumulative sum
          .when(col("n_events") >= col("n_risk"), lit(-99000000L))
          .otherwise(floor(
            log(lit(1.0) - col("n_events").cast("double") /
                col("n_risk").cast("double")) * lit(1000000.0) +
            lit(0.5)).cast("long")))
      .withColumn("ln_surv_fp",
        sum(col("__term")).over(Window.orderBy(col("t_days"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("t_days"), col("n_risk"), col("n_events"),
              col("n_censored"), col("ln_surv_fp"))
  }

  /** Session association rules: support/confidence/lift for ordered
    * event-type pairs co-occurring in one session (sessions are the
    * baskets, types the items — the market-basket analysis of "users
    * who hit errors also purchase?"). Counts are over DISTINCT
    * (session, type) — a burst of repeats is one basket membership.
    * lift = P(ab)/(P(a)P(b)) as integer cross products in one shared
    * float expression (micro units); confidence in exact permille,
    * directional (a→b uses n_a).
    *
    * Scale shape: sessionization (its skew remedies apply), one
    * distinct to basket membership, per-type counts, and the
    * pair self-join INSIDE each session key — pair fan bounded by
    * (types per session)², never corpus². Output:
    * (a, b, n_ab, conf_ab_permille, lift_fp) for a < b. */
  def sessionAssociations(df: DataFrame, user: Column, ts: Column,
                          eventType: Column, eventId: Column,
                          gapSeconds: Long,
                          minSupport: Long = 5L): DataFrame = {
    val sess = sessionize(df.filter(user.isNotNull), user, ts,
        gapSeconds, tieBreak = Seq(eventId))
      .select(user.as("u"), col("session_id").as("sid"),
              eventType.as("t"))
      .distinct()
      .cut() // item counts + both join sides consume it
    val nSess = sess.select("u", "sid").distinct()
      .agg(count(lit(1)).as("ns"))
    val items = sess.groupBy("t").agg(count(lit(1)).as("n"))
    val pairs = sess.select(col("u"), col("sid"), col("t").as("a"))
      .join(sess.select(col("u"), col("sid"), col("t").as("b")),
            Seq("u", "sid"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    def d(c: Column) = c.cast("double")
    pairs
      .join(items.select(col("t").as("a"), col("n").as("n_a")), "a")
      .join(items.select(col("t").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(nSess))
      .select(col("a"), col("b"), col("n_ab"),
        expr("(1000 * n_ab) div n_a").as("conf_ab_permille"),
        floor(d(col("n_ab")) * d(col("ns")) /
              (d(col("n_a")) * d(col("n_b"))) * lit(1000000.0) +
              lit(0.5)).cast("long").as("lift_fp"))
  }

  /** Markov next-event accuracy: train the order-1 transition model
    * ([[eventTransitions]]) and score it on the SAME stream — for each
    * source state, the argmax next event (ties to the smallest type,
    * the [[Relational.modePerGroup]] rule) and the fraction of real
    * transitions it gets right. The in-engine eval loop for "is
    * last-event a useful predictor", and the baseline every sequence
    * model must beat before it earns a deployment.
    *
    * Scale shape: one lag window for the pair stream (per-user,
    * [[sessionizeBucketed]]'s skew remedy applies), two state-type²
    * aggregates for the model, then ONE broadcast model join back
    * over the pairs with a conditional-sum accuracy aggregate. All
    * integer counts. Output:
    * (from_type, predicted, n_pairs, n_correct, acc_permille). */
  def markovAccuracy(df: DataFrame, user: Column, ts: Column,
                     eventType: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, order)
    val pairs = df.filter(ts.isNotNull)
      .select(eventType.as("to_type"),
        lag(eventType, 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
    val trans = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val best = trans.groupBy("from_type").agg(max("n").as("n"))
    val model = trans.join(best, Seq("from_type", "n"))
      .groupBy("from_type").agg(min("to_type").as("predicted"))
    pairs.join(broadcast(model), "from_type")
      .groupBy("from_type", "predicted")
      .agg(count(lit(1)).as("n_pairs"),
           sum(when(col("to_type") === col("predicted"), 1L)
             .otherwise(0L)).as("n_correct"))
      .withColumn("acc_permille",
        expr("(1000 * n_correct) div n_pairs"))
  }

  /** Cohort retention matrix: users grouped by the day of their FIRST
    * event (their cohort), counted by how many are active on each
    * later day-offset — the analytics table behind every retention
    * curve. Two shuffles: the per-user first-day aggregate and the
    * (cohort, offset) count over the DISTINCT (user, day) activity
    * frame (distinct first, so a burst of same-day events counts one
    * active user once). The activity-to-cohort join is user-keyed;
    * the cohort frame is user-sized and AQE-broadcast when small. */
  def retentionCohorts(df: DataFrame, user: Column, ts: Column)
      : DataFrame = {
    val clean = df.filter(ts.isNotNull)
    val cohort = clean.groupBy(user.as("user_id"))
      .agg(date_trunc("DAY", min(ts)).as("cohort_day"))
    val activity = clean
      .select(user.as("user_id"), date_trunc("DAY", ts).as("day"))
      .distinct()
    activity.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Slowly-changing-dimension (type 2) interval build from a change
    * log: per key, collapse consecutive repeats of `attr` (ordered by
    * `ts`, ties by `tiebreak`) to their first occurrence, then close
    * each surviving version with the next version's start —
    * half-open validity [eff_from, eff_to), open (null) interval =
    * current. Null-safe change detection (`<=>`): a null attr value is
    * a version like any other; null timestamps are excluded (no
    * position in time). One shuffle on the key; both windows run
    * sorted inside the same user partition (Spark plans a single
    * sort). At 100 TB the change log is the big side and this is its
    * only shuffle — the classic dimension-build step of an
    * incremental warehouse load.
    *
    * Returns (key, attr, eff_from, eff_to, is_current). */
  def scd2Intervals(df: DataFrame, key: Column, ts: Column, attr: Column,
                    tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("eff_from"), col("__tb"))
    df.filter(ts.isNotNull)
      .select(key.as("__k"), ts.as("eff_from"), attr.as("attr"),
              tiebreak.as("__tb"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .filter(col("__rn") === 1 || !(col("attr") <=> col("__prev")))
      .withColumn("eff_to", lead(col("eff_from"), 1).over(w))
      .select(col("__k").as("key"), col("attr"), col("eff_from"),
              col("eff_to"), col("eff_to").isNull.as("is_current"))
  }

  /** Forward fill (LOCF — last observation carried forward): per key,
    * each null in `valueCols` takes the most recent non-null value of
    * the same column at or before it in (ts, order); leading nulls
    * (nothing to carry) stay null. The gap-repair step every sensor /
    * metrics / feature pipeline runs before resampling or training.
    * All columns fill over ONE window spec, so Catalyst plans a single
    * shuffle + sort regardless of how many columns fill. `order` must
    * totalize ts ties (an event id) or the carried value at a tie is
    * partition-dependent. Null timestamps are excluded — they have no
    * position to carry from or to. */
  def forwardFill(df: DataFrame, key: Column, ts: Column, order: Column,
                  valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, order)
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols.foldLeft(df.filter(ts.isNotNull)) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Skew-resistant [[forwardFill]] (single column): identical output,
    * but the event-proportional window partitions on (key, coarse time
    * bucket) so one power-law key spreads over its buckets instead of
    * serializing into a single straggler sort — the same stitching
    * discipline as [[sessionizeBucketed]]. The carry INTO a bucket is
    * the latest non-null value of any earlier bucket, computed from
    * per-bucket summaries (rows ~ active buckets, bounded by
    * time range / `bucketSeconds`, never by event count). */
  def forwardFillBucketed(df: DataFrame, key: Column, ts: Column,
                          order: Column, valueCol: String,
                          bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val reserved = Seq("__b", "__u", "__b2", "__carry", "__bl")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"forwardFillBucketed: input already has reserved working " +
      s"column(s) ${clash.mkString(", ")} — rename them first")
    val outCols = df.columns.toSeq
    val e = df.filter(ts.isNotNull)
      .withColumn("__b", floor(unix_timestamp(ts) / bucketSeconds))
    val wIn = Window.partitionBy(key, col("__b")).orderBy(ts, order)
      .rowsBetween(Window.unboundedPreceding, 0)
    // per (key, bucket): the bucket's LAST non-null value. EVERY bucket
    // with events must appear (an all-null bucket still needs the carry
    // to flow INTO it), so the frame is grouped over all rows and the
    // null-valued ones drop out inside the aggregate: max over a
    // struct ordered by (ts, order) ignores the nulls the `when` plants.
    val sums = e
      .groupBy(key.as("__u"), col("__b").as("__b2"))
      .agg(max(when(col(valueCol).isNotNull,
             struct(ts.as("__t"), order.as("__o"),
                    col(valueCol).as("__v")))).as("__s"))
      .withColumn("__bl", col("__s.__v")).drop("__s")
    // carry into bucket b = latest earlier bucket's last value (summary
    // rows only; strictly-before frame keeps the bucket's own values out)
    val wB = Window.partitionBy(col("__u")).orderBy(col("__b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = sums
      .withColumn("__carry", last(col("__bl"), ignoreNulls = true).over(wB))
      .drop("__bl")
    e.join(carries, key <=> col("__u") && col("__b") <=> col("__b2"), "left")
      .withColumn(valueCol,
        coalesce(last(col(valueCol), ignoreNulls = true).over(wIn),
                 col("__carry")))
      .select(outCols.map(col): _*)
  }

  /** Exponentially weighted moving average, final value per key:
    * e_i = (1 − α)·e_{i−1} + α·x_i over the (ts, order)-sorted series
    * with e_0 = 0 (the pure zero-init recurrence — every step is the
    * same affine map, which is what lets the chunked form below
    * compose), α = alphaNum/alphaDen evaluated in double precision.
    * The recency-weighted feature every engagement / rate-limiter /
    * monitoring pipeline keeps per entity.
    *
    * The fold runs IN-ROW over the key's collected, sorted series —
    * a deterministic left fold, so the float result is bit-stable
    * across partitionings and replayable by a sequential oracle. One
    * shuffle (the groupBy); per-key state is the key's event array —
    * the exact form's documented bound. For power-law keys at 100 TB
    * use [[ewmaChunked]], whose per-task state is one time bucket.
    * Null ts/values are excluded. Returns (key, n_events, ewma). */
  def ewmaFinal(df: DataFrame, key: Column, ts: Column, order: Column,
                value: Column, alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"ewmaFinal: need 0 < alphaNum <= alphaDen, got $alphaNum/$alphaDen")
    df.filter(ts.isNotNull && value.isNotNull)
      .groupBy(key.as("key"))
      .agg(sort_array(collect_list(struct(ts.as("t"), order.as("o"),
             value.cast("double").as("v")))).as("__xs"))
      .withColumn("ewma", expr(
        s"""round(aggregate(__xs, CAST(0 AS DOUBLE),
           (acc, x) -> acc * (1 - CAST($alphaNum AS DOUBLE) / $alphaDen)
                       + x.v * (CAST($alphaNum AS DOUBLE) / $alphaDen)),
           6)"""))
      .select(col("key"), size(col("__xs")).cast("long").as("n_events"),
              col("ewma"))
  }

  /** Scale form of [[ewmaFinal]]: per (key, time bucket) the zero-init
    * fold is the affine map out = d·in + c with d = (1−α)^n (folded, not
    * pow) and c the bucket's own zero-init EWMA — so buckets compose by
    * folding (d, c) summaries in bucket order: e = d_b·e + c_b. Level 1
    * is a groupBy whose per-task state is ONE bucket's slice of one key;
    * level 2 folds O(active buckets) summary rows per key (bounded by
    * time range / bucketSeconds, never event count). Float caveat: the
    * two-level fold associates differently from the exact sequential
    * fold — results agree to ~1e-12 relative, not bit-exactly
    * (spec-pinned); the exact form stays the oracle surface. */
  def ewmaChunked(df: DataFrame, key: Column, ts: Column, order: Column,
                  value: Column, alphaNum: Int, alphaDen: Int,
                  bucketSeconds: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"ewmaChunked: need 0 < alphaNum <= alphaDen, got $alphaNum/$alphaDen")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val a = s"(CAST($alphaNum AS DOUBLE) / $alphaDen)"
    val fold = s"(acc, x) -> acc * (1 - $a) + x.v * $a"
    df.filter(ts.isNotNull && value.isNotNull)
      .withColumn("__b", floor(unix_timestamp(ts) / bucketSeconds))
      .groupBy(key.as("key"), col("__b"))
      .agg(sort_array(collect_list(struct(ts.as("t"), order.as("o"),
             value.cast("double").as("v")))).as("__xs"))
      .withColumn("__c", expr(
        s"aggregate(__xs, CAST(0 AS DOUBLE), $fold)"))
      // d = (1-α)^n by the same repeated multiply as the fold (pow()
      // rounds differently; staying with the fold's own product keeps
      // the chunk map exactly the fold's affine coefficients)
      .withColumn("__d", expr(
        s"aggregate(__xs, CAST(1 AS DOUBLE), (acc, x) -> acc * (1 - $a))"))
      .withColumn("__n", size(col("__xs")).cast("long"))
      .drop("__xs")
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("__b").as("b"),
             col("__d").as("d"), col("__c").as("c"),
             col("__n").as("n")))).as("__bs"))
      .withColumn("ewma", expr(
        """round(aggregate(__bs, CAST(0 AS DOUBLE),
           (acc, x) -> x.d * acc + x.c), 6)"""))
      .select(col("key"), expr("aggregate(__bs, 0L, (acc, x) -> acc + x.n)")
                .as("n_events"), col("ewma"))
  }

  /** Token-bucket rate-limiter replay (audit form): per key, walk the
    * (ts, order)-sorted events through a bucket that starts FULL at the
    * first event, refills `refillPerSec` micro-tokens per elapsed
    * second (clamped at `capacity`), and admits an event iff the
    * refilled level covers `cost`. The capacity-planning / abuse-audit
    * question — "which traffic WOULD this limit throttle" — answered
    * in-engine before the limit ships.
    *
    * The clamp makes the recurrence non-affine (no chunked composition
    * like [[ewmaChunked]]; a chunk's throttle COUNT as a function of
    * entry level is a step function, not O(1) state), so this is the
    * exact in-row fold: ALL integer arithmetic, replayable
    * bit-for-bit by a sequential oracle. One shuffle; per-key state is
    * the key's event array — [[ewmaFinal]]'s documented bound. Returns
    * (key, n_events, n_admitted, n_throttled, final_tokens). */
  def tokenBucketAudit(df: DataFrame, key: Column, ts: Column,
                       order: Column, capacity: Long, refillPerSec: Long,
                       cost: Long): DataFrame = {
    require(capacity > 0 && refillPerSec > 0 && cost > 0,
      "tokenBucketAudit: capacity, refillPerSec, cost must be positive")
    require(cost <= capacity,
      "tokenBucketAudit: cost > capacity would throttle every event")
    // the refilled level t appears in three places; inlined twice —
    // duplicate integer expressions, deterministic either way
    val lvl = s"least(CAST($capacity AS BIGINT), " +
      s"st.tok + (x.s - st.last) * CAST($refillPerSec AS BIGINT))"
    df.filter(ts.isNotNull)
      .groupBy(key.as("key"))
      .agg(sort_array(collect_list(struct(
             unix_timestamp(ts).as("s"), order.as("o")))).as("__xs"))
      .withColumn("__st", expr(
        s"""aggregate(__xs,
             named_struct('tok', CAST($capacity AS BIGINT),
                          'last', __xs[0].s,
                          'adm', CAST(0 AS BIGINT)),
             (st, x) -> named_struct(
               'tok', CASE WHEN $lvl >= $cost
                           THEN $lvl - $cost ELSE $lvl END,
               'last', x.s,
               'adm', st.adm + CASE WHEN $lvl >= $cost
                                    THEN 1 ELSE 0 END))"""))
      .select(col("key"), size(col("__xs")).cast("long").as("n_events"),
              col("__st.adm").as("n_admitted"),
              (size(col("__xs")).cast("long") - col("__st.adm"))
                .as("n_throttled"),
              col("__st.tok").as("final_tokens"))
  }

  /** Autocorrelation function per series: Pearson correlation between
    * the series and its own lag-ℓ shift, for ℓ = 1..maxLag — the
    * seasonality/memory detector (an hourly-period series spikes at
    * lag 24; white noise sits near 0 everywhere). Estimator is the
    * pairwise-complete Pearson corr over the (v_t, v_{t−ℓ}) pairs —
    * the same exact-integer cross-multiplication discipline as
    * [[Relational.exactCorr]] (decimal(38,0) sums; float only in the
    * one final shared expression), so the result is bit-portable
    * across engines.
    *
    * Shape at 100 TB: ONE window shuffle on the series key computes
    * all maxLag lag columns in-row (a single pass over each sorted
    * series, not one window per lag); the per-(series, lag) sums then
    * re-aggregate map-side before the final agg-sized shuffle. No
    * driver state. `value` must be integral (fixed-point upstream —
    * same contract as exactCorr); `order` must totalize ties. */
  def autocorrelation(df: DataFrame, series: Column, order: Column,
                      value: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col("__s")).orderBy(col("__o"))
    val base = df.select(series.as("__s"), order.as("__o"),
                         value.cast("long").as("__v"))
    val withLags = (1 to maxLag).foldLeft(base)((d, l) =>
      d.withColumn(s"__l$l", lag(col("__v"), l).over(w)))
    // stack to (series, lag, x=v_t, y=v_{t-lag}) and drop the ramp-up
    // rows where the lag is undefined (pairwise-complete estimator)
    val stacked = withLags.select(col("__s") +: (1 to maxLag).map(l =>
        struct(lit(l).as("lag"), col("__v").as("x"),
               col(s"__l$l").as("y")).as(s"__p$l")): _*)
      .select(col("__s"),
        explode(array((1 to maxLag).map(l => col(s"__p$l")): _*)).as("p"))
      .filter(col("p.y").isNotNull)
    stacked
      .groupBy(col("__s").as("series"), col("p.lag").as("lag"))
      .agg(count(lit(1)).cast(dec).as("n"),
           sum(col("p.x").cast(dec)).as("sx"),
           sum(col("p.y").cast(dec)).as("sy"),
           sum((col("p.x") * col("p.x")).cast(dec)).as("sxx"),
           sum((col("p.y") * col("p.y")).cast(dec)).as("syy"),
           sum((col("p.x") * col("p.y")).cast(dec)).as("sxy"))
      .select(col("series"), col("lag"), col("n").cast("long").as("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            .cast("double"))), 6)
          .as("acf"))
  }

  /** Session aggregation on Spark's NATIVE `session_window` — the
    * gap-merge the engine's [[sessionize]] builds by hand, expressed
    * as the built-in grouping so the SAME code runs under Structured
    * Streaming (where the window-id form can't: a running session-id
    * prefix sum needs the whole history, but session_window state
    * merges incrementally and closes at the watermark). Emits one row
    * per (key, session): start, end (last event + gap, Spark's
    * session_window convention), event count.
    *
    * Boundary semantics differ from [[sessionize]] by design:
    * session_window is END-EXCLUSIVE — two events EXACTLY gapSeconds
    * apart fall in different sessions (diff >= gap splits), while
    * sessionize splits only at diff > gap, so such boundary pairs
    * land in ONE session there. Away from that boundary the grouping
    * is identical (`OpsSpec` pins the parity on off-boundary data;
    * the q361 oracle encodes the >= split). Use sessionize when later
    * stages need per-EVENT session ids; use this when they need
    * per-SESSION rows (one fewer window pass). */
  def sessionAgg(df: DataFrame, user: Column, ts: Column,
                 gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    df.filter(ts.isNotNull)
      .groupBy(user.as("user_id"),
        session_window(ts, s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
              col("sw.end").as("session_end"), col("n_events"))
  }

  /** Linear interpolation of missing values in a keyed time series:
    * each null takes the straight line between its nearest non-null
    * neighbors (by time); leading/trailing nulls stay null (no
    * extrapolation — the forecastless choice [[forwardFill]] callers
    * also get). The interpolated value is the exact rational
    * (vPrev·(tNext−t) + vNext·(t−tPrev)) / (tNext−tPrev) computed in
    * integer arithmetic and divided ONCE as doubles — bit-portable.
    * Equal-timestamp neighbors (den 0) fall back to the previous
    * value, forward-fill style.
    *
    * Shape at 100 TB: one window shuffle on the key; both the
    * carry-back and carry-forward run over the same (ts, order) sort
    * (ignoreNulls last/first over mirrored frames), so Catalyst plans
    * one exchange + one sort. `value` must be integral fixed-point;
    * `order` totalizes ties. */
  def interpolateLinear(df: DataFrame, key: Column, ts: Column,
                        order: Column, value: Column): DataFrame = {
    val reserved = Seq("__sec", "__v", "__prev", "__next")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"interpolateLinear: input already has ${clash.mkString(", ")}")
    val base = df.filter(ts.isNotNull)
      .withColumn("__sec", unix_timestamp(ts))
      .withColumn("__v", value.cast("long"))
    val wPrev = Window.partitionBy(key).orderBy(col("__sec"), order)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(key).orderBy(col("__sec"), order)
      .rowsBetween(1, Window.unboundedFollowing)
    val obs = when(col("__v").isNotNull,
      struct(col("__sec").as("t"), col("__v").as("v")))
    val interp = base
      .withColumn("__prev", last(obs, ignoreNulls = true).over(wPrev))
      .withColumn("__next", first(obs, ignoreNulls = true).over(wNext))
    val den = col("__next.t") - col("__prev.t")
    val num = col("__prev.v") * (col("__next.t") - col("__sec")) +
              col("__next.v") * (col("__sec") - col("__prev.t"))
    interp.withColumn("filled",
      when(col("__v").isNotNull, col("__v").cast("double"))
        .when(col("__prev").isNull || col("__next").isNull, lit(null))
        .when(den === 0, col("__prev.v").cast("double"))
        .otherwise(round(num.cast("double") / den.cast("double"), 6)))
      .withColumn("was_interpolated",
        col("__v").isNull && col("filled").isNotNull)
      .drop("__sec", "__v", "__prev", "__next")
  }

  /** Frequent event paths: the global top-k most common length-`n`
    * event-type sequences walked per key in time order — the
    * "what do users actually do" mining primitive behind funnel
    * design (funnels TEST a hypothesized path; this DISCOVERS the
    * candidates). One window shuffle computes the n−1 lead columns
    * in-row, complete n-grams aggregate with map-side combine, and
    * the top-k is a TakeOrdered with a deterministic (count desc,
    * path asc) order. */
  def frequentPaths(df: DataFrame, key: Column, ts: Column,
                    order: Column, step: Column,
                    n: Int, topK: Int): DataFrame = {
    require(n >= 2, s"path length must be >= 2, got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val base = df.filter(ts.isNotNull && step.isNotNull)
      .select(key.as("__k"), ts.as("__t"), order.as("__o"),
              step.as("__s0"))
    val withLeads = (1 until n).foldLeft(base)((d, i) =>
      d.withColumn(s"__s$i",
        lead(col("__s0"), i).over(
          Window.partitionBy(col("__k")).orderBy(col("__t"), col("__o")))))
    val steps = (0 until n).map(i => col(s"__s$i"))
    withLeads
      .filter(steps.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws(">", steps: _*).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("path"))
      .limit(topK)
  }

  /** Capped sessionization summary: sessions split on EITHER a gap
    * exceeding `gapSeconds` OR total session duration exceeding
    * `capSeconds` — the bot/kiosk guard plain gap sessionization
    * lacks (a pinger emitting every minute for a week is ONE gap
    * session; the cap slices it). The duration rule makes session
    * membership depend on the running session START, a sequential
    * recurrence no window can express — so each user's sorted events
    * fold IN-ROW (same discipline as [[tokenBucketAudit]]): one
    * shuffle on the key, O(1) fold state, summary out
    * (n_events, n_sessions, longest closed-or-final session seconds).
    * The oracle replays the identical state machine with a recursive
    * CTE. */
  def sessionStatsCapped(df: DataFrame, user: Column, ts: Column,
                         order: Column, gapSeconds: Long,
                         capSeconds: Long): DataFrame = {
    require(gapSeconds > 0 && capSeconds > 0,
      "sessionStatsCapped: gap and cap must be positive")
    require(capSeconds >= gapSeconds,
      "a cap below the gap would split every extension; use gap alone")
    df.filter(ts.isNotNull)
      .groupBy(user.as("user_id"))
      .agg(sort_array(collect_list(struct(
             unix_timestamp(ts).as("s"), order.as("o")))).as("__xs"))
      .withColumn("__st", expr(
        s"""aggregate(__xs,
             named_struct('start', __xs[0].s, 'prev', __xs[0].s,
                          'n', CAST(1 AS BIGINT),
                          'longest', CAST(0 AS BIGINT),
                          'first', true),
             (st, x) -> CASE
               WHEN st.first THEN
                 named_struct('start', st.start, 'prev', st.prev,
                              'n', st.n, 'longest', st.longest,
                              'first', false)
               WHEN x.s - st.prev > ${gapSeconds}L
                    OR x.s - st.start > ${capSeconds}L THEN
                 named_struct('start', x.s, 'prev', x.s,
                              'n', st.n + 1,
                              'longest', greatest(st.longest,
                                                  st.prev - st.start),
                              'first', false)
               ELSE
                 named_struct('start', st.start, 'prev', x.s,
                              'n', st.n, 'longest', st.longest,
                              'first', false) END)"""))
      .select(col("user_id"),
        size(col("__xs")).cast("long").as("n_events"),
        col("__st.n").as("n_sessions"),
        greatest(col("__st.longest"),
                 col("__st.prev") - col("__st.start")).as("longest_sec"))
  }

  /** Concurrency curve: how many intervals are simultaneously open at
    * each boundary event — peak-load sizing, license-seat audits,
    * "how many users were on at once". The classic ±1 sweep: every
    * interval contributes +1 at its start and −1 at its end, and the
    * running sum over the (time, end-before-start) order is the step
    * function. End-exclusive: an interval ending exactly when another
    * starts does not overlap it.
    *
    * The running sum is GLOBAL — the one shape a per-key window can't
    * partition — so it rides [[Packing.orderedCumsum]]'s distributed
    * prefix sum: range shuffle + per-partition sort + an
    * O(partitions) driver offset frame, never a single-partition
    * window. Ties inside one (time, sign) group commute (the sum is
    * over identical deltas), so downstream per-bucket aggregates are
    * deterministic without a per-row tiebreak. */
  def concurrencyCurve(sessions: DataFrame, start: Column, end: Column,
                       partitions: Int = 32): DataFrame = {
    val deltas = sessions
      .select(start.cast("long").as("t"), lit(1L).as("d"))
      .unionByName(sessions
        .select(end.cast("long").as("t"), lit(-1L).as("d")))
      .filter(col("t").isNotNull)
      // ends sort before starts at the same instant (end-exclusive)
      .withColumn("__ord",
        col("t") * 2 + when(col("d") === 1L, 1L).otherwise(0L))
    Packing.orderedCumsum(deltas, col("__ord"), col("d"), partitions,
        offsetName = "__pre")
      .select(col("t"), col("d"),
              (col("__pre") + col("d")).as("concurrent"))
  }

  /** Interval-set union per key: merge overlapping/touching [start,
    * end] intervals into maximal covered spans — total uptime from
    * overlapping sessions, covered calendar from per-order service
    * windows, lock-coverage audits. Touching intervals (next.start ==
    * prev.end) merge; a gap strictly greater than zero splits. The
    * classic sweep: one window per key orders intervals by (start,
    * end), a span begins where start exceeds the running max of prior
    * ends, and the span id is the running count of such breaks —
    * [[activityIslands]]' day-granular variant generalized to
    * arbitrary interval columns (integer units; cast timestamps to
    * epoch upstream).
    *
    * One shuffle on the key; both windows share the (start, end) sort
    * order so Catalyst plans one exchange + one sort. */
  def mergeIntervals(df: DataFrame, key: Column, start: Column,
                     end: Column): DataFrame = {
    val reserved = Seq("__s", "__e", "__pmax", "__brk", "__span")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"mergeIntervals: input already has ${clash.mkString(", ")}")
    val base = df
      .select(key.as("key"), start.cast("long").as("__s"),
              end.cast("long").as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull &&
              col("__s") <= col("__e"))
    val w = Window.partitionBy(col("key")).orderBy(col("__s"), col("__e"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__pmax", max(col("__e")).over(wRun))
      .withColumn("__brk",
        when(col("__pmax").isNull || col("__s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__span", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("__span"))
      .agg(min(col("__s")).as("span_start"),
           max(col("__e")).as("span_end"),
           count(lit(1)).as("n_intervals"))
      .select(col("key"), col("span_start"), col("span_end"),
              (col("span_end") - col("span_start")).as("covered"),
              col("n_intervals"))
  }
}
