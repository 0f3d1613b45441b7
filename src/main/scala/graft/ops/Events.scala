package graft.ops

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

  /** Gap-based sessionization: a new session starts when the gap from
    * the previous event of the same user exceeds `gapSeconds`. One
    * shuffle on user_id; the cumulative-sum window runs sorted within
    * each user partition. Null-timestamp events are excluded — they
    * have no position in time, and NULLS FIRST ordering would otherwise
    * count each one as its own session. */
  def sessionize(df: DataFrame, user: Column, ts: Column,
                 gapSeconds: Long): DataFrame = {
    val clash = df.columns.intersect(Seq("__new", "session_id"))
    require(clash.isEmpty,
      s"sessionize: input already has ${clash.mkString(", ")} — rename " +
      "first (the working/output columns would silently overwrite it)")
    val w = Window.partitionBy(user).orderBy(ts)
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
}
