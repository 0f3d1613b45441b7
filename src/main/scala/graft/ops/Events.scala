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
}
