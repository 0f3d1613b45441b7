package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a [[StreamingQueryListener]] that records
  * one row per finished micro-batch — batch id, input rows, processed
  * rows/sec, batch duration, and aggregated state rows — the numbers an
  * operator watches to catch backlog growth (inputRows persistently
  * above processedRowsPerSecond × trigger interval) and state-store
  * bloat BEFORE they page anyone. Metrics come from Spark's own
  * progress events: zero instrumentation inside the queries themselves.
  *
  * In-memory, bounded buffer (the most recent `capacity` batches) —
  * production sinks would forward the same rows to a metrics bus; the
  * point here is the listener seam and the extraction.
  */
final class QueryMetricsListener(capacity: Int = 1024)
    extends StreamingQueryListener {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  final case class BatchMetrics(queryName: String, batchId: Long,
                                inputRows: Long, durationMs: Long,
                                stateRows: Long)

  private val buf =
    new scala.collection.mutable.ArrayDeque[BatchMetrics]()

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows =
      if (p.stateOperators == null) 0L
      else p.stateOperators.map(_.numRowsTotal).sum
    buf.synchronized {
      buf.append(BatchMetrics(
        Option(p.name).getOrElse(""), p.batchId,
        p.numInputRows, p.batchDuration, stateRows))
      while (buf.size > capacity) buf.removeHead()
    }
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Snapshot of the recorded batches (oldest first). */
  def batches: Seq[BatchMetrics] = buf.synchronized { buf.toSeq }

  /** The recorded metrics as a DataFrame for SQL-side analysis. */
  def toDF(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    batches.map(b => (b.queryName, b.batchId, b.inputRows,
                      b.durationMs, b.stateRows))
      .toDF("query_name", "batch_id", "input_rows", "duration_ms",
            "state_rows")
  }
}
