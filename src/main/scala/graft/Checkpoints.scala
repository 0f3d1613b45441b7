package graft

import org.apache.spark.sql.Dataset

/** Checkpoint POLICY seam for every iterative operator (graph loops,
  * connected components, IVF-PQ routing, BPE rounds, prefix sums).
  *
  * The engine cuts lineage ~60 places; which cut primitive is correct
  * depends on the deployment, not the operator:
  *
  *  - `localCheckpoint()` (the default): blocks live on executors,
  *    zero I/O to external storage — the right call on local[n] and on
  *    clusters where retrying the whole job beats paying checkpoint
  *    I/O. BUT the truncated lineage is unrecoverable if an executor
  *    holding blocks dies: on a 1000-executor / 100 TB run, a single
  *    preemption kills any deep iterative job.
  *  - reliable `checkpoint()`: blocks go to the HDFS-compatible
  *    checkpoint dir and survive any executor loss. Costs a write +
  *    re-read of the frame per cut.
  *
  * Ops therefore never call either primitive directly — they call
  * [[CheckpointOps.cut]], and the session config chooses:
  *
  * {{{
  * spark.conf.set("spark.graft.checkpoint.reliable", "true")
  * spark.conf.set("spark.graft.checkpoint.dir", "hdfs:///ckpt/graft")
  * }}}
  *
  * Both modes are eager (the cut frame is materialized at the call, as
  * the re-plan-hazard comments at the call sites require) and both
  * return a frame with truncated lineage — results are bit-identical
  * across modes, which `CheckpointPolicySpec` pins by running a graph
  * op and a prefix-sum op under each mode.
  */
object Checkpoints {

  /** "true" → reliable `.checkpoint()` into the fault-tolerant dir;
    * anything else (default) → executor-local blocks. Read per cut, so
    * a session can flip modes between jobs. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Directory for reliable mode. Applied to the SparkContext on the
    * first reliable cut if no checkpoint dir is set yet; ignored (with
    * the existing dir kept) otherwise. */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Cut lineage under the session's checkpoint policy (see object
    * doc). Eager in both modes.
    *
    * Reliable mode persists the frame around the checkpoint: Spark
    * writes reliable checkpoint files in a SEPARATE job after the
    * materializing action, recomputing every partition from lineage
    * unless it is cached (the RDD.checkpoint doc's own warning) — for
    * a deep iterative chain that doubles the cut's cost. The persist
    * turns the write job into a cache read; the blocks are dropped
    * (async) once the checkpoint files exist. */
  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val conf = ds.sparkSession.conf
    if (conf.get(ReliableKey, "false").toBoolean) {
      val sc = ds.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = conf.get(DirKey, "")
        require(dir.nonEmpty,
          s"$ReliableKey=true requires $DirKey (or a prior " +
            "SparkContext.setCheckpointDir)")
        sc.setCheckpointDir(dir)
      }
      val cached = ds.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try cached.checkpoint()
      finally { cached.unpersist(blocking = false); () }
    } else ds.localCheckpoint()
  }

  /** [[cut]] that also returns the frame's EXACT row count without a
    * second job: the [[graft.ops.PairJoins]] gate needs the count of
    * every materialized pair-index frame, and paying a separate
    * `count()` per frame doubled the gate's job overhead (r7 verdict
    * task #3). In the default local mode the checkpoint is taken
    * LAZILY and the `count()` action is what materializes the blocks
    * — one job does both. Reliable mode keeps the eager cut (the
    * lazy variant would recompute the lineage for the checkpoint
    * write) and pays the extra count over checkpointed bytes; the
    * premium is the documented reliable-mode cost, not the gate's. */
  def cutCounted[T](ds: Dataset[T]): (Dataset[T], Long) =
    if (ds.sparkSession.conf.get(ReliableKey, "false").toBoolean) {
      val c = cut(ds)
      (c, c.count())
    } else {
      val c = ds.localCheckpoint(eager = false)
      (c, c.count())
    }

  /** Postfix syntax so call sites keep their chained shape:
    * `frame.groupBy(...).agg(...).cut()`. */
  implicit class CheckpointOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def cut(): Dataset[T] = Checkpoints.cut(ds)
    def cutCounted(): (Dataset[T], Long) = Checkpoints.cutCounted(ds)
  }
}
