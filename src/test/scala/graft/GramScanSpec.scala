package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Pins the r8 Gram-trainer contract (r7 verdict task #2): the whole
  * m-component PCA training — moments, centering, power iteration,
  * deflation — costs exactly ONE Spark job (the single moments pass),
  * regardless of m and iters. The previous trainer ran 2·m·iters
  * aggregate jobs plus m deflation materializations: the full-suite
  * bench-variance class and a 100 TB multi-scan. A regression back to
  * per-iteration corpus jobs fails this count. */
class GramScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Job-start events are delivered async; wait until the count is
    * stable for 500 ms (or 5 s cap) before reading it. */
  private def settledCount(jobs: java.util.concurrent.atomic.AtomicInteger): Int = {
    val deadline = System.nanoTime() + 5_000_000_000L
    var last = -1
    var stableSince = System.nanoTime()
    while (System.nanoTime() < deadline) {
      val c = jobs.get()
      if (c != last) { last = c; stableSince = System.nanoTime() }
      else if (System.nanoTime() - stableSince > 500_000_000L) return c
      Thread.sleep(20)
    }
    last
  }

  test("Gram-matrix PCA trainer runs exactly one corpus job") {
    val df = spark.read.parquet(TestSpark.sf0001 + "/embeddings.parquet")
    df.count() // warm parquet footers so the count below is the trainer's
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = graft.ops.Similarity.topPrincipalComponents(
        df, col("vec_id"), col("embedding"), m = 2, iters = 2)
      val trained = settledCount(jobs)
      assert(trained == 1,
        s"trainer ran $trained Spark jobs, expected exactly 1")
      // the result frame is a local Seq — collecting it adds at most a
      // trivial local job and carries both components
      assert(out.collect().map(_.getInt(0)).distinct.sorted.toSeq ==
        Seq(1, 2))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("d=2048 trainer: two-level merge keeps ONE job and the exact " +
       "moments (r8 verdict task #2 — past the old d=1024 cap)") {
    import spark.implicits._
    // 48 rows of d=2048: the ONLY varying coordinate is index 5
    // (value j), so the centered Gram has a single nonzero entry
    // G[5][5] and the exact top component is the basis vector e_5 —
    // robust to every rounding choice in the integer pipeline
    val d = 2048
    val rows = (0 until 48).map { j =>
      (j.toLong, Array.tabulate(d)(k => if (k == 5) j.toDouble else 0.0))
    }
    // parallelize with explicit slices: a repartition() here would be
    // an AQE-materialized exchange = a separate job the count can't
    // attribute to the trainer
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4))
      .toDF("vec_id", "embedding")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = graft.ops.Similarity.topPrincipalComponent(
        df, col("vec_id"), col("embedding"), iters = 1)
      assert(settledCount(jobs) == 1,
        "d=2048 trainer must still cost exactly one corpus job")
      assert(out.size == d)
      // e_5 exactly: 1e6 at (1-based) index 6, zero everywhere else
      assert(out.filter(_._2 != 0L) == Seq((6, 1000000L)))
      // >8 partitions: the two-level exchange path — identical
      // moments (exact integers commute with the merge tree) and
      // STILL one job (the tree is a stage inside it, not a rescan)
      jobs.set(0)
      val df16 = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 16))
        .toDF("vec_id", "embedding")
      val out16 = graft.ops.Similarity.topPrincipalComponent(
        df16, col("vec_id"), col("embedding"), iters = 1)
      assert(settledCount(jobs) == 1,
        "two-level merge must not add a job")
      assert(out16 == out)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("single-component trainer is the m = 1 case of the same pass") {
    val df = spark.read.parquet(TestSpark.sf0001 + "/embeddings.parquet")
    val one = graft.ops.Similarity.topPrincipalComponent(
      df, col("vec_id"), col("embedding"), iters = 2)
    val two = graft.ops.Similarity.topPrincipalComponents(
        df, col("vec_id"), col("embedding"), m = 2, iters = 2)
      .collect().filter(_.getInt(0) == 1)
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(one.sortBy(_._1) == two)
  }
}
