package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Graph, Packing}

/** The [[Checkpoints]] policy seam: every iterative op cuts lineage
  * through `Checkpoints.cut`, and the session config chooses
  * executor-local blocks (default) vs reliable `.checkpoint()` files
  * that survive executor loss. These tests prove the two modes are
  * RESULT-IDENTICAL (bit-equal rows) on one graph op and one
  * prefix-sum op, that reliable mode actually writes checkpoint files
  * to the configured dir, and that the config contract fails fast
  * when the dir is missing.
  */
class CheckpointPolicySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synthEdges(n: Int) =
    (0 until n).flatMap { u =>
      Seq((u.toLong, ((u + 1) % n).toLong, 1L),
          (u.toLong, ((u * 131 + 7) % n).toLong, 1L),
          (u.toLong, ((u + n / 2) % n).toLong, 1L))
    }.toDF("src", "dst", "w")

  /** Run `body` with reliable checkpointing on, restoring the prior
    * mode and the SparkContext checkpoint dir after. */
  private def withReliable[A](body: => A): A = {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.ReliableKey, "true")
    spark.conf.set(Checkpoints.DirKey, dir)
    try body
    finally {
      spark.conf.set(Checkpoints.ReliableKey, "false")
      spark.conf.unset(Checkpoints.DirKey)
      // reset so later suites/tests are not silently reliable-capable
      sc.setCheckpointDir(null)
      val d = new java.io.File(dir)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(d)
    }
  }

  test("pageRank: reliable mode is bit-identical to local mode") {
    val edges = synthEdges(300)
    val local = Graph.pageRank(edges, 25).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = withReliable {
      Graph.pageRank(edges, 25).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(local == reliable)
  }

  test("orderedCumsum: reliable mode is bit-identical to local mode") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("k", "v")
    def run() = Packing
      .orderedCumsum(df, col("k"), col("v"), partitions = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val local = run()
    val reliable = withReliable { run() }
    assert(local == reliable)
    // sanity: the cumsum really is a prefix sum
    val vals = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1 to 5000).scanLeft(0L)((a, i) => a + vals(i.toLong))
    assert((1 to 5000).forall(i => local(i.toLong) == want(i - 1)))
  }

  test("reliable mode writes RDD checkpoint files to the config dir") {
    withReliable {
      val dir = spark.conf.get(Checkpoints.DirKey)
      Checkpoints.cut(synthEdges(100))
      def walk(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).map(_.toSeq.flatMap(c => c +: walk(c)))
          .getOrElse(Nil)
      assert(walk(new java.io.File(dir)).exists(_.getName.startsWith("part-")),
        s"no checkpoint part files under $dir")
    }
  }

  test("reliable mode without a dir fails fast with the config keys") {
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Checkpoints.cut(synthEdges(10))
      }
      assert(e.getMessage.contains(Checkpoints.DirKey))
    } finally spark.conf.set(Checkpoints.ReliableKey, "false")
  }
}
