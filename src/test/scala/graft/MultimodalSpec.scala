package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** The multimodal plumbing is real (schema, batching, partition seam);
  * only the codec kernel is a deterministic stub. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def media = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id").as("asset_id"),
            col("text").cast("binary").as("media"),
            lit("text/plain").as("mime"))

  test("expression-level feature stub is deterministic and bounded") {
    val f1 = media.select(col("asset_id"),
      Multimodal.featuresStub(col("media"), 8).as("f")).collect()
    val f2 = media.select(col("asset_id"),
      Multimodal.featuresStub(col("media"), 8).as("f")).collect()
    assert(f1.map(_.getSeq[Double](1)).toSeq == f2.map(_.getSeq[Double](1)).toSeq)
    assert(f1.forall(_.getSeq[Double](1).forall(x => x >= 0.0 && x < 1.0)))
    assert(f1.forall(_.getSeq[Double](1).size == 8))
  }

  test("frame sampler emits n frames covering the blob") {
    val r = media.select(col("asset_id"), length(col("media")).as("len"),
      Multimodal.sampleFramesStub(col("media"), 4).as("frames")).collect()
    assert(r.forall(_.getSeq[Array[Byte]](2).size == 4))
    r.foreach { row =>
      val total = row.getInt(1)
      val frames = row.getSeq[Array[Byte]](2)
      assert(frames.map(_.length).sum <= total + 4)
    }
  }

  test("partition-batch decode seam produces per-asset features") {
    val out = Multimodal.decodePartitions(media, "asset_id", "media")(
      Multimodal.stubDecodeKernel)
    val got = out.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val lens = media.select(col("asset_id"), length(col("media")))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toDouble).toMap
    assert(got.size == lens.size)
    // feature 0 of the stub kernel is the byte length
    assert(got.forall { case (id, f) => f.head == lens(id) })
  }
}
