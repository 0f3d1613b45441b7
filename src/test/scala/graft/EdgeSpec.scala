package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

/** Degenerate-input robustness: every operator must survive empty and
  * single-row inputs (at 100 TB a partition, a filter result, or a whole
  * daily drop being empty is routine, not exceptional). */
class EdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc = Seq((1L, "only one tiny doc here")).toDF("doc_id", "text")
  private def shortDoc = Seq((1L, "ab")).toDF("doc_id", "text") // < n tokens

  test("dedup pipelines handle empty / single / shingle-less corpora") {
    for (d <- Seq(emptyDocs, oneDoc, shortDoc)) {
      assert(Dedup.jaccardPairs(d, col("doc_id"), col("text"), 0.6).count() == 0)
      assert(Dedup.minhashLshPairs(d, col("doc_id"), col("text"), 0.6).count() == 0)
      assert(Dedup.simhashPairs(d, col("doc_id"), col("text"), 0.6).count() == 0)
    }
  }

  test("text analysis handles empty corpus and empty strings") {
    val weird = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    assert(TextAnalysis.langIdOf(weird, col("doc_id"), col("text")).count() == 3)
    assert(TextAnalysis.quality(weird, col("doc_id"), col("text")).count() == 3)
    assert(TextAnalysis.fingerprints(weird, col("doc_id"), col("text")).count() == 3)
    assert(TextAnalysis.tokenCounts(weird, col("doc_id"), col("text")).count() == 3)
    assert(TextAnalysis.tokenFrequency(emptyDocs, col("text"), 10).count() == 0)
  }

  test("similarity handles empty query set and empty corpus") {
    val e = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val none = e.filter(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(e, none, col("vec_id"), col("embedding"),
      col("vec_id"), col("embedding"), 3).count() == 0)
    assert(Similarity.bruteForceTopK(none, e, col("vec_id"), col("embedding"),
      col("vec_id"), col("embedding"), 3).count() == 0)
    assert(Dedup.embeddingPairs(none, col("vec_id"), col("embedding"), 0.5)
      .count() == 0)
  }

  test("as-of join never matches a null right time") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, Option.empty[Long], "x")).toDF("k", "rt", "v")
    val out = Relational.asofJoinBackward(left, right,
      "k", "t", "rt", Map("v" -> "av")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("av")))
  }

  test("IVF and kmeans survive corpora smaller than nLists/k") {
    val e = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
                (3L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(e, col("vec_id"),
      col("embedding"), k = 8, iters = 2)
    assert(cents.size == 3) // fewer rows than k → that many centroids
    assert(Similarity.kmeansCentroids(e.filter(col("vec_id") < 0),
      col("vec_id"), col("embedding"), k = 4, iters = 1).isEmpty)
    val r = Similarity.ivfTopK(e, e, col("vec_id"), col("embedding"),
      col("vec_id"), col("embedding"), k = 2, nLists = 16, nProbe = 4)
    assert(r.count() > 0) // clamped lists, no ANSI index error
    val empty = e.filter(col("vec_id") < 0)
    assert(Similarity.ivfTopK(empty, e, col("vec_id"), col("embedding"),
      col("vec_id"), col("embedding"), k = 2).count() == 0)
  }

  test("as-of join with empty right side left-joins nulls") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "rt", "v")
    val out = Relational.asofJoinBackward(left, right,
      "k", "t", "rt", Map("v" -> "av")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("av")))
  }

  test("transform of an empty frame yields empty relational result") {
    import graft.dsl.Domain._
    import graft.dsl.Range._
    val in = Seq.empty[(String, Int)].toDF("k", "v")
    val out = Transform.run(in, rows("k", "v"),
      RMap(col("k"), RAgg(sum(col("v")))))
    assert(out.count() == 0)
  }
}
