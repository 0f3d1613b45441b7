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

  test("keepBestPerCluster: null scores lose to any scored member") {
    import org.apache.spark.sql.functions.col
    // cluster {1,2}: doc 1 unscored (null), doc 2 scored -> 2 survives;
    // cluster {3,4}: both null -> struct tiebreak falls to min id 3
    val d = Seq((1L, Option.empty[Long]), (2L, Some(5L)),
                (3L, Option.empty[Long]), (4L, Option.empty[Long]))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2")
    val kept = Dedup.keepBestPerCluster(d, pairs, col("doc_id"),
      col("score")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // empty corpus with a (dangling) pair list: no rows survive, no crash
    val none = emptyDocs.withColumn("score",
      org.apache.spark.sql.functions.lit(1L))
    assert(Dedup.keepBestPerCluster(none, pairs, col("doc_id"),
      col("score")).count() == 0)
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

  test("bucketed sessionize equals the per-key form on a power-law user") {
    // one hot user holds most events (the straggler shape); results must
    // be identical and the event-proportional window must partition on
    // (user, bucket), not user alone
    val rnd = new scala.util.Random(7)
    val hot = Seq.fill(3000)((1L, 1700000000L + rnd.nextInt(400000).toLong))
    val cold = (2L to 20L).flatMap(u =>
      Seq.fill(10)((u, 1700000000L + rnd.nextInt(400000).toLong)))
    val df = (hot ++ cold).toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    def stats(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = stats(Events.sessionStats(df, col("user_id"), col("ts"), 1800))
    val bucketed = stats(Events.sessionStatsBucketed(
      df, col("user_id"), col("ts"), 1800, bucketSeconds = 3600))
    assert(bucketed == base)
    // the hot key genuinely spreads: >1 (user, bucket) partition for it
    val hotBuckets = df.filter(col("user_id") === 1)
      .select(floor(unix_timestamp(col("ts")) / 3600).as("b"))
      .distinct().count()
    assert(hotBuckets > 1)
    // plan evidence: an EVENT-proportional window spec partitions by the
    // bucket column (merely containing "__b" anywhere would also match
    // the summary joins and prove nothing)
    val plan = Events.sessionizeBucketed(df, col("user_id"), col("ts"),
      1800, 3600).queryExecution.executedPlan.toString
    val eventWindowBucketed =
      "windowspecdefinition\\(user_id#\\d+[L]?, __b#\\d+".r
        .findFirstIn(plan).isDefined
    assert(eventWindowBucketed, plan.take(2000))
  }

  test("bucketed as-of join equals the per-key form on a power-law user") {
    val rnd = new scala.util.Random(11)
    // hot user: thousands of purchases and clicks; right (k, t) unique so
    // the matched payload is well-defined under ties
    val hotL = Seq.fill(2000)((1L, rnd.nextInt(500000).toLong))
    val coldL = (2L to 10L).flatMap(u =>
      Seq.fill(5)((u, rnd.nextInt(500000).toLong)))
    val rts = rnd.shuffle((0L until 500000L).toList).take(3000)
    val hotR = rts.map(t => (1L, t, t * 10))
    val coldR = (2L to 10L).flatMap(u =>
      rnd.shuffle((0L until 500000L).toList).take(5).map(t => (u, t, t * 10)))
    val left = (hotL ++ coldL).toDF("k", "t")
    val right = (hotR ++ coldR).toDF("k", "rt", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "t", "av").collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) null else r.getLong(2)))
        .toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val base = rows(Relational.asofJoinBackward(
      left, right, "k", "t", "rt", Map("v" -> "av")))
    val bucketed = rows(Relational.asofJoinBackwardBucketed(
      left, right, "k", "t", "rt", Map("v" -> "av"),
      bucketOf = t => floor(t / 50000L)))
    assert(bucketed == base)
  }

  test("bucketed as-of join: carry-in crosses empty buckets and null keys stay") {
    val l2 = Seq((Option(1L), 100L), (Option(1L), 999999L),
                 (Option.empty[Long], 50L)).toDF("k", "t")
    val right = Seq((1L, 10L, "early")).toDF("k", "rt", "v")
    val out = Relational.asofJoinBackwardBucketed(l2, right,
        "k", "t", "rt", Map("v" -> "av"), bucketOf = t => floor(t / 100L))
      .orderBy("t").collect()
    // bucket 0 (t=50, null key): no match; bucket 1 (t=100): right in
    // earlier bucket 0 carries in; bucket 9999 (t=999999): carry crosses
    // thousands of empty buckets
    assert(out.map(r => if (r.isNullAt(r.fieldIndex("av"))) null
                        else r.getString(r.fieldIndex("av"))).toSeq ==
      Seq(null, "early", "early"))
  }

  test("manifest/curation ops survive empty, null-text, tiny inputs") {
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "one tiny doc")).toDF("doc_id", "text")
    for (d <- Seq(emptyDocs, weird)) {
      // null text tokenizes to null -> excluded (same rule as packing);
      // empty string splits to [""] (1 token), so it stays
      val b = Packing.lengthBucketBatches(d, col("doc_id"), col("text"),
        32, 16)
      assert(b.count() == d.filter(col("text").isNotNull).count())
      assert(Packing.shuffleShards(d, col("doc_id"), 8).count() ==
        d.count())
    }
    // top-fraction: empty input and a group smaller than 1/fraction
    val tiny = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "g", "s")
    val kept = Relational.topFractionPerGroup(tiny, col("g"), col("s"),
      col("id"), 0.5).collect()
    // floor(0.5*2)=1 from "a" (the higher score), floor(0.5*1)=0 from "b"
    assert(kept.map(_.getLong(0)).toSet == Set(2L))
    assert(Relational.topFractionPerGroup(tiny.limit(0), col("g"),
      col("s"), col("id"), 0.5).count() == 0)
    // semdedup: empty corpus and corpus smaller than k
    val emptyV = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semDedupPairs(emptyV, col("vec_id"),
      col("embedding"), 0.5).count() == 0)
    val twoV = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.semDedupPairs(twoV, col("vec_id"),
      col("embedding"), 0.9, k = 8, iters = 2).count() == 1)
  }

  test("round-5 ops survive empty / degenerate inputs") {
    val emptyE = Seq.empty[(Long, Long)].toDF("u", "v")
    // k-core on no edges, and on a graph the first peel clears
    assert(Graph.kCorePeel(emptyE, col("u"), col("v"), 2, 3).count() == 0)
    val line = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    assert(Graph.kCorePeel(line, col("u"), col("v"), 2, 2).count() == 0)
    // OHLC: all-null values and all-null timestamps produce no bars
    val ev = Seq((Option.empty[java.sql.Timestamp], 1L,
      Option.empty[Double])).toDF("ts", "event_id", "value")
    assert(ops.Events.ohlcBars(ev, col("ts"), col("event_id"),
      col("value")).count() == 0)
    // LSH screen: empty corpus index and empty batch both yield nothing
    val idx = Dedup.minhashIndex(emptyDocs, col("doc_id"), col("text"))
    assert(Dedup.lshScreen(oneDoc, col("doc_id"), col("text"),
      idx, 0.5).count() == 0)
    val idx2 = Dedup.minhashIndex(oneDoc, col("doc_id"), col("text"))
    assert(Dedup.lshScreen(emptyDocs, col("doc_id"), col("text"),
      idx2, 0.5).count() == 0)
    // packed IVF: empty query set; corpus smaller than nLists
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val (cents, packed) = Similarity.ivfPack(tiny, col("vec_id"),
      col("embedding"), nLists = 16)
    assert(cents.size == 2)
    assert(Similarity.ivfTopKPacked(
      tiny.filter(col("vec_id") < 0), cents, packed,
      col("vec_id"), col("embedding"), k = 3).count() == 0)
    // canonicalizeUrl: null in, null out (no NPE in the regex chain)
    val nulls = Seq(Option.empty[String]).toDF("u")
      .select(ops.TextAnalysis.canonicalizeUrl(col("u")).as("c"))
    assert(nulls.collect().head.isNullAt(0))
    // forward as-of with empty right side left-joins nulls
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq.empty[(Long, Long, String)].toDF("k", "rt", "p")
    val out = Relational.asofJoinForward(l, r, "k", "t", "rt",
      Map("p" -> "pv")).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("pv")))
  }

  test("transform of an empty frame yields empty relational result") {
    import graft.dsl.Domain._
    import graft.dsl.Range._
    val in = Seq.empty[(String, Int)].toDF("k", "v")
    val out = Transform.run(in, rows("k", "v"),
      RMap(col("k"), RAgg(sum(col("v")))))
    assert(out.count() == 0)
  }

  test("bucketed forward fill equals the per-key form on a power-law key") {
    val rnd = new scala.util.Random(13)
    // hot key: thousands of events across many hour buckets, ~half null;
    // includes whole buckets with no non-null value (carry must jump
    // over them) and a leading-null stretch
    val hot = (0 until 3000).map { i =>
      val sec = 1700000000L + rnd.nextInt(400000).toLong
      val v: Option[Double] =
        if (sec % 7200 < 3600 || rnd.nextBoolean()) None
        else Some(rnd.nextInt(1000).toDouble)
      (1L, i.toLong, sec, v)
    }
    val cold = (2L to 15L).flatMap(u => (0 until 8).map { i =>
      (u, 100000L + u * 100 + i, 1700000000L + rnd.nextInt(400000).toLong,
       if (i % 3 == 0) None else Some(i.toDouble))
    })
    val df = (hot ++ cold).toDF("u", "id", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("u", "id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1),
                   if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    val base = rows(Events.forwardFill(df, col("u"), col("ts"), col("id"),
      Seq("v")))
    val bucketed = rows(Events.forwardFillBucketed(df, col("u"), col("ts"),
      col("id"), "v", bucketSeconds = 3600))
    assert(bucketed == base)
    // the hot key genuinely spreads over >1 (key, bucket) partition
    assert(df.filter(col("u") === 1)
      .select(floor(unix_timestamp(col("ts")) / 3600).as("b"))
      .distinct().count() > 1)
  }

  test("chunked EWMA matches the exact in-row fold to 1e-9 relative") {
    val rnd = new scala.util.Random(17)
    val hot = (0 until 2000).map { i =>
      (1L, i.toLong, 1700000000L + rnd.nextInt(400000).toLong,
       rnd.nextInt(1000).toDouble) }
    val cold = (2L to 10L).flatMap(u => (0 until 10).map { i =>
      (u, 10000L + u * 100 + i, 1700000000L + rnd.nextInt(400000).toLong,
       rnd.nextInt(1000).toDouble) })
    val df = (hot ++ cold).toDF("u", "id", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .map(t => (t._1, t._2) -> t._3).toMap
    val exact = m(Events.ewmaFinal(df, col("u"), col("ts"), col("id"),
      col("v"), 1, 5))
    val chunked = m(Events.ewmaChunked(df, col("u"), col("ts"), col("id"),
      col("v"), 1, 5, bucketSeconds = 3600))
    assert(chunked.keySet == exact.keySet) // same keys AND same n_events
    exact.foreach { case (k, e) =>
      val c = chunked(k)
      assert(math.abs(c - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"key $k: exact $e vs chunked $c")
    }
  }
}
