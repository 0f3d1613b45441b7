package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams

/** Streaming forms produce the same answers as their batch twins. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  // the testdata's events.ts has shifted types across driver versions
  // (long nanos under nanosAsLong; TIMESTAMP_NTZ micros today) — dispatch
  // on the actual schema instead of assuming one encoding
  private def normTs(df: org.apache.spark.sql.DataFrame) =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  private def events =
    normTs(spark.read.parquet(s"$sf0001/events.parquet"))

  test("streaming tumbling window equals batch tumbling (complete mode)") {
    // take the stream schema from the file itself so the batch and
    // stream sides agree whatever encoding the driver wrote
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    // the file stream source needs a directory, not a single file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = normTs(spark.readStream.schema(schema)
      .parquet(dir.toString))
    val q = EventStreams.tumbling(stream, "1 hour")
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val want = ops.Events.tumbling(events, col("ts"), "1 hour")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("streaming windowed approx-distinct equals the batch sketch") {
    // distinct users per hourly window: exact countDistinct is not
    // available under streaming aggregation, approx_count_distinct is
    // — and the HLL++ sketch is deterministic, so stream == batch
    // exactly on identical rows
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_acd")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = normTs(spark.readStream.schema(schema)
      .parquet(dir.toString))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id")).as("u"))
      .select(col("window.start").as("ws"), col("u"))
    val q = agg.writeStream.format("memory").queryName("acd")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("acd").collect().map(_.toSeq).toSet
    val want = events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(approx_count_distinct(col("user_id")).as("u"))
      .select(col("window.start").as("ws"), col("u"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("streaming count-min grid equals the batch sketch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val occ = Seq.tabulate(300)(i => (s"s${i % 3}", s"w${i % 17}"))
    val batch = ops.Sketches.countMin(occ.toDF("g", "it"),
        col("g"), col("it"), depth = 3, width = 8)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    val ms = MemoryStream[(String, String)]
    val q = EventStreams.countMinStream(ms.toDS().toDF("g", "it"),
        col("g"), col("it"), depth = 3, width = 8)
      .writeStream.format("memory").queryName("cm_grid")
      .outputMode("complete").start()
    try {
      ms.addData(occ.take(100): _*)
      q.processAllAvailable()
      ms.addData(occ.drop(100): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cm_grid").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(got == batch)
  }

  test("streaming dedup keeps one row per key within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val stream = ms.toDS().toDF("k", "ts")
    val q = graft.streaming.EventStreams
      .dedupStream(stream, Seq("k"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      ms.addData((1L, t(0)), (1L, t(1)), (2L, t(0)))  // dup of k=1
      q.processAllAvailable()
      ms.addData((1L, t(2)), (3L, t(3)))              // still in horizon
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("deduped").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L)) // exactly one row per key
  }

  test("streaming doc curation matches the batch funnel's keep set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    // real corpus docs + one planted PII doc, fed across two batches
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(60)
    val pii = (9000L,
      "the and is of a table row scan contact bob@example.com now " +
      "the and is of a table row scan value key part merge sort")
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = ms.toDS().toDF("doc_id", "text", "ts")
    val q = EventStreams.curateDocStream(stream, lang = "en",
        minQualityX1e4 = 3000L, dedupPrefixTokens = 8)
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      ms.addData(docs.take(30).map { case (i, s) => (i, s, t(0)) }.toSeq: _*)
      q.processAllAvailable()
      ms.addData((docs.drop(30).map { case (i, s) => (i, s, t(1)) }
        :+ ((pii._1, pii._2, t(1)))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("curated")
    // PII is scrubbed in the emitted text
    val piiRows = got.filter(col("doc_id") === 9000L)
      .select("clean_text").collect()
    if (piiRows.nonEmpty) {
      assert(piiRows.head.getString(0).contains("<EMAIL>"))
      assert(!piiRows.head.getString(0).contains("bob@example.com"))
    }
    // the batch funnel over the same rows: same lang/quality gates,
    // same prefix-dedup KEY SET (keep policy differs: arrival vs min
    // id — compare the set of surviving prefix keys, which is policy-
    // invariant, and that each key survives exactly once)
    val all = (docs :+ ((pii._1, pii._2))).toSeq.toDF("doc_id", "text")
    val batch = ops.Pipeline(all, "doc_id", "text")
      .filterLang("en").filterQuality(3000L).dedupExactByPrefix(8)
      .result
    def keyOf = concat_ws(" ", slice(split(col("text"), " "), 1, 8))
    val wantKeys = batch.select(keyOf).collect().map(_.getString(0)).toSet
    val gotIds = got.select("doc_id").collect().map(_.getLong(0))
    assert(gotIds.length == gotIds.distinct.length)
    val gotKeys = all.join(got.select("doc_id"), "doc_id")
      .select(keyOf).collect().map(_.getString(0)).toSet
    assert(gotKeys == wantKeys)
    assert(gotIds.length == wantKeys.size)
  }

  test("streaming warc demux + extraction equals the batch funnel") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(50).select("doc_id", "text")
    val warcs = ops.Warc.synthWarc(docs, col("doc_id"), col("text"),
        recordsPerFile = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val ms = MemoryStream[(Long, Array[Byte])]
    val stream = ms.toDS().toDF("file_id", "warc")
    val recs = EventStreams.warcDemuxStream(stream, "file_id", "warc")
      .filter(col("warc_type") === "response")
      .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("body"))
    val q = EventStreams.htmlExtractStream(recs, "doc_id", "body")
      .writeStream.format("memory").queryName("warcx")
      .outputMode("append").start()
    try {
      ms.addData(warcs.take(3).toSeq: _*)
      q.processAllAvailable()
      ms.addData(warcs.drop(3).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("warcx")
      .select("doc_id", "text", "n_kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val pages = ops.Html.synthHtml(docs, col("doc_id"), col("text"))
    val want = ops.Html.extractTextDf(pages, "page_id", "html")
      .select(col("page_id"), col("text"), col("n_kept")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.size == 50)
  }

  test("streaming mjpeg frame hashes equal the batch op, corrupt " +
       "frames skipped on both sides") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ids = spark.range(20).select(col("id").as("doc_id"))
    val vids = ops.Mp4.synthMjpegMp4(ids, "doc_id")
    val blobs = vids.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val ms = MemoryStream[(Long, Array[Byte])]
    val stream = ms.toDS().toDF("asset_id", "media")
    val q = EventStreams.mjpegFrameHashStream(stream, "asset_id", "media")
      .writeStream.format("memory").queryName("mjpegx")
      .outputMode("append").start()
    try {
      ms.addData(blobs.take(7).toSeq: _*)
      q.processAllAvailable()
      ms.addData(blobs.drop(7).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))
    val got = spark.table("mjpegx").collect().map(key).toSet
    val want = ops.Mp4.mjpegFrameHashesDf(vids, "asset_id", "media")
      .collect().map(key).toSet
    assert(got == want)
    // ids 3, 10, 17 carry the truncated frame: one fewer row each
    assert(want.size ==
      (0L until 20L).map(i => (3 + i % 4) - (if (i % 7 == 3) 1 else 0)).sum)
  }

  test("streaming html extraction equals the batch keep set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(60).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pagesOf = (rows: Seq[(Long, String)]) =>
      ops.Html.synthHtml(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
    val htmls = pagesOf(docs.toSeq).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDS().toDF("page_id", "html")
    // h1 + link para are always kept (2) and every doc ≥ 47 chars has
    // a kept first chunk — gate at 5 so only ≥3-chunk docs survive
    val q = EventStreams.htmlExtractStream(stream, "page_id", "html",
        minKeptBlocks = 5)
      .writeStream.format("memory").queryName("htmlx")
      .outputMode("append").start()
    try {
      ms.addData(htmls.take(30).toSeq: _*)
      q.processAllAvailable()
      ms.addData(htmls.drop(30).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("htmlx")
      .select("page_id", "text", "n_kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = ops.Html.extractTextDf(pagesOf(docs.toSeq),
        "page_id", "html")
      .filter(col("n_kept") >= 5)
      .select("page_id", "text", "n_kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < docs.length) // gate bites
  }

  test("streaming containment screen matches the batch fp join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // corpus = even ids (static index), stream = odd ids in two batches
    val corpus = docs.filter(_._1 % 2 == 0).toSeq.toDF("doc_id", "text")
    val corpusIx = ops.TextAnalysis.winnowFingerprints(
      corpus, col("doc_id"), col("text"))
    val odd = docs.filter(_._1 % 2 == 1)
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDS().toDF("doc_id", "text")
    val q = EventStreams.containmentScreenStream(stream, col("doc_id"),
        col("text"), corpusIx, col("doc_id"), col("fp"))
      .writeStream.format("memory").queryName("screen")
      .outputMode("append").start()
    try {
      ms.addData(odd.take(20).toSeq: _*)
      q.processAllAvailable()
      ms.addData(odd.drop(20).take(20).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("screen")
      .select("doc_id", "fp", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = odd.take(40).toSeq.toDF("doc_id", "text")
    val want = ops.TextAnalysis.winnowFingerprints(
        streamed, col("doc_id"), col("text"))
      .join(corpusIx.select(col("doc_id").as("corpus_id"), col("fp")),
        "fp")
      .select("doc_id", "fp", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty) // the corpus plants near-dups across parity
  }

  test("streaming DSIR gate keeps exactly the batch gate's docs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val tgt = d.filter(col("source") === "src0")
    val model = ops.TextAnalysis.dsirModel(
      d, col("text"), tgt, col("text"))
    // threshold at the median so the gate splits nontrivially
    val scored = ops.TextAnalysis.dsirWeights(
        d, col("doc_id"), col("text"), tgt, col("text"))
      .select("doc_id", "w_micro_sum", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val means = scored.map(t => t._2.toDouble / t._3).sorted
    val thr = math.floor(means(means.length / 2)).toLong
    val want = scored.filter(t => t._2 >= thr * t._3).map(_._1).toSet
    assert(want.nonEmpty && want.size < scored.length)
    val docs = d.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)]
    val q = EventStreams.dsirGateStream(
        ms.toDS().toDF("doc_id", "text"), model, thr)
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append").start()
    try {
      ms.addData(docs.take(200).toSeq: _*)
      q.processAllAvailable()
      ms.addData(docs.drop(200).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dsir_gate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("streaming curation dedups on the SCRUBBED prefix") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // identical docs except the email inside the 8-token prefix: after
    // redaction both prefixes are "contact <EMAIL> about the a of is",
    // so they must collide; raw-text keying would keep both
    val tail = "the a of is and to in row scan table value part merge"
    val d1 = (1L, s"contact alice@example.com about the a of is $tail", t0)
    val d2 = (2L, s"contact bob@other.org about the a of is $tail", t0)
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.curateDocStream(
        ms.toDS().toDF("doc_id", "text", "ts"), lang = "en",
        minQualityX1e4 = 0L, dedupPrefixTokens = 8)
      .writeStream.format("memory").queryName("scrubdedup")
      .outputMode("append").start()
    try { ms.addData(d1, d2); q.processAllAvailable() } finally q.stop()
    val got = spark.table("scrubdedup").select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    assert(got.length == 1, s"scrubbed prefixes must collide: $got")
  }

  test("stream-static broadcast dim join enriches micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val ms = MemoryStream[Long]
    val enriched = graft.ops.Relational.joinDim(
      ms.toDS().toDF("user_id"), dim, col("user_id") === col("c_custkey"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      ms.addData(0L, 1L, 2L); q.processAllAvailable()
      ms.addData(3L); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enriched").collect()
    assert(got.length == 4)
    assert(got.forall(r => r.getAs[String]("c_mktsegment") != null))
  }

  test("hash split / stratified sampling run unchanged on a stream") {
    // the deterministic curation layer is stateless + narrow, so the
    // SAME operators run under Structured Streaming with no rework —
    // and, being pure functions of the id, a row's assignment on the
    // stream equals its assignment in batch
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Long]
    val split = graft.ops.Sampling.hashSplit(
      ms.toDS().toDF("doc_id"), col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.2))
    val q = split.writeStream.format("memory").queryName("ssplit")
      .outputMode("append").start()
    try {
      ms.addData(0L to 99L: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ssplit").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = graft.ops.Sampling.hashSplit(
      (0L to 99L).toDF("doc_id"), col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.2)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
    assert(streamed.values.toSet == Set("train", "val"))
  }

  test("streaming video frame sampling equals the batch decode") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // synthesize containers in batch, stream the (id, bytes) tuples
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).limit(20)
    val vids = graft.ops.Multimodal.synthVideo(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val ms = MemoryStream[(Long, Array[Byte])]
    val out = graft.ops.Multimodal.sampleFrameStatsTyped(
      ms.toDS(), stride = 2)
    val q = out.writeStream.format("memory").queryName("vframes")
      .outputMode("append").start()
    try {
      ms.addData(vids.take(10).toSeq); q.processAllAvailable()
      ms.addData(vids.drop(10).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("vframes").collect().map(_.toSeq).toSet
    val want = graft.ops.Multimodal.sampleFrameStatsDf(
        graft.ops.Multimodal.synthVideo(docs, "doc_id"),
        "asset_id", "media", stride = 2)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming OHLC bars equal the batch resample (complete mode)") {
    // min_by/max_by are mergeable aggregates, so the SAME ohlcBars
    // call runs as a streaming aggregation — bars finalize identically
    // however the rows were micro-batched
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft_ohlc_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = normTs(spark.readStream.schema(schema)
      .parquet(dir.toString))
    val q = EventStreams.ohlcBarsStream(stream, "1 hour")
      .writeStream.format("memory").queryName("ohlc")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ohlc").collect().map(_.toSeq).toSet
    val want = ops.Events.ohlcBars(events, col("ts"), col("event_id"),
        col("value")).collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming LSH screen matches the batch between-index pairs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // "standing corpus" = even ids; "arriving batch" = odd ids
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val idx = graft.ops.Dedup.minhashIndex(
      corpus, col("doc_id"), col("text")).localCheckpoint()
    val batchRows = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)]
    val screen = EventStreams.lshScreenStream(
      ms.toDS().toDF("doc_id", "text"),
      col("doc_id"), col("text"), idx, tau = 0.6)
    val q = screen.writeStream.format("memory").queryName("lshscreen")
      .outputMode("append").start()
    try {
      ms.addData(batchRows.take(batchRows.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(batchRows.drop(batchRows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // evidence rows collapse to distinct verified pairs = the batch op
    val got = spark.table("lshscreen")
      .select("id1", "id2", "jaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batchIx = graft.ops.Dedup.minhashIndex(
      docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"))
    val want = graft.ops.Dedup.minhashLshPairsBetween(batchIx, idx,
        tau = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming IVF-PQ ANN equals batch ivfPqTopK at nProbe = 1") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (cents, books, packed) = graft.ops.Similarity.ivfPqPack(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    val idx = packed.localCheckpoint()
    val queryRows = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])]
    val ann = EventStreams.pqAnnStream(
      ms.toDS().toDF("vec_id", "embedding"), cents, books, idx,
      col("vec_id"), col("embedding"), k = 5)
    val q = ann.writeStream.format("memory").queryName("pqann")
      .outputMode("append").start()
    try {
      ms.addData(queryRows.take(4).toSeq); q.processAllAvailable()
      ms.addData(queryRows.drop(4).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("pqann")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    // the batch twin retrains on the same corpus with the same coarse
    // centroids, so codebooks — and the full ranking — are identical
    val want = graft.ops.Similarity.ivfPqTopK(
        corpus, corpus.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 5, nLists = 8, nProbe = 1, trainedCoarse = Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming KMV sketch equals the batch sketch across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderpriority"), col("o_custkey"))
    val rows = o.collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val ms = MemoryStream[(String, Long)]
    val sk = EventStreams.kmvSketchStream(
      ms.toDS().toDF("pri", "cust"), col("pri"), col("cust"), k = 64)
    val q = sk.writeStream.format("memory").queryName("kmvsk")
      .outputMode("complete").start()
    try {
      // batch boundaries must not matter: bottom-k-of-union is
      // associative and commutative
      ms.addData(rows.take(rows.length / 3).toSeq)
      q.processAllAvailable()
      ms.addData(rows.drop(rows.length / 3).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("kmvsk").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = graft.ops.Sketches.kmvSketch(o,
        Seq(col("o_orderpriority")), col("o_custkey"), 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming ANN equals batch ivfTopK at nProbe = 1") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (centroids, packed) = graft.ops.Similarity.ivfPack(
      corpus, col("vec_id"), col("embedding"), nLists = 8)
    // the index is the reusable artifact: materialize once, probe
    // every micro-batch against the same frame
    val idx = packed.localCheckpoint()
    val queryRows = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])]
    val ann = EventStreams.annTopKStream(
      ms.toDS().toDF("vec_id", "embedding"), centroids, idx,
      col("vec_id"), col("embedding"), k = 5)
    val q = ann.writeStream.format("memory").queryName("ann")
      .outputMode("append").start()
    try {
      // two micro-batches: results must accumulate query by query
      ms.addData(queryRows.take(4).toSeq); q.processAllAvailable()
      ms.addData(queryRows.drop(4).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ann")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val want = graft.ops.Similarity.ivfTopK(
        corpus, corpus.filter(col("vec_id") < 10),
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 5, nLists = 8, nProbe = 1, trained = Some(centroids))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("stream-stream interval join matches within the time bound only") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = EventStreams.intervalJoin(
      clicks.toDS().toDF("k", "cts"),
      views.toDS().toDF("k", "vts"),
      key = "k", leftTs = "cts", rightTs = "vts",
      before = "5 minutes", after = "0 minutes",
      watermark = "30 minutes")
    val q = joined.select(col("k"), col("cts"), col("vts"))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // view at t3 within 5 min before click t5: match. view at t20:
      // outside. key 2's view has no click: no row. events split across
      // micro-batches to prove buffered-state matching.
      views.addData((1L, t(3)), (1L, t(20)), (2L, t(4)))
      q.processAllAvailable()
      clicks.addData((1L, t(5)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2))).toSet
    assert(got == Set((1L, t(3))), got.mkString(","))
  }

  test("outer interval join emits unmatched rows after the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val reqs = MemoryStream[(Long, java.sql.Timestamp)]
    val resps = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = EventStreams.intervalJoinLeftOuter(
      reqs.toDS().toDF("k", "rts"),
      resps.toDS().toDF("k", "sts"),
      key = "k", leftTs = "rts", rightTs = "sts",
      before = "0 minutes", after = "5 minutes",
      watermark = "10 minutes")
    val q = joined.select(col("k"), col("rts"), col("sts"))
      .writeStream.format("memory").queryName("ssouter")
      .outputMode("append").start()
    try {
      // request 1 answered at t2; request 2 never answered
      reqs.addData((1L, t(0)), (2L, t(0)))
      resps.addData((1L, t(2)))
      q.processAllAvailable()
      // advance BOTH watermarks far past t0+5min+10min so Spark can
      // prove request 2 is unmatchable and release the null row
      reqs.addData((9L, t(60)))
      resps.addData((9L, t(60)))
      q.processAllAvailable()
      reqs.addData((9L, t(120)))
      resps.addData((9L, t(120)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssouter").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toSet
    assert(got.contains((1L, Some(t(2)))), got.mkString(","))
    assert(got.contains((2L, None)),
      s"unanswered request must emit null-padded: ${got.mkString(",")}")
  }

  test("streaming funnel equals the batch funnel on an in-order feed") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stages = Seq("signup", "view", "click", "purchase")
    val evs = events
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"),
              col("event_type"))
      .as[EventStreams.FEv]
      .collect().sortBy(e => (e.tsSec, e.user_id))
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[EventStreams.FEv]
    val q = EventStreams.funnelStages(ms.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    // completed-stage count is monotone: latest update = max
    val got = spark.table("funnel_stream")
      .groupBy("user_id").agg(max("completed").as("completed"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // batch funnel on the SAME second-granularity data
    val batchIn = evs.toSeq.toDF("user_id", "tsSec", "event_type")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
    val want = ops.Events.funnel(batchIn, col("user_id"), col("ts"),
        col("event_type"), stages)
      .collect().map { r =>
        val n = (1 to 4).count(i => !r.isNullAt(i))
        r.getLong(0) -> n }.toMap
    // batch emits only stage-1 completers; streaming tracks everyone
    want.foreach { case (u, n) => assert(got(u) == n, s"user $u") }
    got.foreach { case (u, n) =>
      if (!want.contains(u)) assert(n == 0, s"user $u never signed up") }
    assert(want.nonEmpty)
  }

  test("streaming upsert keeps the latest state, late changes ignored") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val batch1 = Seq(
      EventStreams.Chg(1L, 10L, "a1", deleted = false),
      EventStreams.Chg(2L, 10L, "b1", deleted = false),
      EventStreams.Chg(1L, 20L, "a2", deleted = false))
    val batch2 = Seq(
      EventStreams.Chg(1L, 15L, "a-late", deleted = false), // older ts
      EventStreams.Chg(2L, 30L, "b2", deleted = true),      // tombstone
      EventStreams.Chg(3L, 5L, "c1", deleted = false))

    val ms = MemoryStream[EventStreams.Chg]
    val q = EventStreams.upsertLatestStream(ms.toDS())
      .writeStream.format("memory").queryName("current_state")
      .outputMode("update").start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    // final state = the max-ts_sec row per key across all updates
    val got = spark.table("current_state")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(desc("ts_sec"))))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // driver reference: fold every change in ts order
    val want = (batch1 ++ batch2).groupBy(_.key).map { case (k, cs) =>
      val last = cs.maxBy(_.tsSec)
      (k, if (last.deleted) null else last.value)
    }.toSet
    assert(got == want)
    assert(got == Set((1L, "a2"), (2L, null), (3L, "c1")))
  }

  test("stateful sessionization carries state across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = events
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"))
      .as[EventStreams.Ev]
      .collect().sortBy(_.tsSec)
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionCounts(ms.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    // latest update per user = final state
    val got = spark.table("sessions")
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = ops.Events.sessionStats(events, col("user_id"), col("ts"), 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming EWMA equals the batch fold bit-for-bit; stale dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"),
              col("event_id").as("order"), col("value").as("v"))
      .as[EventStreams.VEv]
      .collect().sortBy(e => (e.tsSec, e.order))
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[EventStreams.VEv]
    val q = EventStreams.ewmaStream(ms.toDS(), alphaNum = 1, alphaDen = 5)
      .writeStream.format("memory").queryName("ewma")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
      // a stale replay of batch-1 events must change NOTHING: every one
      // is at or behind its user's high-water mark
      ms.addData(first.take(50).toSeq); q.processAllAvailable()
    } finally q.stop()

    // latest update per user (n monotone) = final state; round like the
    // batch surface does
    val got = spark.table("ewma")
      .groupBy("user_id")
      .agg(max_by(col("ewma"), col("n_events")).as("ewma"),
           max("n_events").as("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
                 BigDecimal(r.getDouble(1)).setScale(6,
                   BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    // batch on second-truncated timestamps so both sides fold the same
    // (tsSec, event_id) order
    val batchIn = events.withColumn("ts",
      timestamp_seconds(unix_timestamp(col("ts"))))
    val want = ops.Events.ewmaFinal(batchIn, col("user_id"), col("ts"),
        col("event_id"), col("value"), 1, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
  }

  test("streaming forward fill equals the batch fill across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // plant the q350 nulls: every 'click' loses its value
    val evs = events
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"),
              col("event_id").as("order"),
              when(col("event_type") === "click", lit(null))
                .otherwise(col("value")).as("v"))
      .as[EventStreams.NEv]
      .collect().sortBy(e => (e.tsSec, e.order))
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[EventStreams.NEv]
    val q = EventStreams.forwardFillStream(ms.toDS())
      .writeStream.format("memory").queryName("ffill")
      .outputMode("append").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val got = asMap(spark.table("ffill").select("order", "v_filled"))
    val batchIn = events
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("ts"),
        when(col("event_type") === "click", lit(null))
          .otherwise(col("value")).as("v"))
    val want = asMap(ops.Events.forwardFill(batchIn, col("user_id"),
        col("ts"), col("event_id"), Seq("v"))
      .select("event_id", "v"))
    assert(got == want)
    assert(got.size == evs.length) // append mode: one row per event
  }

  test("streaming token bucket equals the batch replay across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = events
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"),
              col("event_id").as("order"), lit(0.0).as("v"))
      .as[EventStreams.VEv]
      .collect().sortBy(e => (e.tsSec, e.order))
    val (first, second) = evs.splitAt(evs.length / 2)

    val ms = MemoryStream[EventStreams.VEv]
    val q = EventStreams.tokenBucketStream(ms.toDS(),
        capacity = 3000000L, refillPerSec = 100L, cost = 1000000L)
      .writeStream.format("memory").queryName("tbucket")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("tbucket")
      .groupBy("user_id")
      .agg(max("n_events").as("n"),
           max_by(col("n_admitted"), col("n_events")).as("adm"),
           max_by(col("final_tokens"), col("n_events")).as("tok"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = ops.Events.tokenBucketAudit(events, col("user_id"),
        col("ts"), col("event_id"), 3000000L, 100L, 1000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got == want)
  }

  test("native session_window agg streams: state merges across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // one session split across micro-batches must MERGE (the
    // incremental-state property the window-id sessionize cannot
    // stream); a later event past the gap opens a second session
    val mk = (u: Long, sec: Long) => (u, new java.sql.Timestamp(sec * 1000))
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.ops.Events.sessionAgg(
        ms.toDS().toDF("u", "ts"), col("u"), col("ts"), gapSeconds = 100L)
      .writeStream.format("memory").queryName("sess_native")
      .outputMode("complete").start()
    try {
      ms.addData(mk(1L, 1000L), mk(1L, 1050L))
      q.processAllAvailable()
      // batch 2: 1090 extends the same session (within gap of 1050);
      // 5000 starts a new one
      ms.addData(mk(1L, 1090L), mk(1L, 5000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_native").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getLong(3))).toSet
    // session_end = last event + gap (session_window convention)
    assert(got == Set((1L, 1000L, 1190L, 3L), (1L, 5000L, 5100L, 1L)),
      got.mkString(","))
  }

  test("transformWithState state survives a QUERY RESTART from " +
       "checkpoint (RocksDB changelog checkpointing)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProv = spark.conf.getOption(provKey)
    val prevClog = spark.conf.getOption(clogKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(clogKey, "true")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_tws_restart").toString
    try {
      // the SAME MemoryStream feeds both query incarnations — the
      // checkpoint records its offsets, so the restarted query resumes
      // exactly after batch 1 and must FOLD ONTO the persisted state,
      // not re-derive it (durability, not just cross-batch liveness).
      // Sink: the memory sink refuses checkpoint recovery, so the
      // emissions land through foreachBatch + the idempotent batch
      // writer — the recoverable-sink recipe the ingest ops document.
      val out = java.nio.file.Files
        .createTempDirectory("graft_tws_out").toString
      val ms = MemoryStream[EventStreams.VEv]
      def start() = EventStreams.runningStatsStream(ms.toDS())
        .writeStream
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[EventStreams.UserStats],
           id: Long) =>
            graft.sources.Sources.idempotentBatchWriter(out)(ds.toDF(), id)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      try {
        ms.addData(EventStreams.VEv(1L, 100L, 1L, 10.0),
                   EventStreams.VEv(1L, 200L, 2L, 2.5))
        q1.processAllAvailable()
      } finally q1.stop()
      // process death simulated by the stop; data lands while down
      ms.addData(EventStreams.VEv(1L, 300L, 3L, 40.0),
                 EventStreams.VEv(2L, 100L, 4L, 7.0))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      // the LAST emission per user must carry the full fold (user 1:
      // n=3 across the restart boundary) — state came back from the
      // checkpoint, not from reprocessing batch 1
      val got = graft.sources.Sources.readPublishedBatches(spark, out)
        .groupBy("user_id")
        .agg(max_by(struct(col("n"), col("sum_cents"), col("max_cents")),
          col("n")).as("s"))
        .collect()
        .map(r => r.getLong(0) -> {
          val s = r.getStruct(1)
          (s.getLong(0), s.getLong(1), s.getLong(2)) }).toMap
      assert(got(1L) == ((3L, 5250L, 4000L)),
        s"state did not survive the restart: $got")
      assert(got(2L) == ((1L, 700L, 700L)))
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
      prevClog match {
        case Some(v) => spark.conf.set(clogKey, v)
        case None => spark.conf.unset(clogKey)
      }
    }
  }

  test("transformWithState running stats carry RocksDB state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // transformWithState's contract: RocksDB provider only
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Seq(
        EventStreams.VEv(1L, 100L, 1L, 10.0),
        EventStreams.VEv(1L, 200L, 2L, 2.5),
        EventStreams.VEv(2L, 100L, 3L, 7.0),
        EventStreams.VEv(1L, 300L, 4L, 40.0))
      val ms = MemoryStream[EventStreams.VEv]
      val q = EventStreams.runningStatsStream(ms.toDS())
        .writeStream.format("memory").queryName("runstats")
        .outputMode("update").start()
      try {
        ms.addData(evs.take(2)); q.processAllAvailable()
        ms.addData(evs.drop(2)); q.processAllAvailable()
      } finally q.stop()
      // latest emission per user must fold ALL batches: state survived
      val got = spark.table("runstats")
        .groupBy("user_id")
        .agg(max_by(struct(col("n"), col("sum_cents"), col("max_cents")),
          col("n")).as("s"))
        .collect()
        .map(r => r.getLong(0) -> {
          val s = r.getStruct(1)
          (s.getLong(0), s.getLong(1), s.getLong(2)) }).toMap
      assert(got(1L) == ((3L, 5250L, 4000L)))
      assert(got(2L) == ((1L, 700L, 700L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming capped sessions equal the batch fold across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = events.filter(col("value").isNotNull)
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("tsSec"),
        col("event_id").as("order"), col("value").as("v"))
      .as[EventStreams.VEv]
      .collect().sortBy(e => (e.tsSec, e.order))
    val (first, second) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[EventStreams.VEv]
    val q = EventStreams.cappedSessionStream(ms.toDS(),
        gapSec = 1800L, capSec = 7200L)
      .writeStream.format("memory").queryName("capsess")
      .outputMode("update").start()
    try {
      ms.addData(first.toSeq); q.processAllAvailable()
      ms.addData(second.toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("capsess")
      .groupBy("user_id")
      .agg(max("n_events").as("ne"),
           max_by(col("n_sessions"), col("n_events")).as("ns"),
           max_by(col("longest_sec"), col("n_events")).as("ls"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = ops.Events.sessionStatsCapped(
        events.filter(col("value").isNotNull),
        col("user_id"), col("ts"), col("event_id"), 1800L, 7200L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("query metrics listener records per-batch rows and state size") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val listener = new graft.streaming.QueryMetricsListener()
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[(String, String)]
      val q = EventStreams.countMinStream(ms.toDS().toDF("g", "it"),
          col("g"), col("it"), depth = 3, width = 8)
        .writeStream.format("memory").queryName("metered")
        .outputMode("complete").start()
      try {
        ms.addData(("a", "x"), ("a", "y")); q.processAllAvailable()
        ms.addData(("b", "z")); q.processAllAvailable()
      } finally q.stop()
      // progress events are delivered asynchronously post-batch
      val deadline = System.nanoTime() + 10_000_000_000L
      def mine() = listener.batches.filter(_.queryName == "metered")
      while (mine().map(_.inputRows).sum < 3 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      val b = mine()
      assert(b.map(_.inputRows).sum == 3, b.mkString(","))
      assert(b.forall(_.durationMs >= 0))
      // the count-min grid keeps aggregation state: visible rows > 0
      assert(b.exists(_.stateRows > 0), b.mkString(","))
      val df = listener.toDF(spark)
        .filter(col("query_name") === "metered")
      assert(df.agg(sum("input_rows")).head.getLong(0) == 3L)
    } finally spark.streams.removeListener(listener)
  }

  test("v2 timers emit sessions exactly when they close") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(Long, Long)]
      val typed = ms.toDS().toDF("user_id", "tsSec")
        .withColumn("ts", timestamp_seconds(col("tsSec")))
        .withWatermark("ts", "0 seconds")
        .as[EventStreams.Ev]
      val q = EventStreams.closedSessionsStream(typed, gapSec = 100L)
        .writeStream.format("memory").queryName("closed_sess")
        .outputMode("append").start()
      try {
        // session A: events at 1000, 1050 — still open after batch 1
        ms.addData((1L, 1000L), (1L, 1050L))
        q.processAllAvailable()
        assert(spark.table("closed_sess").count() == 0,
          "open session must hold its peace")
        // watermark jumps to 5000 via another user's event: session A's
        // timer (1150) fires — exactly one closed row, user 2 still open
        ms.addData((2L, 5000L))
        q.processAllAvailable()
        ms.addData((2L, 9000L)) // closes nothing yet; advances watermark
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("closed_sess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // user 1's session closed by TIMER; user 2's first session closed
      // in-stream by the 9000 event's gap-exceeding arrival or timer
      assert(got.contains((1L, 1000L, 1050L, 2L)), got.mkString(","))
      assert(got.contains((2L, 5000L, 5000L, 1L)), got.mkString(","))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming phash screen matches the batch between-pairs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val bases = Array.fill(10)(rnd.nextLong())
    def fp(k: Int) = {
      val b = bases(k % 10)
      (((b >>> 32) ^ (k % 3)) & 0xffffffffL,
       (b & 0xffffffffL) ^ ((k % 2).toLong << 9) & 0xffffffffL)
    }
    val index = (0 until 40).map(k => (k.toLong, fp(k)._1, fp(k)._2))
      .toDF("asset_id", "hash_hi", "hash_lo")
    val probes = (100 until 130).map(k =>
      (k.toLong, fp(k)._1, fp(k)._2))
    val batch = graft.ops.Dedup.hammingPairs64Between(
        probes.toDF("id", "hi", "lo"), col("id"), col("hi"), col("lo"),
        index, col("asset_id"), col("hash_hi"), col("hash_lo"),
        maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(batch.nonEmpty)
    val ms = MemoryStream[(Long, Long, Long)]
    val q = EventStreams.phashScreenStream(
        ms.toDS().toDF("id", "hi", "lo"), col("id"), col("hi"),
        col("lo"), index, maxDist = 5)
      .writeStream.format("memory").queryName("phash_screen")
      .outputMode("append").start()
    try {
      ms.addData(probes.take(15): _*)
      q.processAllAvailable()
      ms.addData(probes.drop(15): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("phash_screen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch)
  }

  test("streaming heavy hitters equals batch at exact capacity") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // 11 distinct items, capacity 16 >= distinct: the SpaceSaving
    // summary is exact, so stream == batch independent of where the
    // micro-batch boundary lands (and of partitioning merge order)
    val occ = Seq.tabulate(400)(i => (s"g${i % 2}", s"w${i % 11}"))
    val batch = ops.Sketches.heavyHitters(occ.toDF("g", "it"),
        Seq(col("g")), col("it"), k = 5, capacity = 16)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3))).toSet
    val ms = MemoryStream[(String, String)]
    val q = EventStreams.heavyHittersStream(ms.toDS().toDF("g", "it"),
        col("g"), col("it"), k = 5, capacity = 16)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      ms.addData(occ.take(150): _*)
      q.processAllAvailable()
      ms.addData(occ.drop(150): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hh_stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getLong(3))).toSet
    assert(got == batch)
    assert(got.forall(_._4 == 0L), "exact capacity means zero error")
  }

  test("sharded-table streaming sink: batches become append " +
       "snapshots; readback is the union; versions monotone") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.sources.Sources
    val path = java.nio.file.Files
      .createTempDirectory("graft_shstream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_shstream_ck").toString
    val ms = MemoryStream[(Long, String)]
    val q = EventStreams.shardedTableSink(
      ms.toDS().toDF("doc_id", "t"), col("doc_id"), col("doc_id"),
      path, numShards = 2, statsCols = Seq("doc_id"), checkpoint = ckpt)
    try {
      ms.addData((0 until 40).map(i => (i.toLong, s"d$i")): _*)
      q.processAllAvailable()
      ms.addData((40 until 70).map(i => (i.toLong, s"d$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(Sources.shardedVersions(spark, path) == Seq(1L, 2L))
    assert(Sources.committedBatchIds(spark, path) == Set(0L, 1L))
    val got = Sources.readShardedTable(spark, path)
      .select("doc_id", "t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == (0 until 70).map(i => (i.toLong, s"d$i")))
    // pruned read hits only the second batch's data dir
    val hit = Sources.readShardedTable(spark, path,
        preds = Seq(("doc_id", 55L, 69L)))
      .inputFiles.map(f => f.split("/").find(_.startsWith("data-v")).get
        .split('-').take(2).mkString("-")).toSet
    assert(hit == Set("data-v2"))
    Sources.dropShardedTable(spark, path)
  }

  test("sharded-table streaming sink is exactly-once across a crash " +
       "AFTER the manifest commit: the replayed batch is skipped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.sources.Sources
    val path = java.nio.file.Files
      .createTempDirectory("graft_shcrash").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_shcrash_ck").toString
    val ms = MemoryStream[(Long, String)]
    // crash INJECTION: batch 1's first attempt dies after the sink
    // committed its manifest — the worst replay case (data published,
    // offset not yet recorded), where a non-idempotent sink duplicates
    @volatile var crashOnce = true
    def start() = ms.toDS().toDF("doc_id", "t").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Sources.shardedTableSinkBatch(b, id, col("doc_id"),
          col("doc_id"), path, 2, Seq("doc_id"))
        if (id == 1L && crashOnce) {
          crashOnce = false
          throw new RuntimeException("injected crash after commit")
        }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    ms.addData((0 until 20).map(i => (i.toLong, s"d$i")): _*)
    q1.processAllAvailable()
    ms.addData((20 until 35).map(i => (i.toLong, s"d$i")): _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    // restart: Structured Streaming REPLAYS batch 1 (its offsets were
    // never committed) — the sink must skip it (batch_id already in
    // the manifest), then keep appending fresh batches
    val q2 = start()
    try {
      q2.processAllAvailable()
      ms.addData((35 until 50).map(i => (i.toLong, s"d$i")): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = Sources.readShardedTable(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 50L), // NO duplicates from the replay
      s"replay duplicated rows: ${got.size} rows")
    assert(Sources.shardedVersions(spark, path) == Seq(1L, 2L, 3L))
    assert(Sources.committedBatchIds(spark, path) == Set(0L, 1L, 2L))
    Sources.dropShardedTable(spark, path)
  }

  test("sharded-table streaming MERGE sink: upserts across batches, " +
       "last writer wins, crash replay is exactly-once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.sources.Sources
    val path = java.nio.file.Files
      .createTempDirectory("graft_shmstream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_shmstream_ck").toString
    val ms = MemoryStream[(Long, String)]
    @volatile var crashOnce = true
    def start() = ms.toDS().toDF("doc_id", "t").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Sources.shardedTableMergeSinkBatch(b, id, "doc_id",
          col("doc_id"), path, 2, Seq("doc_id"))
        if (id == 1L && crashOnce) {
          crashOnce = false
          throw new RuntimeException("injected crash after commit")
        }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    ms.addData((0 until 30).map(i => (i.toLong, s"a$i")): _*)
    q1.processAllAvailable()
    // batch 1 UPDATES keys 10..24 and inserts 30..39, then crashes
    // after its manifest committed
    ms.addData(((10 until 25) ++ (30 until 40))
      .map(i => (i.toLong, s"b$i")): _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    val q2 = start()
    try {
      q2.processAllAvailable() // replays batch 1: must be a no-op
      ms.addData((20 until 35).map(i => (i.toLong, s"c$i")): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = Sources.readShardedTable(spark, path)
      .select("doc_id", "t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 40) // one row per key, never a duplicate
    assert((0L until 10L).forall(k => got(k) == s"a$k"))
    assert((10L until 20L).forall(k => got(k) == s"b$k"))
    assert((20L until 35L).forall(k => got(k) == s"c$k")) // last wins
    assert((35L until 40L).forall(k => got(k) == s"b$k"))
    Sources.dropShardedTable(spark, path)
  }

  test("MAINTAINED sharded sink: exactly-once across a crash " +
       "MID-MAINTENANCE (after append, before compaction); the " +
       "replayed tick skips the append and completes the fold") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.sources.Sources
    val path = java.nio.file.Files
      .createTempDirectory("graft_shmaintcrash").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_shmaintcrash_ck").toString
    val ms = MemoryStream[(Long, String)]
    // crash INJECTION: tick 2's first attempt dies AFTER its append
    // published but BEFORE the maintenance pass ran — the replay must
    // skip the append (batch id committed) and still run maintenance
    @volatile var crashOnce = true
    def start() = ms.toDS().toDF("doc_id", "t").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 2L && crashOnce) {
          crashOnce = false
          Sources.shardedTableSinkBatch(b, id, col("doc_id"),
            col("doc_id"), path, 2, Seq("doc_id"))
          throw new RuntimeException("injected crash before maintenance")
        }
        Sources.shardedTableSinkBatchMaintained(b, id, col("doc_id"),
          col("doc_id"), path, 2, Seq("doc_id"),
          compactWhenSmallDirs = 3, smallDirRows = 500L,
          keepVersions = 3)
        ()
      }
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    (0 until 2).foreach { i =>
      ms.addData((i * 40 until (i + 1) * 40)
        .map(j => (j.toLong, s"d$j")): _*)
      q1.processAllAvailable()
    }
    ms.addData((80 until 120).map(j => (j.toLong, s"d$j")): _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    val q2 = start()
    try {
      q2.processAllAvailable() // replay tick 2: append skipped
      ms.addData((120 until 160).map(j => (j.toLong, s"d$j")): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = Sources.readShardedTable(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 160L), s"rows lost or duplicated: " +
      s"${got.size}")
    assert(Sources.committedBatchIds(spark, path) ==
      Set(0L, 1L, 2L, 3L))
    // maintenance actually ran: versions and dirs bounded by policy
    assert(Sources.shardedVersions(spark, path).size <= 3)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("data-v")) <= 5)
    Sources.dropShardedTable(spark, path)
  }

  test("graft-sharded-cdc readStream: initial load + per-version " +
       "windows replicate the table; restart resumes from the " +
       "checkpoint, never re-delivering the initial load") {
    import graft.sources.Sources
    val path = java.nio.file.Files
      .createTempDirectory("graft_cdcstream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cdcstream_ckpt").toString
    def batch(lo: Long, n: Long, tag: String) = spark.range(n)
      .select((col("id") + lo).as("doc_id"),
        concat(lit(tag), col("id") + lo).as("t"))
    Sources.writeShardedTable(batch(0, 200, "a"), col("doc_id"),
      col("doc_id"), path, 4, Seq("doc_id"))
    // driver-side replica the micro-batches fold into; versions seen
    // pin the delivery schedule (one version per trigger, no replays
    // across a clean restart)
    val replica = scala.collection.mutable.Map.empty[Long, String]
    val seenVersions = scala.collection.mutable.ArrayBuffer.empty[Long]
    def applyBatch(b: org.apache.spark.sql.DataFrame,
                   id: Long): Unit = {
      val rows = b.select("_commit_version", "_change_type",
        "doc_id", "t").collect()
      rows.map(_.getLong(0)).distinct.sorted.foreach { v =>
        seenVersions += v
        rows.filter(r => r.getLong(0) == v)
          .sortBy(r => r.getString(1) != "delete") // deletes first
          .foreach { r =>
            if (r.getString(1) == "delete") replica -= r.getLong(2)
            else replica(r.getLong(2)) = r.getString(3)
          }
      }
    }
    def run(): Unit = {
      val q = spark.readStream.format("graft-sharded-cdc")
        .option("path", path).load()
        .writeStream.foreachBatch(applyBatch _)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // the initial load at v1
    assert(replica.size == 200 && seenVersions.toSeq == Seq(1L))
    // table keeps moving while the consumer is down
    Sources.appendShardedTable(batch(200, 50, "a"), col("doc_id"),
      col("doc_id"), path, 2, Seq("doc_id"))
    Sources.mergeShardedTable(batch(100, 80, "b"), "doc_id",
      col("doc_id"), path, 2, Seq("doc_id"))
    Sources.deleteFromShardedTable(spark, path, "doc_id",
      spark.range(10).select((col("id") * 7).as("doc_id")))
    run() // restart from the checkpoint: exactly v2, v3, v4 — no v1
    assert(seenVersions.toSeq == Seq(1L, 2L, 3L, 4L),
      s"delivery schedule: $seenVersions")
    val want = Sources.readShardedTable(spark, path)
      .select("doc_id", "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replica.toMap == want,
      "streamed replica diverged from the table state")
    // caught up: another run delivers nothing
    run()
    assert(seenVersions.toSeq == Seq(1L, 2L, 3L, 4L))
    // rate limit: versions arrive one per micro-batch by default, so
    // the three catch-up windows came as three batches (the schedule
    // above) — now widen the limit and confirm a multi-version batch
    Sources.appendShardedTable(batch(300, 10, "a"), col("doc_id"),
      col("doc_id"), path, 1, Seq("doc_id"))
    Sources.appendShardedTable(batch(310, 10, "a"), col("doc_id"),
      col("doc_id"), path, 1, Seq("doc_id"))
    val q2 = spark.readStream.format("graft-sharded-cdc")
      .option("path", path).option("maxVersionsPerTrigger", 8)
      .load()
      .writeStream.foreachBatch(applyBatch _)
      .option("checkpointLocation", ckpt)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seenVersions.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(replica.size == 200 + 50 - 10 + 20)
    Sources.dropShardedTable(spark, path)
  }

  test("graft-sharded-cdc startingVersion: latest tail-follows with " +
       "no initial load; a numeric version replays from there") {
    import graft.sources.Sources
    val path = java.nio.file.Files
      .createTempDirectory("graft_cdctail").toString
    def batch(lo: Long, n: Long) = spark.range(n)
      .select((col("id") + lo).as("doc_id"),
        concat(lit("d"), col("id") + lo).as("t"))
    Sources.writeShardedTable(batch(0, 100), col("doc_id"),
      col("doc_id"), path, 2, Seq("doc_id"))
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    def run(ckpt: String, opts: Map[String, String]): Unit = {
      val r = opts.foldLeft(spark.readStream
          .format("graft-sharded-cdc").option("path", path)) {
        case (b, (k, v)) => b.option(k, v) }
      val q = r.load().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("doc_id", "_change_type", "_commit_version")
            .collect()
            .map(r2 => (r2.getLong(0), r2.getString(1), r2.getLong(2)))
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    val ckptTail = java.nio.file.Files
      .createTempDirectory("graft_cdctail_ck").toString
    // latest: the 100 existing rows are NOT delivered
    run(ckptTail, Map("startingVersion" -> "latest"))
    assert(got.isEmpty, s"tail-follow delivered ${got.size} rows")
    // the next append IS delivered (changes only), from the same
    // checkpoint
    Sources.appendShardedTable(batch(1000, 20), col("doc_id"),
      col("doc_id"), path, 2, Seq("doc_id"))
    run(ckptTail, Map("startingVersion" -> "latest"))
    assert(got.size == 20 && got.forall(r => r._2 == "insert" &&
      r._3 == 2L && r._1 >= 1000))
    // numeric: a fresh consumer replaying from version 2 sees v2's
    // inserts and v3's deletes, never v1's initial state
    Sources.deleteFromShardedTable(spark, path, "doc_id",
      spark.range(5).select((col("id") + 1000).as("doc_id")))
    got.clear()
    val ckptNum = java.nio.file.Files
      .createTempDirectory("graft_cdcnum_ck").toString
    run(ckptNum, Map("startingVersion" -> "2",
      "maxVersionsPerTrigger" -> "8"))
    assert(got.count(_._2 == "insert") == 20)
    assert(got.count(_._2 == "delete") == 5)
    assert(got.forall(_._3 >= 2L))
    Sources.dropShardedTable(spark, path)
  }
}
