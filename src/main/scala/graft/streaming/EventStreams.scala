package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is strictly batch
  * (SURVEY.md §2.2 — streaming is an extension tier, not parity), but the
  * lowered plans are standard Catalyst operators, so the same logical
  * shapes run under `readStream`: the tumbling aggregation below is
  * literally `graft.ops.Events.tumbling` plus a watermark.
  *
  * Scale notes: windowed aggregation state is partitioned by (window,
  * event_type) — bounded by watermark horizon × cardinality; session
  * state by user_id — use timeouts to evict. Both shuffle once on their
  * group keys, same as the batch forms.
  */
object EventStreams {

  /** Streaming Count-Min maintenance: the same (group, row, bucket)
    * counter grid as [[graft.ops.Sketches.countMin]], kept current
    * over a stream — the sketch is a pure integer-sum aggregate, so
    * streaming partial aggregation maintains it with O(depth·width)
    * state per group and the final grid equals the batch build over
    * the same rows (StreamingSpec pins the parity). Buckets evaluate
    * per OCCURRENCE here (a stream has no vocab frame to hash once —
    * that optimization is batch-only; the hash is a codegen'd fold,
    * so the cost is per-row arithmetic, not a shuffle). Run in
    * update/complete mode: counters only grow. */
  def countMinStream(stream: DataFrame, group: Column, item: Column,
                     depth: Int = 3, width: Int = 32): DataFrame =
    stream.filter(item.isNotNull)
      .select(group.as("group"),
        explode(graft.ops.Sketches.cmBuckets(item, depth, width))
          .as("rb"))
      .groupBy(col("group"), col("rb.row").as("row"),
               col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Streaming heavy hitters: the SAME mergeable SpaceSaving state as
    * the batch [[graft.ops.Sketches.heavyHitters]] (Metwally et al.),
    * maintained across micro-batches by streaming aggregation — the
    * state store holds one O(capacity) summary per group, each batch's
    * partial summaries merge in, and the current top-k is emitted in
    * update/complete mode. When capacity >= the group's distinct-item
    * count the summary is EXACT (no evictions, err 0) and the stream
    * equals the batch build regardless of batch boundaries; past that
    * it keeps the SpaceSaving guarantee (any item with true frequency
    * > n/capacity is present). Same output schema as the batch op. */
  def heavyHittersStream(stream: DataFrame, group: Column, item: Column,
                         k: Int, capacity: Int): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need 1 <= k <= capacity, got k=$k capacity=$capacity")
    val f = udaf(graft.functions.Reducers.SpaceSaving(capacity))
    stream.filter(item.isNotNull)
      .groupBy(group.as("group"))
      .agg(slice(f(item), 1, k).as("__hh"))
      .select(col("group"), explode(col("__hh")).as("__h"))
      .select(col("group"), col("__h._1").as("item"),
              col("__h._2").as("cnt_est"), col("__h._3").as("err"))
  }

  /** Streaming tumbling-window aggregation (append mode with watermark,
    * or complete mode for tests). Same output schema as
    * `Events.tumbling`. */
  def tumbling(stream: DataFrame, duration: String,
               watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Streaming exact dedup: emit the first row per key, dropping
    * duplicates that arrive within the watermark horizon. State holds one
    * entry per distinct key seen inside the horizon — bounded by
    * (arrival rate x horizon), evicted by event time, unlike plain
    * dropDuplicates whose state grows forever. The streaming twin of
    * `Dedup.exactKeepFirst` (keep-first is arrival order here: there is
    * no total order over an unbounded stream). */
  def dedupStream(stream: DataFrame, keys: Seq[String],
                  tsCol: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join: match each left event to right events
    * for the same key within [leftTs - before, leftTs + after]. BOTH
    * sides must be watermarked — the interval bound plus the watermarks
    * is what lets the engine evict buffered rows (an unbounded
    * stream-stream join would hold both streams' full history in
    * state). State per side is bounded by (arrival rate x (watermark
    * horizon + interval width)), partitioned by the join key — one
    * shuffle per side, the same equi-join shape as batch. Inner join:
    * append-mode output as matches arrive. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $after"))
      // one key column out (they are equal by the join predicate);
      // keeping both makes every downstream col(key) ambiguous
      .drop(r(key))
  }

  /** Stream-stream LEFT OUTER interval join: like [[intervalJoin]],
    * but left rows that never meet a right row inside the time bound
    * still emit — null-padded — once the watermark passes the bound
    * and Spark can PROVE no match can arrive. The enrich-or-flag
    * pattern (every request row must appear downstream, matched to a
    * response or marked unanswered) that an inner join silently drops.
    * State eviction is identical to the inner form: both sides keyed
    * in the state store, bounded by watermark + interval width. The
    * unmatched row's emission is delayed by up to the watermark — the
    * price of a provably-complete answer on an unbounded stream. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            before: String, after: String,
                            watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $after"),
        "leftOuter")
      .drop(r(key))
  }

  /** Streaming document curation — the ingest-side funnel: language
    * gate, composite-quality cut, PII scrub, then exact dedup on a
    * token-prefix key within the watermark horizon. The first three
    * stages are pure per-row expressions (the SAME expressions as the
    * batch ops — [[graft.ops.TextAnalysis.qualityScoreX1e4]] etc.), so
    * they add no state; the only stateful op is the dedup, bounded by
    * (arrival rate x watermark horizon) and evicted by event time.
    * One shuffle total (the dedup's key exchange). Streaming twin of
    * `Pipeline.filterLang → filterQuality → redactPii →
    * dedupExactByPrefix`; "keep-first" is arrival order here — an
    * unbounded stream has no total id order to keep-min over.
    *
    * Expects columns (doc_id, text, `tsCol`); emits (doc_id, ts,
    * clean_text, quality_x1e4). */
  def curateDocStream(stream: DataFrame, lang: String,
                      minQualityX1e4: Long, dedupPrefixTokens: Int,
                      tsCol: String = "ts",
                      watermark: String = "1 hour"): DataFrame = {
    import graft.functions.TextFunctions.{langId, tokens}
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val num = "\\b\\d{9,}\\b"
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(
      col("text"), email, "<EMAIL>"), ip, "<IP>"), num, "<NUM>")
    stream
      .filter(langId(tokens(col("text"))) === lang)
      .select(col("doc_id"), col(tsCol).as("ts"),
        scrubbed.as("clean_text"),
        graft.ops.TextAnalysis.qualityScoreX1e4(col("text"))
          .as("quality_x1e4"))
      .filter(col("quality_x1e4") >= minQualityX1e4)
      // dedup keys on the SCRUBBED text — the batch twin dedups after
      // redactPii, so two docs differing only inside a redacted span
      // must collide here too
      .withColumn("__prefix",
        concat_ws(" ", slice(tokens(col("clean_text")), 1,
          dedupPrefixTokens)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__prefix")
      .drop("__prefix")
  }

  /** DSIR importance gate on an unbounded stream — the payoff of the
    * O(buckets) model: the closed model enters the plan as a map
    * LITERAL and the whole gate is a pure per-row filter (no state, no
    * shuffle, no watermark), so ingest can price documents against a
    * target distribution the way the batch op
    * ([[graft.ops.TextAnalysis.dsirWeights]] / `Pipeline.filterDsir`)
    * does — a vocab-sized model could not ship per row. The bucket
    * hash is the same char fold, the bucket scores the same micro-unit
    * integers, so a doc passes the stream gate iff it passes the batch
    * gate under the same trained model (StreamingSpec pins it). Tokens
    * hashing to buckets unseen at training score `model.unk`. Docs
    * with no tokens are dropped (batch: no scored row). */
  def dsirGateStream(stream: DataFrame,
                     model: graft.ops.TextAnalysis.DsirModel,
                     minMeanMicro: Long,
                     textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val m = typedlit(model.byBucket)
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    def bucket(t: Column): Column =
      aggregate(transform(sequence(lit(1), length(t)), i =>
          ascii(t.substr(i, lit(1))).cast("long")),
        lit(7L), (a, c) => (a * 31L + c) % 2147483647L) % model.buckets
    val w = aggregate(toks, lit(0L), (acc, t) =>
      acc + coalesce(element_at(m, bucket(t)), lit(model.unk)))
    stream.filter(size(toks) > 0 &&
      w >= lit(minMeanMicro) * size(toks))
  }

  final case class WarcRec(file_id: Long, rec_idx: Int,
                           warc_type: String, uri: Option[String],
                           content_length: Long,
                           http_status: Option[Int],
                           body: Option[String])

  /** Stream-side WARC demux: [[graft.ops.Warc.parseWarc]] — the SAME
    * bounds-checked record walker as batch — applied per incoming
    * file blob through a typed `flatMap` (the batch reader's RDD seam
    * is unavailable on an unbounded frame). Stateless and append-mode:
    * a crawl-file ARRIVAL stream (`readStream.format("binaryFile")`
    * on a landing dir, or a queue of fetched files) demuxes to
    * records at wire speed, and `htmlExtractStream` downstream makes
    * the whole q486 ingest funnel continuous. Malformed blobs throw —
    * quarantine upstream, never silent mis-parses. */
  def warcDemuxStream(stream: DataFrame, fileIdName: String,
                      blobName: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(fileIdName).cast("long").as("f"),
        col(blobName).as("b"))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, blob) =>
        if (blob == null) Iterator.empty
        else graft.ops.Warc.parseWarc(blob).iterator.zipWithIndex.map {
          case (r, k) => WarcRec(fid, k, r.warcType, Option(r.uri),
            r.contentLength, Option(r.httpStatus).map(_.intValue),
            Option(r.body))
        }
      }
      .toDF()
  }

  /** Stream-side HTML main-text extraction: the SAME codegen kernel
    * as batch ([[graft.ops.Html.extractTextDf]] /
    * [[graft.functions.HtmlExtract]]) applied per incoming page — a
    * pure narrow map (no state, no watermark, no shuffle; append
    * mode), so crawl ingest strips markup and drops boilerplate-only
    * pages at wire speed. A page survives iff the extractor keeps at
    * least `minKeptBlocks` blocks — the batch keep set exactly
    * (StreamingSpec pins stream == batch row-for-row). */
  def htmlExtractStream(stream: DataFrame, idName: String,
                        htmlName: String, minKeptBlocks: Long = 1,
                        minChars: Int = 5, densityNum: Int = 1,
                        densityDen: Int = 3): DataFrame =
    graft.ops.Html.extractTextDf(stream, idName, htmlName, minChars,
        densityNum, densityDen)
      .filter(col("n_kept") >= minKeptBlocks)

  final case class FrameHash(asset_id: Long, frame_idx: Int,
                             n_frames: Int, hash_hi: Long, hash_lo: Long)

  /** Stream-side MJPEG frame hashing: the SAME demux → per-frame JPEG
    * decode → gray aHash as batch ([[graft.ops.Mp4.mjpegFrameHashesDf]])
    * applied per incoming video blob through a typed flatMap (the
    * batch op's RDD seam is unavailable on an unbounded frame).
    * Stateless, append-mode, media bytes never shuffle — the video
    * arm of the continuous crawl-ingest funnel: fingerprint every
    * arriving asset's frames at wire speed, downstream
    * [[phashScreenStream]] joins them against a standing index.
    * Corrupt frames are skipped, exactly as in batch; a corrupt
    * CONTAINER (demux failure — truncated moov, bad run tables,
    * escaping offsets) is quarantined to zero rows too, because a
    * throw here fails the micro-batch and a restart re-reads the
    * SAME blob: one malformed asset must never wedge the stream the
    * docstring sells as continuous ingest (parity pinned by
    * StreamingSpec). */
  def mjpegFrameHashStream(stream: DataFrame, idName: String,
                           mediaName: String): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(idName).cast("long").as("a"), col(mediaName).as("m"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        if (blob == null) Iterator.empty
        else {
          val samples: Array[Array[Byte]] =
            try graft.ops.Mp4.demuxSamples(blob).samples
            catch { case scala.util.control.NonFatal(_) =>
              Array.empty[Array[Byte]] }
          val n = samples.length
          samples.iterator.zipWithIndex.flatMap { case (frame, f) =>
            try {
              val (w, h, plane) = graft.ops.Jpeg.decodeJpegPlane(frame)
              val (hi, lo) = graft.ops.Multimodal.grayAHash64(plane, w, h)
              Iterator.single(FrameHash(id, f, n, hi, lo))
            } catch { case scala.util.control.NonFatal(_) =>
              Iterator.empty
            }
          }
        }
      }
      .toDF()
  }

  /** Stream-side containment screen: every incoming document's winnowed
    * fingerprints ([[graft.ops.TextAnalysis.winnowFingerprints]] — the
    * SAME narrow expression as batch) probe a STATIC corpus fingerprint
    * index; emits one (doc_id, fp, corpus_id) row per shared
    * fingerprint. Stateless (a stream-static inner equi-join on the
    * 31-bit fp key — append mode, no watermark, no state store); the
    * corpus index is the reusable artifact, loaded once and broadcast
    * or shuffled by Spark as its size dictates. Aggregation to
    * "flagged iff >= minShared matches" is the consumer's one-liner —
    * kept OUT of the op so the stream stays stateless. */
  def containmentScreenStream(stream: DataFrame, id: Column, text: Column,
                              corpusIndex: DataFrame, corpusId: Column,
                              corpusFp: Column,
                              k: Int = 3, w: Int = 4): DataFrame =
    graft.ops.TextAnalysis.winnowFingerprints(stream, id, text, k, w)
      .join(corpusIndex.select(corpusId.as("corpus_id"),
        corpusFp.as("fp")), "fp")

  /** Streaming OHLC resampling: [[graft.ops.Events.ohlcBars]] run as a
    * streaming aggregation — min_by/max_by carry mergeable (value,
    * order-key) state, so bars finalize identically however the rows
    * were micro-batched (StreamingSpec pins stream == batch). Complete
    * or update output mode (append needs a watermark on the caller's
    * side); the event-id order column keeps open/close deterministic
    * across arrival orders. */
  def ohlcBarsStream(stream: DataFrame, barDuration: String = "1 hour",
                     tsCol: String = "ts", orderCol: String = "event_id",
                     valueCol: String = "value"): DataFrame =
    graft.ops.Events.ohlcBars(stream, col(tsCol), col(orderCol),
      col(valueCol), barDuration)

  /** Streaming near-dup screen: every incoming document's MinHash
    * signature bands probe a standing [[graft.ops.Dedup.minhashIndex]]
    * and candidates exact-verify against the stored corpus shingles —
    * two stream-static equi-joins, stateless, append mode
    * ([[graft.ops.Dedup.lshScreen]] is the shared kernel). One
    * evidence row per (doc, corpus doc, colliding band); the distinct
    * pair set equals the batch [[graft.ops.Dedup.minhashLshPairsBetween]]
    * (StreamingSpec pins it). The corpus index is the reusable
    * artifact — build once, screen every micro-batch. */
  def lshScreenStream(stream: DataFrame, id: Column, text: Column,
                      corpusIndex: DataFrame, tau: Double,
                      n: Int = 3, h: Int = 128,
                      bands: Int = 64): DataFrame =
    graft.ops.Dedup.lshScreen(stream, id, text, corpusIndex, tau,
      n, h, bands)

  /** Streaming perceptual-hash screen: incoming image fingerprints
    * (e.g. [[graft.ops.Multimodal.aHash64]] halves) probe a STANDING
    * hash index for hamming-≤-maxDist near-dups — the image twin of
    * [[lshScreenStream]]. Stateless by construction: band-explode is
    * per-row, the (band, byte) join is stream-static, and duplicate
    * suppression is the minimal-agreeing-band predicate instead of a
    * stateful dropDuplicates — append mode, no state store. */
  def phashScreenStream(stream: DataFrame, id: Column, hi: Column,
                        lo: Column, index: DataFrame, maxDist: Int)
      : DataFrame =
    graft.ops.Dedup.hammingPairs64Between(stream, id, hi, lo,
      index, col("asset_id"), col("hash_hi"), col("hash_lo"), maxDist)

  /** Streaming ANN: each incoming query embedding routes to its
    * nearest IVF centroid and ranks ONLY that list's packed postings
    * ([[graft.ops.Similarity.ivfPack]] builds the static index once;
    * [[graft.ops.Similarity.ivfTopKPacked]] is the shared stateless
    * kernel — per-row transform/sort/slice, no aggregation, no state
    * store, append mode). The nProbe = 1 routing is the stateless
    * contract: multi-probe merge needs a per-query aggregation, which
    * is the batch op's job ([[graft.ops.Similarity.ivfTopK]]) — rerank
    * recall-critical hits there. Emits (qid, nbr, score, rank) rows as
    * queries arrive; bit-identical to the batch op at nProbe = 1
    * (StreamingSpec pins it). */
  def annTopKStream(queries: DataFrame, centroids: Seq[Seq[Double]],
                    packedIndex: DataFrame, qid: Column, qvec: Column,
                    k: Int): DataFrame =
    graft.ops.Similarity.ivfTopKPacked(queries, centroids, packedIndex,
      qid, qvec, k)

  /** Stream-static IVF-PQ ANN: streaming query vectors probe a static
    * [[graft.ops.Similarity.ivfPqPack]] index — route to the nearest
    * list (stateless expression), equi-join the packed frame, ADC-rank
    * and rescore INSIDE the row. No aggregation, no state store,
    * append mode; per-query results are bit-identical to the batch
    * [[graft.ops.Similarity.ivfPqTopK]] at nProbe 1 given the same
    * centroids (the annTopKStream contract with PQ scoring —
    * StreamingSpec pins it). */
  def pqAnnStream(queries: DataFrame, cents: Seq[Seq[Double]],
                  books: Seq[Seq[Seq[Long]]], packed: DataFrame,
                  qid: Column, qvec: Column, k: Int): DataFrame =
    graft.ops.Similarity.ivfPqTopKPacked(queries, cents, books, packed,
      qid, qvec, k)

  /** Streaming KMV theta sketch: the batch
    * [[graft.ops.Sketches.kmvSketch]] bottom-k-distinct-hash state as
    * a streaming aggregation — O(k) mergeable state per group in the
    * state store, partials fold in per micro-batch. Bottom-k-of-union
    * is associative AND commutative, so the standing sketch equals
    * the batch build REGARDLESS of batch boundaries (exact parity,
    * not an approximation bound — StreamingSpec pins it), and the
    * emitted sketch feeds the same [[graft.ops.Sketches.kmvSetOps]] /
    * rollup algebra as batch sketches. Update/complete mode. */
  def kmvSketchStream(stream: DataFrame, group: Column, key: Column,
                      k: Int): DataFrame = {
    val f = udaf(graft.functions.Reducers.KmvBottomK(k))
    stream.filter(key.isNotNull)
      .select(group.as("group"),
        graft.ops.Sketches.kmvHash(key).as("__h"))
      .groupBy(col("group"))
      .agg(f(col("__h")).as("kmv"))
  }

  final case class FEv(user_id: Long, tsSec: Long, event_type: String)
  final case class FunnelState(ts: Seq[Long])
  final case class UserFunnel(user_id: Long, completed: Int, ts: Seq[Long])

  /** Stateful streaming conversion funnel — the incremental form of
    * [[graft.ops.Events.funnel]]: per-user state = the earliest
    * completion time of each stage (set-once, `Long.MinValue` =
    * unset); each micro-batch's events are sorted by time inside the
    * group and folded through the same strictly-after rule (stage i
    * completes at the first event with its type AFTER stage i-1's
    * time). For in-order feeds the final state equals the batch
    * funnel exactly (StreamingSpec pins it). An out-of-order arrival
    * that would retroactively LOWER an already-set stage time is out
    * of scope for this state model — same contract as
    * [[sessionCounts]]: use the batch form for reprocessing. State is
    * k longs per user, bounded by user cardinality. */
  def funnelStages(events: Dataset[FEv], stages: Seq[String])
      : Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "stages must be non-empty and distinct")
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, UserFunnel](
        GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[FunnelState]) =>
          val t = state.getOption
            .map(_.ts.toArray)
            .getOrElse(Array.fill(stages.size)(Long.MinValue))
          evs.toSeq.sortBy(_.tsSec).foreach { e =>
            val i = stages.indexOf(e.event_type)
            if (i == 0) {
              if (t(0) == Long.MinValue) t(0) = e.tsSec
            } else if (i > 0 && t(i) == Long.MinValue &&
                       t(i - 1) != Long.MinValue && e.tsSec > t(i - 1)) {
              t(i) = e.tsSec
            }
          }
          state.update(FunnelState(t.toIndexedSeq))
          UserFunnel(user, t.takeWhile(_ != Long.MinValue).length,
                     t.toIndexedSeq)
      }
  }

  final case class Ev(user_id: Long, tsSec: Long)
  final case class SessionState(lastTs: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long,
                                n_events: Long)

  final case class VEv(user_id: Long, tsSec: Long, order: Long, v: Double)
  final case class EwmaState(lastTs: Long, lastOrd: Long, n: Long,
                             e: Double)
  final case class UserEwma(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming EWMA — the stateful twin of
    * [[graft.ops.Events.ewmaFinal]]: per key, the zero-init recurrence
    * e ← (1−α)·e + α·x carried across micro-batches as ONE
    * (lastTs, lastOrd, n, e) tuple. Within a batch the group's events
    * fold sorted by (tsSec, order); ACROSS batches the fold can only
    * move forward — an event at or behind the high-water mark is
    * DROPPED (an EWMA cannot retro-insert without replaying everything
    * after it; the batch form is the reprocessing path, same division
    * of labor as [[sessionCounts]]). With batches arriving in event
    * order the float math is the batch fold's exact op sequence, so
    * stream == batch bit-for-bit (spec-pinned). State is one tuple per
    * key; one shuffle per micro-batch. */
  def ewmaStream(events: Dataset[VEv], alphaNum: Int, alphaDen: Int)
      : Dataset[UserEwma] = {
    import events.sparkSession.implicits._
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"ewmaStream: need 0 < alphaNum <= alphaDen, got $alphaNum/$alphaDen")
    val a = alphaNum.toDouble / alphaDen
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, UserEwma](
        GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[EwmaState]) =>
          val init = state.getOption
            .getOrElse(EwmaState(Long.MinValue, Long.MinValue, 0L, 0.0))
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.order))
          val out = sorted.foldLeft(init) { (st, e) =>
            val stale = e.tsSec < st.lastTs ||
              (e.tsSec == st.lastTs && e.order <= st.lastOrd)
            if (stale) st
            else EwmaState(e.tsSec, e.order, st.n + 1,
                           st.e * (1 - a) + e.v * a)
          }
          state.update(out)
          UserEwma(user, out.n, out.e)
      }
  }

  final case class RunStats(n: Long, sum_cents: Long, max_cents: Long)
  final case class UserStats(user_id: Long, n: Long, sum_cents: Long,
                             max_cents: Long)

  /** Per-key running stats on the `transformWithState` arbitrary-state
    * API (Spark 4's successor to mapGroupsWithState: typed composite
    * state handles, timers, per-state TTL, RocksDB-backed — the
    * forward path for stateful pipelines). Functionally the count/
    * sum/max fold [[ewmaStream]] would do on v1; the point pinned by
    * the spec is the v2 machinery: a ValueState survives across
    * micro-batches under the RocksDB provider and each batch emits the
    * key's updated running row (update mode). Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState's contract). */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, VEv, UserStats] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[RunStats] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[RunStats]("run", TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[VEv],
                                 timers: TimerValues)
        : Iterator[UserStats] = {
      val init = if (st.exists()) st.get() else RunStats(0L, 0L, Long.MinValue)
      val out = rows.foldLeft(init) { (s, e) =>
        val cents = math.floor(e.v * 100 + 0.5).toLong
        RunStats(s.n + 1, s.sum_cents + cents, math.max(s.max_cents, cents))
      }
      st.update(out)
      Iterator.single(UserStats(key, out.n, out.sum_cents, out.max_cents))
    }
  }

  def runningStatsStream(events: Dataset[VEv])
      : Dataset[UserStats] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class SessState(startSec: Long, lastSec: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: Long,
                                 session_end: Long, n_events: Long)

  /** Timer-driven session closer on the v2 state API: a session emits
    * ONLY when it closes — when the gap elapses with no new event —
    * via an event-time timer (`handleExpiredTimer`), not when a later
    * event happens to arrive. mapGroupsWithState can only observe a
    * key when input for it shows up or a coarse group timeout fires;
    * the v2 timer is per-key precise, so the downstream consumer gets
    * exactly one (start, end, count) row per finished session and
    * in-flight sessions hold their peace. Each arriving event extends
    * the session and re-arms the timer to lastEvent + gap; an event
    * past the gap closes the previous session (emitting it) and opens
    * a new one. Event-time mode: the watermark drives timer firing. */
  class SessionCloserProcessor(gapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      import implicits._
      st = getHandle.getValueState[SessState]("sess", TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timers: TimerValues)
        : Iterator[ClosedSession] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      rows.toSeq.sortBy(_.tsSec).foreach { e =>
        val cur = if (st.exists()) Some(st.get()) else None
        cur match {
          case Some(s) if e.tsSec - s.lastSec <= gapSec =>
            st.update(SessState(s.startSec, math.max(s.lastSec, e.tsSec),
                                s.n + 1))
          case Some(s) => // gap exceeded in-stream: close + reopen
            out += ClosedSession(key, s.startSec, s.lastSec, s.n)
            st.update(SessState(e.tsSec, e.tsSec, 1L))
          case None =>
            st.update(SessState(e.tsSec, e.tsSec, 1L))
        }
      }
      // re-arm: one timer at lastEvent + gap (clear any stale one)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (st.exists())
        getHandle.registerTimer((st.get().lastSec + gapSec) * 1000L + 1)
      out.iterator
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo)
        : Iterator[ClosedSession] = {
      if (!st.exists()) Iterator.empty
      else {
        val s = st.get()
        st.clear()
        Iterator.single(ClosedSession(key, s.startSec, s.lastSec, s.n))
      }
    }
  }

  /** Closed sessions only, emitted by per-key event-time timers. The
    * input needs a watermarked event-time column named `ts` on the
    * UNDERLYING DataFrame before the typed conversion — the watermark
    * is what advances timers. */
  def closedSessionsStream(events: Dataset[Ev], gapSec: Long)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    events.groupByKey(_.user_id)
      .transformWithState(new SessionCloserProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class NEv(user_id: Long, tsSec: Long, order: Long,
                       v: Option[Double])
  final case class FillState(lastTs: Long, lastOrd: Long,
                             carry: Option[Double])
  final case class FilledEv(user_id: Long, order: Long,
                            v_filled: Option[Double])

  /** Streaming forward fill — the stateful twin of
    * [[graft.ops.Events.forwardFill]]: per key the state is the last
    * non-null value seen (plus the high-water mark), and every event
    * is emitted with its null repaired from that carry. Within a
    * micro-batch the group's events fold sorted by (tsSec, order);
    * events at or behind the high-water mark are emitted with the
    * CURRENT carry but do not move state (a late value cannot
    * retroactively re-fill rows already emitted — batch is the
    * reprocessing path). flatMapGroupsWithState in append mode: each
    * input event produces exactly one output row. Leading nulls
    * (no carry yet) stay null, exactly like batch. */
  def forwardFillStream(events: Dataset[NEv]): Dataset[FilledEv] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FillState, FilledEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[FillState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.order))
          val init = state.getOption
            .getOrElse(FillState(Long.MinValue, Long.MinValue, None))
          val (outs, fin) = sorted.foldLeft(
            (Vector.empty[FilledEv], init)) { case ((acc, st), e) =>
            val stale = e.tsSec < st.lastTs ||
              (e.tsSec == st.lastTs && e.order <= st.lastOrd)
            val filled = e.v.orElse(st.carry)
            val next =
              if (stale) st
              else FillState(e.tsSec, e.order, e.v.orElse(st.carry))
            (acc :+ FilledEv(user, e.order, filled), next)
          }
          state.update(fin)
          outs.iterator
      }
  }

  final case class TbState(tok: Long, lastTs: Long, lastOrd: Long,
                           n: Long, adm: Long)
  final case class UserBucket(user_id: Long, n_events: Long,
                              n_admitted: Long, n_throttled: Long,
                              final_tokens: Long)

  /** Streaming token-bucket rate limiter — the stateful twin of
    * [[graft.ops.Events.tokenBucketAudit]], and the form a limiter
    * actually RUNS as (the batch form is the capacity-planning
    * replay). Per key the state is one (tokens, lastTs, lastOrd, n,
    * admitted) tuple; each micro-batch folds the group's new events
    * sorted by (tsSec, order) through the same integer clamp
    * recurrence, so with batches arriving in event order
    * stream == batch exactly (spec-pinned). Events at or behind the
    * high-water mark are dropped — a limiter's decisions are
    * append-only ([[ewmaStream]]'s guard, same reasoning). The bucket
    * starts FULL at each key's first-ever event. */
  def tokenBucketStream(events: Dataset[VEv], capacity: Long,
                        refillPerSec: Long, cost: Long)
      : Dataset[UserBucket] = {
    import events.sparkSession.implicits._
    require(capacity > 0 && refillPerSec > 0 && cost > 0,
      "tokenBucketStream: capacity, refillPerSec, cost must be positive")
    require(cost <= capacity,
      "tokenBucketStream: cost > capacity would throttle every event")
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[TbState, UserBucket](
        GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[TbState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.order))
          val out = sorted.foldLeft(state.getOption.orNull) { (st, e) =>
            if (st == null) // first-ever event: full bucket, zero gap
              TbState(capacity - cost, e.tsSec, e.order, 1L, 1L)
            else if (e.tsSec < st.lastTs ||
                     (e.tsSec == st.lastTs && e.order <= st.lastOrd)) st
            else {
              val lvl = math.min(capacity,
                st.tok + (e.tsSec - st.lastTs) * refillPerSec)
              val ok = lvl >= cost
              TbState(if (ok) lvl - cost else lvl, e.tsSec, e.order,
                      st.n + 1, st.adm + (if (ok) 1L else 0L))
            }
          }
          state.update(out)
          UserBucket(user, out.n, out.adm, out.n - out.adm, out.tok)
      }
  }

  final case class CapState(start: Long, prev: Long, lastOrd: Long,
                            n: Long, longest: Long, nEvents: Long)
  final case class UserCapped(user_id: Long, n_events: Long,
                              n_sessions: Long, longest_sec: Long)

  /** Streaming twin of [[graft.ops.Events.sessionStatsCapped]]: the
    * gap-OR-duration split folded across micro-batches in
    * mapGroupsWithState — same state machine, state carries (session
    * start, last event, counts) per user; stale (late, already-folded)
    * events are dropped by the monotone guard like [[ewmaStream]].
    * Emits the user's updated summary each batch (update mode). */
  def cappedSessionStream(events: Dataset[VEv], gapSec: Long,
                          capSec: Long): Dataset[UserCapped] = {
    import events.sparkSession.implicits._
    require(gapSec > 0 && capSec >= gapSec,
      "cappedSessionStream: need 0 < gapSec <= capSec")
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CapState, UserCapped](
        GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[CapState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.order))
          val out = sorted.foldLeft(state.getOption.orNull) { (st, e) =>
            if (st == null)
              CapState(e.tsSec, e.tsSec, e.order, 1L, 0L, 1L)
            else if (e.tsSec < st.prev ||
                     (e.tsSec == st.prev && e.order <= st.lastOrd)) st
            else if (e.tsSec - st.prev > gapSec ||
                     e.tsSec - st.start > capSec)
              CapState(e.tsSec, e.tsSec, e.order, st.n + 1,
                       math.max(st.longest, st.prev - st.start),
                       st.nEvents + 1)
            else
              CapState(st.start, e.tsSec, e.order, st.n, st.longest,
                       st.nEvents + 1)
          }
          state.update(out)
          UserCapped(user, out.nEvents, out.n,
                     math.max(out.longest, out.prev - out.start))
      }
  }

  final case class Chg(key: Long, tsSec: Long, value: String,
                       deleted: Boolean)
  final case class UpsertState(tsSec: Long, value: String,
                               deleted: Boolean)
  final case class Current(key: Long, value: String, ts_sec: Long)

  /** Streaming SCD1 (current-state view): the streaming twin of
    * [[graft.ops.Pipeline]]'s batch CDC upsert-apply — maintain the
    * LATEST value per key over a change stream, tombstones deleting.
    * Latest is by (event time, arrival) with event time authoritative:
    * a late-arriving OLDER change must not overwrite a newer state, so
    * the state update is guarded by the stored timestamp (same
    * monotone-guard reasoning as [[sessionCounts]]' lastTs). Emits the
    * key's current row each micro-batch it changes in (update mode);
    * deleted keys emit value null so downstream sinks can propagate
    * the tombstone instead of silently keeping the old row.
    *
    * Scale shape: state is ONE (ts, value, deleted) triple per live
    * key — bounded by key cardinality like any keyed-state view, one
    * shuffle per micro-batch on the key. */
  def upsertLatestStream(changes: Dataset[Chg]): Dataset[Current] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[UpsertState, Current](
        GroupStateTimeout.NoTimeout) {
        (key, chs, state: GroupState[UpsertState]) =>
          val newest = chs.toSeq.maxBy(_.tsSec)
          val cur = state.getOption
          val next =
            if (cur.exists(_.tsSec > newest.tsSec)) cur.get
            else UpsertState(newest.tsSec, newest.value, newest.deleted)
          state.update(next)
          Current(key, if (next.deleted) null else next.value,
            next.tsSec)
      }
  }

  /** Stateful gap-based sessionization with mapGroupsWithState: per-user
    * state = (latest event time, session count). Within a micro-batch
    * the group's events are sorted by time; across batches the state
    * carries the LATEST timestamp seen (monotone max — a late
    * out-of-order event must not regress it, or the next on-time event
    * computes its gap against the stale time and spuriously opens a
    * session). Late events inside the gap horizon merge into the current
    * session; retroactively re-splitting older sessions is out of scope
    * for this state model (use the batch form for reprocessing). State
    * is bounded by user cardinality; a production deployment would add
    * EventTimeTimeout + setTimeoutTimestamp to evict idle users past the
    * gap horizon (NoTimeout here: a registered processing-time timeout
    * keeps the engine scheduling no-data batches, which blocks test
    * drains, and we never arm one anyway). */
  def sessionCounts(events: Dataset[Ev], gapSeconds: Long)
      : Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.tsSec)
          val init = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          val out = sorted.foldLeft(init) { (st, e) =>
            val isNew = st.lastTs == Long.MinValue ||
              e.tsSec - st.lastTs > gapSeconds
            SessionState(math.max(st.lastTs, e.tsSec),
                         st.sessions + (if (isNew) 1 else 0),
                         st.events + 1)
          }
          state.update(out)
          UserSessions(user, out.sessions, out.events)
      }
  }

  /** Start a continuous append into a MANIFEST-FILE SHARDED TABLE
    * ([[graft.sources.Sources.writeShardedTable]]'s format): each
    * micro-batch becomes one append snapshot via
    * [[graft.sources.Sources.shardedTableSinkBatch]] — exactly-once
    * under crash/replay because the manifest commits LAST and new
    * manifest rows are keyed by the micro-batch id (a replayed batch
    * either never published, so the append runs again over its orphan
    * data dir, or fully published, so it is skipped). This is the
    * streaming arm of the daily-ingest story: the table grows one
    * immutable snapshot per batch, readers prune on the manifest
    * stats, [[graft.sources.Sources.expireShardedSnapshots]] reclaims
    * history — StreamingSpec pins the restart contract (no duplicate
    * rows, versions monotone). */
  def shardedTableSink(stream: DataFrame, id: Column, orderCol: Column,
                       path: String, numShards: Int,
                       statsCols: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sources.shardedTableSinkBatch(batch, batchId,
          id, orderCol, path, numShards, statsCols)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** [[shardedTableSink]] with BOUNDED SELF-MAINTENANCE
    * ([[graft.sources.Sources.shardedTableSinkBatchMaintained]]):
    * compaction folds the streaming drip when the small-dir count
    * crosses the policy threshold and expiry caps the version chain —
    * a year of 5-minute ticks keeps manifest, versions listing and
    * per-read file count O(policy), not O(ticks), with no external
    * maintenance job. Exactly-once still holds across crash/replay
    * anywhere in the tick (batch ids survive compaction as ledger
    * rows; a crash between append and maintenance defers the fold to
    * the next tick). */
  def shardedTableSinkMaintained(stream: DataFrame, id: Column,
                                 orderCol: Column, path: String,
                                 numShards: Int, statsCols: Seq[String],
                                 checkpoint: String,
                                 compactWhenSmallDirs: Int = 8,
                                 smallDirRows: Long = 1L << 20,
                                 keepVersions: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sources.shardedTableSinkBatchMaintained(batch,
          batchId, id, orderCol, path, numShards, statsCols,
          compactWhenSmallDirs, smallDirRows, keepVersions)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Streaming UPSERT sink: each micro-batch MERGES into the sharded
    * table (later batch wins the key), exactly-once across restarts
    * via [[graft.sources.Sources.shardedTableMergeSinkBatch]]'s
    * batch-id check — the CDC-consumer stream, replicating a keyed
    * change feed into a queryable table at O(batch) cost per tick. */
  def shardedTableMergeSink(stream: DataFrame, idName: String,
                            orderCol: Column, path: String,
                            numShards: Int, statsCols: Seq[String],
                            checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sources.shardedTableMergeSinkBatch(batch, batchId,
          idName, orderCol, path, numShards, statsCols)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .start()

  /** Streaming DEDUPLICATING ingest sink: each micro-batch keeps one
    * row per key and appends only never-seen keys
    * ([[graft.sources.Sources.shardedTableDedupSinkBatch]]) — the
    * corpus table stays duplicate-free WHILE it grows, exactly-once
    * across restarts. */
  def shardedTableDedupSink(stream: DataFrame, keyName: String,
                            idName: String, orderCol: Column,
                            path: String, numShards: Int,
                            statsCols: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sources.shardedTableDedupSinkBatch(batch, batchId,
          keyName, idName, orderCol, path, numShards, statsCols)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** The fully self-tending ingest loop as one streaming sink:
    * per-tick dedup screening (bloom-assisted when a sidecar exists),
    * append, policy compaction, snapshot expiry and periodic bloom
    * refresh — [[graft.sources.Sources
    * .shardedTableDedupSinkBatchMaintained]] under foreachBatch. */
  def shardedTableDedupSinkMaintained(
      stream: DataFrame, keyName: String, idName: String,
      orderCol: Column, path: String, numShards: Int,
      statsCols: Seq[String], checkpoint: String,
      compactWhenSmallDirs: Int = 8, smallDirRows: Long = 1L << 20,
      keepVersions: Int = 16, bloomEveryVersions: Int = 0,
      bloomBits: Int = 1 << 20, bloomK: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sources.shardedTableDedupSinkBatchMaintained(
          batch, batchId, keyName, idName, orderCol, path, numShards,
          statsCols, compactWhenSmallDirs, smallDirRows, keepVersions,
          bloomEveryVersions, bloomBits, bloomK)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
