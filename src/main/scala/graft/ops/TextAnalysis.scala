package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Per-document text analysis for corpus pipelines: language ID, quality
  * scoring, token stats, fingerprinting. All narrow (per-row) column
  * expressions — scale linearly, no shuffle, parquet column pruning
  * reaches the scan (only `text` + id are read). */
object TextAnalysis {

  /** doc_id, predicted language, marker hit counts. */
  def langIdOf(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    df.select(
      id.as("doc_id"),
      langId(toks).as("pred_lang"),
      langScore(toks, "en").as("s_en"),
      langScore(toks, "de").as("s_de"),
      langScore(toks, "fr").as("s_fr"),
      langScore(toks, "es").as("s_es"))
  }

  /** Quality heuristics: token count, distinct-token ratio, stopword
    * ratio, composite score. Formula mirrored 1:1 in the DuckDB oracle.
    * Ratios are emitted as x10000 integers via floor(x*1e4 + 0.5) — an
    * explicit half-up on bit-identical IEEE doubles — because `round()`
    * differs between engines exactly at representation boundaries
    * (observed: 0.42725 → 0.4272 vs 0.4273). */
  def quality(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double") / nTok
    val stop = langScore(toks, "en").cast("double") / nTok
    def x1e4(c: Column): Column = floor(c * 10000.0 + 0.5).cast("long")
    df.select(
      id.as("doc_id"),
      size(toks).as("n_tokens"),
      length(text).as("n_chars"),
      x1e4(uniq).as("uniq_x1e4"),
      x1e4(stop).as("stop_x1e4"),
      qualityScoreX1e4(text).as("quality_x1e4"))
  }

  /** The composite quality score of [[quality]] as a bare Column —
    * a pure per-row expression, so it runs identically on batch frames
    * and unbounded streams (no shuffle, no state). */
  def qualityScoreX1e4(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double") / nTok
    val stop = langScore(toks, "en").cast("double") / nTok
    floor((uniq * 0.5 + least(nTok / lit(100.0), lit(1.0)) * 0.3 +
           stop * 0.2) * 10000.0 + 0.5).cast("long")
  }

  /** Per-stratum corpus health report — the summary table a curation
    * run starts and ends with: volume (docs, chars), language spread,
    * exact-duplicate load (distinct texts vs docs), and total quality
    * mass. All outputs are integer-exact (sums of per-row integers —
    * no mean, so no cross-engine .5-rounding boundary). One group-key
    * shuffle; the two count-distincts share the aggregation's Expand.
    * At 100 TB this is the cheap survey pass that decides which
    * sources need capping ([[graft.ops.Relational.topKPerGroup]]),
    * rebalancing ([[graft.ops.Sampling.mixCorpora]]), or dedup
    * budget. */
  def corpusReport(df: DataFrame, strata: Column, text: Column,
                   lang: Column, nChars: Column): DataFrame =
    df.groupBy(strata.as("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(nChars).as("n_chars"),
           countDistinct(lang).as("n_langs"),
           countDistinct(text).as("n_unique_texts"),
           sum(qualityScoreX1e4(text)).as("quality_x1e4_sum"))

  /** Source-reputation filter — the act-on-the-report step after
    * [[corpusReport]] (C4-style domain curation: a bad DOMAIN predicts
    * bad documents better than any per-document signal). A source is
    * kept when its exact-duplicate load is at most `maxDupPermille`
    * (permille of docs that are repeats of an earlier identical text)
    * AND its mean quality clears `minMeanQualityX1e4`. Both rules are
    * integer comparisons on exact sums — `sum_q >= min * n` instead of
    * a float mean, `(dups*1000) div n` instead of a ratio — so the
    * keep set is bit-stable across engines and partitionings. One
    * group-key shuffle for the stats; the per-source verdict frame is
    * tiny (one row per source) and broadcast back onto the corpus —
    * the corpus itself never shuffles, which is the property that
    * matters when it is 100 TB and the verdict table is kilobytes. */
  def filterBySourceReputation(df: DataFrame, source: Column, id: Column,
                               text: Column, maxDupPermille: Int,
                               minMeanQualityX1e4: Long): DataFrame = {
    val stats = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("src_docs"),
           countDistinct(text).as("src_unique"),
           sum(qualityScoreX1e4(text)).as("src_quality"))
      .withColumn("src_dup_permille",
        expr("((src_docs - src_unique) * 1000) div src_docs"))
    val kept = stats.filter(
      col("src_dup_permille") <= maxDupPermille &&
      col("src_quality") >= lit(minMeanQualityX1e4) * col("src_docs"))
    df.select(id.as("doc_id"), source.as("source"))
      .join(broadcast(kept.select("source", "src_docs",
                                  "src_dup_permille")), Seq("source"))
  }

  /** Rolling-hash fingerprint per document (content-defined identity
    * that survives storage/ordering changes, unlike file hashes). */
  def fingerprints(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), fingerprint(tokens(text)).as("fp"))

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS algorithm — the standard local document fingerprinting
    * for partial-overlap detection in large corpora): hash every
    * k-token gram, slide a w-wide window over
    * the gram-hash sequence, and keep each window's MINIMUM hash. The
    * classic guarantee follows: any run of >= w+k-1 tokens shared by two
    * documents contributes at least one IDENTICAL selected fingerprint
    * to both, while only ~2/(w+1) of all gram hashes are kept — a
    * sublinear, alignment-robust fingerprint set (file hashes break on
    * any edit; full gram sets are k x larger). Emits the distinct
    * (doc_id, fp) rows; join fp-to-fp downstream for containment
    * detection at any scale (the join key is a 31-bit int, never text).
    *
    * Gram hashes fold the same per-token packs as [[fingerprint]]
    * (31*len + first-char code, mod 2^31-1 each step) so the DuckDB
    * oracle replays them verbatim. The per-row kernel is the codegen'd
    * [[graft.functions.WinnowFps]] expression (one O(grams) monotonic-
    * deque pass; the interpreted HOF formulation is kept as
    * [[winnowFingerprintsHof]], the differential-spec reference only).
    * Docs shorter than k tokens have no grams and are absent; docs with
    * 1 <= m < w grams yield the min of all m (one truncated window) so
    * every doc with a gram has at least one fingerprint. Null text
    * propagates to the empty gram set (absent). Narrow per-row pass +
    * one explode — no shuffle; distinct-per-doc happens inside the row
    * (array_distinct) not as a global distinct. */
  def winnowFingerprints(df: DataFrame, id: Column, text: Column,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    df.select(id.as("doc_id"),
        explode(graft.functions.WinnowFps(text, k, w)).as("fp"))
  }

  /** Higher-order-function specification of [[winnowFingerprints]] —
    * semantically identical, interpreted (O(grams*w) array lambdas vs
    * the native kernel's one O(grams) deque pass). Kept ONLY as the
    * independent reference [[graft.functions.WinnowFps]] is
    * differential-tested against (FunctionsSpec); never use in a
    * pipeline. */
  private[graft] def winnowFingerprintsHof(
      df: DataFrame, id: Column, text: Column,
      k: Int = 3, w: Int = 4): DataFrame = {
    val P = 2147483647L
    val packed = df.select(id.as("doc_id"),
      transform(tokens(text), t =>
        (lit(31L) * length(t) + ascii(substring(t, 1, 1)))
          .cast("long")).as("__packs"))
    val n = size(col("__packs"))
    val gramHashes = when(n >= k,
      transform(sequence(lit(1), n - (k - 1)), i =>
        (1 until k).foldLeft(
          (lit(7L) * 31L + element_at(col("__packs"), i)) % P) {
          (acc, j) => (acc * 31L + element_at(col("__packs"), i + j)) % P
        }))
      .otherwise(array().cast("array<bigint>"))
    val hashed = packed.select(col("doc_id"), gramHashes.as("__gh"))
    val m = size(col("__gh"))
    val mins = when(m >= 1,
      transform(sequence(lit(1), greatest(m - (w - 1), lit(1))), j =>
        array_min(slice(col("__gh"), j, lit(w)))))
      .otherwise(array().cast("array<bigint>"))
    hashed.select(col("doc_id"), explode(array_distinct(mins)).as("fp"))
  }

  /** Per-document token counting, both whitespace and BPE-ish regex
    * (the "what will this cost to train on" column). Narrow, no
    * shuffle; only id + text are scanned. */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      size(tokens(text)).as("ws_tokens"),
      size(regexTokens(text)).as("bpe_tokens"))

  /** Canonical text normalization for dedup/key derivation: lowercase,
    * strip everything but [a-z0-9 ], collapse whitespace runs, trim.
    * Pure codegen'd column expression; the regexes stay inside the RE2
    * subset so the DuckDB oracle runs the identical patterns. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Kneser-Ney smoothed bigram surprisal (Kneser & Ney 1995; the
    * absolute-discount interpolated form): for corpus bigrams,
    * P(w2|w1) = (c12 − d)/ctx(w1) + d·N1+(w1·)/ctx(w1) · Pcont(w2)
    * with Pcont(w2) = N1+(·w2)/|bigram types| — the continuation
    * probability that makes "Francisco" cheap only after "San", which
    * add-k smoothing ([[bigramNll]]) cannot express. d defaults to the
    * standard 3/4 (exactly representable, so both engines compute the
    * identical doubles). Scoring corpus bigrams means every bigram is
    * SEEN (c12 ≥ 1 > d) — the unseen-bigram backoff branch never
    * fires, which keeps the whole model four count aggregates.
    *
    * Scale shape mirrors [[bigramNll]]: bigrams form inside rows, the
    * model is bigram-vocab-sized (w1 and w2 aggregates fold in via
    * model-sized joins), and the corpus probes exactly one model
    * table plus a broadcast scalar. Returns
    * (doc_id, n_bigrams, kn_nll). */
  def kneserNeyNll(df: DataFrame, id: Column, text: Column,
                   dNum: Int = 3, dDen: Int = 4): DataFrame = {
    require(dNum > 0 && dNum < dDen,
      s"discount must be in (0,1), got $dNum/$dDen")
    val bg = bigramStream(df, id, text)
    def first(c: Column): Column = split(c, " ").getItem(0)
    def second(c: Column): Column = split(c, " ").getItem(1)
    val bgCnt = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
      .cut() // three aggregates + the model join reuse it
    val w1agg = bgCnt.groupBy(first(col("bg")).as("w1"))
      .agg(sum("c12").as("ctx"), count(lit(1)).as("nf"))
    val w2agg = bgCnt.groupBy(second(col("bg")).as("w2"))
      .agg(count(lit(1)).as("np"))
    val types = bgCnt.agg(count(lit(1)).as("tt"))
    val model = bgCnt
      .join(w1agg, first(col("bg")) === col("w1"))
      .join(w2agg, second(col("bg")) === col("w2"))
      .select(col("bg"), col("c12"), col("ctx"), col("nf"), col("np"))
    val d = lit(dNum.toDouble / dDen)
    bg.join(model, "bg")
      .crossJoin(broadcast(types))
      .withColumn("__p",
        (col("c12") - d) / col("ctx") +
        d * col("nf") / col("ctx") * (col("np") * 1.0 / col("tt")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(-log(col("__p"))), 6).as("kn_nll"))
  }

  /** C4-style line-level cleaning screen (Raffel et al. 2020 §2.2's
    * public heuristics, parameterized): segments split on `sep`; a
    * segment is KEPT iff it ends in the terminal pattern, has at least
    * `minLineWords` whitespace words, and does not contain
    * `lineBlockWord` (case-insensitive); the whole document is kept
    * iff no corpus-level blocker substring appears AND at least
    * `minKeptLines` segments survive. Defaults are the paper's rules
    * for newline-structured web text (terminal punctuation, >= 5
    * words, >= 3 lines, "lorem ipsum"/"{" blockers, "javascript"
    * line-drop); every knob is a parameter because real corpora need
    * tuned thresholds. One pure per-row expression chain — no
    * shuffle, no state, runs identically on a stream.
    *
    * Returns (doc_id, n_segments, n_kept, keep, clean_text) with
    * clean_text the kept segments rejoined on `sep` (null when the
    * document is dropped — a dropped doc has no clean text). */
  def c4Screen(df: DataFrame, id: Column, text: Column,
               sep: String = "\n",
               terminalPattern: String = "[.!?\"]\\s*$",
               minLineWords: Int = 5, minKeptLines: Int = 3,
               blockSubstrings: Seq[String] = Seq("lorem ipsum", "{"),
               lineBlockWord: String = "javascript"): DataFrame = {
    val segs = filter(split(text, java.util.regex.Pattern.quote(sep)),
      s => trim(s) =!= "")
    val kept = filter(segs, s =>
      trim(s).rlike(terminalPattern) &&
      size(filter(split(trim(s), " +"), w => w =!= "")) >= minLineWords &&
      !lower(s).contains(lineBlockWord))
    val blocked = blockSubstrings
      .map(b => lower(text).contains(b.toLowerCase))
      .reduce(_ || _)
    df.select(
        id.as("doc_id"),
        size(segs).as("n_segments"),
        size(kept).as("n_kept"),
        // null text must DROP (keep = false), not propagate null
        coalesce(!coalesce(blocked, lit(false)) &&
          size(kept) >= minKeptLines, lit(false)).as("keep"),
        array_join(kept, sep).as("__clean"))
      .withColumn("clean_text",
        when(col("keep"), col("__clean"))).drop("__clean")
  }

  /** Gopher quality rules (Rae et al. 2021, table A1 — the public
    * web-text screen MassiveText shipped with, sibling of [[c4Screen]]'s
    * line rules): per document,
    *  - word count within [minWords, maxWords];
    *  - mean word length within [3, 10] — compared integer-exactly as
    *    3·n ≤ Σlen ≤ 10·n, no float mean anywhere;
    *  - symbol-to-word ratio ('#' chars + '...'/'…' runs) ≤ 1/10;
    *  - ≤ 90% of lines start with a bullet, ≤ 30% end with an
    *    ellipsis (both cross-multiplied);
    *  - ≥ 80% of words contain an alphabetic character;
    *  - at least 2 distinct Gopher stop words
    *    (the/be/to/of/and/that/have/with) appear.
    * One per-row expression chain over split/filter/size — no UDF, no
    * shuffle, stream-safe, and every pattern sits in the Java-regex ∩
    * RE2 subset so the oracle replays it verbatim. Null text fails
    * every populated rule (keep = false, counts 0). Returns per-rule
    * booleans so a curation report can histogram WHICH rule bites
    * before committing to the cut. */
  def gopherScreen(df: DataFrame, id: Column, text: Column,
                   minWords: Int = 50, maxWords: Int = 100000,
                   stopWords: Seq[String] = Seq("the", "be", "to", "of",
                     "and", "that", "have", "with")): DataFrame = {
    require(stopWords.nonEmpty, "gopherScreen: stopWords must be non-empty")
    val words = filter(split(coalesce(text, lit("")), "\\s+"),
      w => w =!= "")
    val lines = filter(transform(split(coalesce(text, lit("")), "\n"),
      l => trim(l)), l => l =!= "")
    val nWords = size(words)
    val nLines = size(lines)
    val sumLen = coalesce(aggregate(words, lit(0L),
      (acc, w) => acc + length(w)), lit(0L))
    val nSymbols =
      (length(coalesce(text, lit(""))) -
        length(regexp_replace(coalesce(text, lit("")), "#", ""))) +
      (size(split(coalesce(text, lit("")), "(\\.\\.\\.|…)", -1)) - 1)
    val nBullet = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")))
    val nEllipsis = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…")))
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]")))
    val stops = array(stopWords.map(lit): _*)
    val nStops = size(array_intersect(
      array_distinct(transform(words, w => lower(w))), stops))
    df.select(
      id.as("doc_id"),
      nWords.cast("long").as("n_words"),
      nLines.cast("long").as("n_lines"),
      (nWords >= minWords && nWords <= maxWords).as("r_words"),
      (nWords > 0 && lit(3L) * nWords <= sumLen &&
        sumLen <= lit(10L) * nWords).as("r_wordlen"),
      (lit(10L) * nSymbols <= nWords).as("r_symbol"),
      (lit(10L) * nBullet <= lit(9L) * nLines).as("r_bullet"),
      (lit(10L) * nEllipsis <= lit(3L) * nLines).as("r_ellipsis"),
      (lit(5L) * nAlpha >= lit(4L) * nWords).as("r_alpha"),
      (nStops >= 2).as("r_stops"))
      .withColumn("keep",
        col("r_words") && col("r_wordlen") && col("r_symbol") &&
        col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
        col("r_stops"))
  }

  /** URL canonicalization for crawl dedup: the same page arrives under
    * case-shuffled scheme/host, default ports, trailing slashes,
    * tracking params, and fragments — canonicalize BEFORE the content
    * pipeline and exact URL dedup collapses the easy multiples for
    * free (every crawl curation stack's first move). Rules:
    * lowercase scheme+host, drop :80/:443, strip trailing path
    * slashes, drop the fragment, drop utm_, gclid, fbclid, ref params,
    * and SORT surviving params (order-insensitive key). Pure column
    * expression over regex extract/filter/sort — no UDF, and every
    * pattern stays in the Java-regex ∩ RE2 subset so the DuckDB
    * oracle replays it verbatim. Non-URL strings (no scheme) pass
    * through lowercased-scheme extraction to '' → returned null. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(hostPort, ":(80|443)$", "")
    val path = regexp_replace(
      regexp_extract(noFrag,
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val params = array_sort(filter(
      split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      p => p =!= "" &&
        !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=")))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** Corpus-level token frequency (the classic wordcount — explode +
    * count, partial aggregation map-side). */
  def tokenFrequency(df: DataFrame, text: Column, topN: Int): DataFrame =
    df.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topN)

  /** Zipf's-law fit per corpus stratum: OLS slope/intercept of
    * ln(frequency) against ln(rank) over the per-stratum token
    * frequency table — the standard corpus-health diagnostic (natural
    * language tracks slope ≈ -1; templated/generated text bends the
    * curve, so a per-source fit flags synthetic strata wholesale,
    * complementing the per-document [[repetitionSignals]]).
    *
    * Scale shape: one corpus token explode + (stratum, token) count —
    * the same vocab-sized frame every model op here builds — then a
    * rank window over VOCAB rows only (never corpus occurrences; a
    * stratum's vocabulary is bounded by Heaps' law at ~O(√corpus), and
    * the frequency-floor filter shrinks it further before the window).
    * Logs quantize to micro-units (floor(ln·1e6+0.5), the
    * [[pmiCollocations]] discipline) so the fit runs on exact integers
    * via [[Checks.olsFitFp]]. `minFreq` drops the hapax shelf that
    * otherwise dominates the regression (standard practice — the fit
    * targets the power-law body, not the noise tail).
    *
    * Determinism: rank ties (equal frequency) break by token, so the
    * (rank, freq) point set — and therefore the fit — is unique.
    * Output: (stratum, n_types, slope, intercept). */
  def zipfFit(df: DataFrame, stratum: Column, text: Column,
              minFreq: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(stratum.as("stratum"),
        explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("stratum", "tok").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("freq").desc, col("tok").asc)
    val fp = tf.withColumn("rank", row_number().over(w))
      .select(col("stratum"),
        floor(log(col("rank").cast("double")) * 1000000.0 + 0.5)
          .cast("long").as("x"),
        floor(log(col("freq").cast("double")) * 1000000.0 + 0.5)
          .cast("long").as("y"))
    Checks.olsFitFp(fp, col("stratum"), col("x"), col("y"))
      .withColumnRenamed("group", "stratum")
      .withColumnRenamed("n_points", "n_types")
  }

  /** Deflate compressibility ratio (compressed/raw bytes) — the classic
    * "machine-generated or pathologically repetitive text" signal:
    * natural prose lands ~0.4-0.7, templated spam and repeated blocks
    * much lower. The codegen'd [[graft.functions.DeflateRatio]]
    * expression (this was the codebase's last Scala UDF — the UDF form
    * survives only as [[compressionRatioUdf]], the differential-test
    * spec). Narrow map, no shuffle. Empty text → 1.0 (incompressible
    * by fiat); null → null (the UDF form returned 1.0 for null — the
    * native expression propagates null like every other text op). */
  def compressionRatio(text: Column): Column =
    graft.functions.DeflateRatio(text)

  /** UDF specification of [[compressionRatio]] — kept ONLY as the
    * independent reference the native expression is differential-tested
    * against (FunctionsSpec); never use in a pipeline. */
  private[graft] def compressionRatioUdf(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val in = s.getBytes("UTF-8")
        val d = TextAnalysis.localDeflater.get()
        d.reset()
        d.setInput(in); d.finish()
        val buf = new Array[Byte](math.max(64, in.length / 2))
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / in.length
      }
    }
    f(text)
  }

  /** One zlib state per executor thread, reused via reset(). */
  private lazy val localDeflater: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6)
    }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, the
    * duplicate/top n-gram filters every LLM-corpus pipeline applies):
    * for each n in `ns`, the fraction of n-gram CHARACTER MASS held by
    * the single most frequent n-gram (`top{n}_x1e4`, templated spam
    * spikes this) and the fraction contributed by repeat occurrences
    * beyond each gram's first (`dup{n}_x1e4`, loops/boilerplate spike
    * this). Mass denominators are total n-gram characters, so the
    * metric is self-contained per doc and tie-free (max over
    * count*length needs no "which gram" tiebreak).
    *
    * Entirely narrow per-row expressions — no explode, no shuffle,
    * column pruning reaches the scan; at 100 TB this is a single map
    * pass. The gram statistics come from the codegen'd
    * [[graft.functions.GramMassStats]] expression: one compiled pass
    * with a per-row frequency map. The HOF formulation it replaces
    * ([[repetitionSignalsHof]], kept as the differential-test spec)
    * evaluates interpreted, allocating per gram — measured 925 s for
    * the 5k-doc sf0.1 corpus vs ~1 s native. Docs shorter than n
    * tokens score 0 on both signals; null text scores 0 with a null
    * n_tokens (unchanged from the HOF form). */
  def repetitionSignals(df: DataFrame, id: Column, text: Column,
                        ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    def x1e4(c: Column): Column = floor(c * 10000.0 + 0.5).cast("long")
    def signalsFor(n: Int): Seq[Column] = {
      // null text → null struct from the expression; coalesce to the
      // zero struct so null docs score 0 exactly like the HOF form
      // (whose `when` fell through to the empty-gram branch on null)
      val st = coalesce(
        graft.functions.GramMassStats(text, n),
        struct(lit(0L).as("tot"), lit(0L).as("dist"), lit(0L).as("best")))
      val tot = st("tot")
      Seq(
        x1e4(when(tot === 0L, 0.0)
          .otherwise(st("best").cast("double") / tot)).as(s"top${n}_x1e4"),
        x1e4(when(tot === 0L, 0.0)
          .otherwise((tot - st("dist")).cast("double") / tot))
          .as(s"dup${n}_x1e4"))
    }
    df.select(id.as("doc_id") +: size(tokens(text)).as("n_tokens") +:
      ns.flatMap(signalsFor): _*)
  }

  /** Higher-order-function specification of [[repetitionSignals]] —
    * semantically identical, interpreted (array lambdas don't codegen),
    * ~900× slower on real corpora. Kept ONLY as the independent spec
    * the native [[graft.functions.GramMassStats]] path is
    * differential-tested against (FunctionsSpec); never use in a
    * pipeline. */
  private[graft] def repetitionSignalsHof(
      df: DataFrame, id: Column, text: Column,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    val toks = tokens(text)
    def x1e4(c: Column): Column = floor(c * 10000.0 + 0.5).cast("long")
    def signalsFor(n: Int): Seq[Column] = {
      val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      // total character mass of all gram occurrences / of distinct grams
      val tot  = aggregate(grams, lit(0L), (a, g) => a + length(g))
      val dist = aggregate(array_distinct(grams), lit(0L),
        (a, g) => a + length(g))
      // max over grams of count*length == longest equal-run mass in the
      // sorted gram array (struct accumulator: prev gram, run, best).
      // Null prev on the first element falls through === to run = 1.
      val best = aggregate(array_sort(grams),
        struct(lit(null).cast("string").as("prev"),
               lit(0L).as("run"), lit(0L).as("best")),
        (acc, g) => {
          val run = when(g === acc("prev"), acc("run") + 1L).otherwise(1L)
          struct(g.as("prev"), run.as("run"),
                 greatest(acc("best"), run * length(g)).as("best"))
        },
        acc => acc("best"))
      Seq(
        x1e4(when(tot === 0L, 0.0)
          .otherwise(best.cast("double") / tot)).as(s"top${n}_x1e4"),
        x1e4(when(tot === 0L, 0.0)
          .otherwise((tot - dist).cast("double") / tot))
          .as(s"dup${n}_x1e4"))
    }
    df.select(id.as("doc_id") +: size(toks).as("n_tokens") +:
      ns.flatMap(signalsFor): _*)
  }

  /** Hashing-trick document feature vectors (Weinberger et al. 2009):
    * every term folds to a bucket j in [0, dim) and an independent ±1
    * sign (one extra Lehmer round — deriving sign from the same
    * residue as the bucket would correlate them and bias collisions
    * upward instead of cancelling them); the doc's sparse vector is
    * v_j = Σ sign(t)·tf(t). Embedding-free featurization: fixed-dim
    * vectors for clustering/similarity with NO trained model, and
    * integer-exact end to end (counts times ±1 — no floats anywhere),
    * so the oracle replays it bit-for-bit.
    *
    * Scale shape: the char-fold hash runs once per DISTINCT term (the
    * vocab frame — the [[dsirWeights]] discipline), never per
    * occurrence; the tf frame is the one (doc, term)-sized artifact
    * (pinned: the vocab derivation and the scoring join both consume
    * it) and the output agg shuffles on (doc, j) with map-side
    * partials. Emits sparse (doc_id, j, v) rows; absent buckets are
    * implicit zeros (sign cancellation CAN produce explicit zeros —
    * both engines keep them, same rows). */
  def hashFeatures(df: DataFrame, id: Column, text: Column,
                   dim: Int = 64): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val P = 2147483647L
    val tf = df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .cut()
    val tok = col("tok")
    val codes = transform(sequence(lit(1), length(tok)), i =>
      ascii(tok.substr(i, lit(1))).cast("long"))
    val h = aggregate(codes, lit(7L), (a, ch) => (a * 31L + ch) % P)
    val hashed = tf.select("tok").distinct()
      .select(tok, pmod(h, lit(dim.toLong)).cast("int").as("j"),
              (lit(1L) - lit(2L) * pmod((h * 48271L) % P, lit(2L)))
                .as("sgn"))
    tf.join(hashed, "tok")
      .groupBy("doc_id", "j")
      .agg(sum(col("sgn") * col("tf")).as("v"))
  }

  /** PII scrubbing — the pre-release pass every training corpus gets:
    * emails, dotted-quad IPs, then 9+-digit runs replaced by typed
    * placeholders, with a per-category match count for audit columns.
    * Replacement ORDER is load-bearing: redacting emails first removes
    * their digits before the IP/number passes, and redacting IPs
    * removes dotted digits before the number pass, so no span is
    * double-counted. Counts are taken on each stage's INPUT (what the
    * stage actually saw). Patterns stay inside the RE2 subset so the
    * DuckDB oracle runs the identical regexes; narrow per-row pass,
    * no shuffle. Null text propagates null throughout. */
  def redactPii(df: DataFrame, id: Column, text: Column): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val num = "\\b\\d{9,}\\b"
    val t1 = regexp_replace(text, email, "<EMAIL>")
    val t2 = regexp_replace(t1, ip, "<IP>")
    val t3 = regexp_replace(t2, num, "<NUM>")
    df.select(id.as("doc_id"), t3.as("clean_text"),
      regexp_count(text, lit(email)).cast("int").as("n_email"),
      regexp_count(t1, lit(ip)).cast("int").as("n_ip"),
      regexp_count(t2, lit(num)).cast("int").as("n_num"))
  }

  /** Corpus-unigram negative log-likelihood per document — the cheap
    * LM-quality signal (KenLM-style scoring with the corpus itself as
    * the model): nll = avg over tokens of ln(corpus_tokens /
    * token_count). Word-salad and boilerplate score low (every token
    * common), rare-token noise scores high. Two shuffles: the token
    * count (partial agg map-side) and the score join back on token;
    * the frequency table is |vocab|-sized so the join is NOT hinted —
    * AQE broadcasts it when it fits, shuffle-joins when a web-scale
    * vocabulary doesn't (same contract as [[tfIdf]]). The corpus total
    * is one row, broadcast. */
  def unigramNll(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
    // vocab-sized; materialized — the corpus total AND the scoring
    // join both consume it, and unpinned each re-runs the full
    // tokenize+count pass
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .cut()
    val tot = freq.agg(sum(col("cnt")).as("tot"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(log(col("tot").cast("double") / col("cnt"))), 6)
             .as("nll"))
  }

  /** Corpus-bigram negative log-likelihood per document — one order up
    * from [[unigramNll]]: an add-one-smoothed bigram model trained on
    * the corpus itself scores each document by the mean conditional
    * surprise of its adjacent token pairs, nll = avg over bigrams of
    * ln((ctx + V) / (c12 + 1)), where c12 counts the bigram, ctx counts
    * its first token as a context (bigram occurrences starting with it,
    * so the smoothed conditional sums to 1), and V is the corpus
    * unigram vocabulary. Fluent prose scores low; token-salad that
    * passes unigram screening (common words, impossible order) scores
    * high — the standard next step of LM-quality filtering.
    *
    * Scale shape: bigrams are formed INSIDE each row from the token
    * array (narrow transform — never a corpus-wide window/lag shuffle,
    * which would shuffle 100 TB just to see each row's neighbor). The
    * bigram key is "w1 w2" (tokens are space-split so the separator
    * cannot collide). Model tables are bigram-vocab-sized; like
    * [[unigramNll]] the scoring joins are unhinted — AQE broadcasts
    * them when they fit. V is one row, broadcast. Docs with < 2 tokens
    * have no bigrams and produce no row (mirrored by the oracle). */
  /** Per-row adjacent-bigram stream (doc_id, bg = "w1 w2"). Narrow:
    * bigrams form INSIDE each row from the token array — never a
    * corpus-wide lag shuffle. The token array is projected BEFORE the
    * per-element lambda: element_at(<full split expr>, i) inside
    * transform re-evaluates the split for EVERY element
    * (O(n_tokens^2) per row — measured 8x slower per corpus pass at
    * sf0.1); behind a named column the lambda reads a bound attribute
    * once per row. sequence(1, 0) steps DOWN, so docs with < 2 tokens
    * are guarded to an empty array (they produce no bigrams). */
  private def bigramStream(df: DataFrame, id: Column, text: Column)
      : DataFrame = {
    val toksD = df.select(id.as("doc_id"),
      filter(tokens(text), t => t =!= "").as("__ts"))
    val ts = col("__ts")
    toksD.select(col("doc_id"),
      explode(when(size(ts) >= 2,
          transform(sequence(lit(1), size(ts) - 1), i =>
            concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
        .otherwise(array().cast("array<string>"))).as("bg"))
  }

  def bigramNll(df: DataFrame, id: Column, text: Column): DataFrame = {
    val bg = bigramStream(df, id, text)
    val w1 = split(col("bg"), " ").getItem(0)
    // bigram-vocab-sized; materialized — context counts derive from it
    // (sum per w1 over the MODEL, never a second corpus-wide shuffle)
    // and the model join below consumes it again
    val bgCnt = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
      .cut()
    val ctxCnt = bgCnt.groupBy(w1.as("w1")).agg(sum("c12").as("ctx"))
    // fold ctx into the per-bigram model (model-sized join) so the
    // CORPUS joins exactly one table — two corpus-wide probe joins
    // would double the big shuffle
    val model = bgCnt.join(ctxCnt, w1 === col("w1"))
      .select(col("bg"), col("c12"), col("ctx"))
    val vocab = df.select(explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .agg(countDistinct(col("tok")).as("v"))
    bg.join(model, "bg")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(log((col("ctx") + col("v")).cast("double") /
                         (col("c12") + 1L))), 6).as("nll2"))
  }

  /** PMI collocation extraction: the corpus's top multiword
    * expressions by pointwise mutual information over the adjacent-
    * bigram distribution, `pmi = ln(c12·N / (c1·c2))` with c1/c2 the
    * POSITION marginals of the bigram table (first-word / second-word
    * occurrence mass — the margins sum to N, so this is exact PMI of
    * the joint (first, second) distribution). A `minCount` floor
    * removes the low-frequency noise that otherwise dominates PMI
    * (hapax pairs score ln N). The standard vocabulary-induction /
    * tokenizer-seeding pass of a corpus pipeline.
    *
    * Scale shape: one corpus-wide shuffle builds the bigram model;
    * marginals and the total derive from the MODEL (bigram-vocab-
    * sized), never a second corpus pass. The frequent-bigram frame is
    * filtered BEFORE its marginal joins, so the ranking join graph is
    * model-sized; top-k plans as TakeOrdered (no global sort). The
    * products stay < 2^53, so the double quotient is IEEE-exact and
    * micro-unit-rounded ln is engine-portable (the proven idiom). */
  def pmiCollocations(df: DataFrame, id: Column, text: Column,
                      minCount: Long = 5L, k: Int = 50): DataFrame = {
    val bg = bigramStream(df, id, text)
    val w1 = split(col("bg"), " ").getItem(0)
    val w2 = split(col("bg"), " ").getItem(1)
    val bgCnt = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
      .cut() // model consumed by 3 aggregates + the join
    val c1 = bgCnt.groupBy(w1.as("w1")).agg(sum("c12").as("c1"))
    val c2 = bgCnt.groupBy(w2.as("w2")).agg(sum("c12").as("c2"))
    val n = bgCnt.agg(sum("c12").as("n"))
    bgCnt.filter(col("c12") >= minCount)
      .join(c1, w1 === col("w1")).join(c2, w2 === col("w2"))
      .crossJoin(broadcast(n))
      .select(col("bg"), col("c12"),
        floor(log((col("c12") * col("n")).cast("double") /
                  (col("c1") * col("c2")).cast("double")) *
              lit(1000000.0) + lit(0.5)).cast("long").as("pmi_fp"))
      .orderBy(desc("pmi_fp"), col("bg")).limit(k)
  }

  /** Content-defined chunking (Rabin/CDC at token granularity): chunk
    * boundaries fall where the rolling `window`-token hash ≡ 0 mod
    * `modulus`, so boundaries depend on LOCAL content only — insert a
    * paragraph and every chunk outside it keeps its identity (fixed-
    * size chunking shifts every later chunk; this is the rsync/
    * backup-dedup trick, and the chunk-stable unit you want for
    * chunk-level dedup and incremental re-embedding). Expected chunk
    * length ≈ `modulus` tokens; the trailing span always closes at
    * the document end.
    *
    * Scale shape: entirely within-row array math over the bound
    * token-hash array (per-token char-fold computed ONCE, gram folds
    * O(n·window)) + one explode — no shuffle, no state; the hashes
    * are the [[pmiCollocations]]-family portable folds so the oracle
    * replays every boundary. Docs with no tokens emit nothing.
    * Output: (doc_id, chunk_idx, tok_from, tok_to, n_toks,
    * chunk_hash) with 1-based inclusive token spans. */
  def contentChunks(df: DataFrame, id: Column, text: Column,
                    window: Int = 4, modulus: Int = 16): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(modulus >= 1, s"modulus must be >= 1, got $modulus")
    val P = 2147483647L
    val toksD = df.select(id.as("doc_id"),
        filter(tokens(text), t => t =!= "").as("__ts"))
      .filter(size(col("__ts")) > 0)
      .withColumn("__th", transform(col("__ts"), t =>
        aggregate(
          transform(sequence(lit(1), length(t)), i =>
            ascii(t.substr(i, lit(1))).cast("long")),
          lit(7L), (a, ch) => (a * 31L + ch) % P)))
    val th = col("__th")
    val n = size(th)
    def gram(e: Column): Column =
      aggregate(slice(th, e - (window - 1), lit(window)), lit(7L),
        (a, h) => (a * 31L + h) % P)
    val ends = filter(sequence(lit(window), n),
      e => gram(e) % modulus === 0L)
    val withTail = array_distinct(concat(ends, array(n)))
    val spans = transform(sequence(lit(1), size(col("__e2"))), j =>
      struct(j.as("idx"),
        (when(j === 1, 0).otherwise(element_at(col("__e2"), j - 1)) + 1)
          .as("from"),
        element_at(col("__e2"), j).as("to")))
    toksD
      .withColumn("__e2",
        when(n >= window, withTail).otherwise(array(n)))
      .select(col("doc_id"), th.as("__th"),
        explode(spans).as("c"))
      .select(col("doc_id"), col("c.idx").as("chunk_idx"),
        col("c.from").as("tok_from"), col("c.to").as("tok_to"),
        (col("c.to") - col("c.from") + 1).as("n_toks"),
        aggregate(
          slice(col("__th"), col("c.from"),
            col("c.to") - col("c.from") + 1),
          lit(7L), (a, h) => (a * 31L + h) % P).as("chunk_hash"))
  }

  /** Coverage novelty: how many distinct n-gram shingles each document
    * contributes FIRST (no earlier-id document contains them) — the
    * greedy submodular-coverage signal: curating by novelty descending
    * approximates max-coverage selection, and a ~zero-novelty document
    * is pure template/rehash ([[graft.ops.Dedup]] catches near-twins;
    * this catches "nothing new here" against the whole corpus).
    *
    * Scale shape: one shingle explode (per-row dedup inside
    * [[graft.functions.WordShingles]]), one min-aggregate on the
    * shingle key (map-side partials — the keep-first discipline of
    * [[graft.ops.Dedup.dedupParagraphs]]), one count by winning doc,
    * one broadcast-right join back to the id frame for explicit
    * zeros. Integer permille; docs with no shingles report 0/0/0.
    * Output: (doc_id, n_shingles, novel, novelty_permille). */
  def coverageNovelty(df: DataFrame, id: Column, text: Column,
                      n: Int = 3): DataFrame = {
    val sh = df.select(id.as("doc_id"),
      explode(graft.functions.WordShingles(text, n)).as("s"))
    val totals = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val novel = sh.groupBy("s").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("novel"))
    df.select(id.as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("novel"), lit(0L)).as("novel"))
      .withColumn("novelty_permille",
        when(col("n_shingles") === 0L, 0L)
          .otherwise(expr("(1000 * novel) div n_shingles")))
  }

  /** Blocklist screen: per-document match counts against categorized
    * phrase lists (NSFW terms, spam templates, boilerplate markers) —
    * the policy-filter stage of every web-corpus pipeline. Each
    * category compiles to ONE word-boundary alternation regex inside
    * the RE2 subset (same contract as [[redactPii]]), so a category
    * costs one codegen'd scan of the text regardless of phrase count,
    * counts are non-overlapping left-to-right in both engines, and the
    * oracle runs the identical pattern. Narrow per-row map, no
    * shuffle; null text yields null counts and a null flag.
    * Output: (doc_id, n_<category>..., blocked). */
  def blocklistScreen(df: DataFrame, id: Column, text: Column,
                      categories: Seq[(String, Seq[String])])
      : DataFrame = {
    require(categories.nonEmpty, "need at least one category")
    require(categories.map(_._1).distinct.size == categories.size,
      "category names must be distinct")
    val pats = categories.map { case (cat, phrases) =>
      require(phrases.nonEmpty, s"category '$cat' has no phrases")
      phrases.foreach(p => require(p.matches("[a-z0-9 ]+"),
        s"phrase '$p' outside [a-z0-9 ] — escaping differs by engine"))
      cat -> ("\\b(?:" + phrases.mkString("|") + ")\\b")
    }
    val counted = df.select(id.as("doc_id") +: pats.map {
      case (cat, pat) =>
        regexp_count(text, lit(pat)).cast("int").as(s"n_$cat")
    }: _*)
    counted.withColumn("blocked",
      pats.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
  }

  /** Term burstiness (Church & Gale): variance-to-mean ratio of a
    * term's per-document count across the corpus — ~1 for Poisson
    * "background" terms (function words), large for bursty content
    * terms that pile into few documents. The cheap topicality signal:
    * feature selection for the NB/DSIR classifiers, stopword discovery
    * for [[tfIdf]], template detection (a boilerplate phrase's tokens
    * are extremely bursty).
    *
    * Exactness: VMR = (N·Σc² − (Σc)²) / ((N−1)·Σc) with all sufficient
    * statistics exact integer sums (zero-count documents enter through
    * N alone — no dense zero frame is materialized); numerator and
    * denominator stay integers until ONE shared float division,
    * quantized to 1e-4 ([[Checks.olsFitFp]] discipline).
    *
    * Scale shape: one token pass to the (doc, term) count frame, one
    * vocab aggregate, a 1-row doc-count broadcast; top-k plans as
    * TakeOrdered. Output: (term, df_docs, total_cnt, vmr_x1e4). */
  def burstiness(df: DataFrame, id: Column, text: Column,
                 minCount: Long = 20L, k: Int = 40): DataFrame = {
    val tc = df.select(id.as("d"), explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("d", "tok").agg(count(lit(1)).as("c"))
    val nd = df.agg(countDistinct(id).as("nd"))
    val stats = tc.groupBy("tok").agg(
        count(lit(1)).as("df_docs"), sum("c").as("sc"),
        sum(col("c") * col("c")).as("sc2"))
      .filter(col("sc") >= minCount)
    stats.crossJoin(broadcast(nd))
      .select(col("tok").as("term"), col("df_docs"),
        col("sc").as("total_cnt"),
        floor((col("nd") * col("sc2") - col("sc") * col("sc"))
                .cast("double") /
              ((col("nd") - 1L) * col("sc")).cast("double") *
              lit(10000.0) + lit(0.5)).cast("long").as("vmr_x1e4"))
      .orderBy(desc("vmr_x1e4"), col("term")).limit(k)
  }

  /** Dunning log-likelihood (G²) keyness: ranks terms by how strongly
    * their frequency in a TARGET slice diverges from the reference
    * slice (Dunning 1993) — the standard "what vocabulary
    * characterizes this source/language/time-slice" probe, more robust
    * than raw ratio at low counts and the statistically-grounded
    * sibling of [[nbQualityScore]]'s log-odds. `overused` tells the
    * direction (term over- vs under-represented in the target),
    * decided by exact integer cross-multiplication.
    *
    * Scale shape: ONE token pass produces the per-term (target count,
    * reference count) frame via conditional sums (map-side partials);
    * class totals are a 1-row broadcast. G² = 2·Σ obs·ln(obs/exp)
    * evaluates per VOCAB row only, quantized to micro-units with the
    * expected-count ratios expressed over exact integer products, so
    * both engines walk the identical float expression. Terms with
    * a zero observed count contribute 0 from that side (the 0·ln 0
    * limit). Output: top-`k` (term, tgt_cnt, ref_cnt, g2_fp,
    * overused), ties by term. */
  def keynessG2(df: DataFrame, text: Column, isTarget: Column,
                minCount: Long = 5L, k: Int = 40): DataFrame = {
    val tk = df.select(isTarget.as("tgt"),
        explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
    val counts = tk.groupBy("tok").agg(
        sum(when(col("tgt"), 1L).otherwise(0L)).as("a"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("b"))
      .filter(col("a") + col("b") >= minCount)
      .cut() // totals + scoring both consume it
    val tot = counts.agg(sum("a").as("at"), sum("b").as("bt"))
    def d(c: Column): Column = c.cast("double")
    val ab = col("a") + col("b")
    val nab = col("at") + col("bt")
    // obs/exp as exact-integer cross products: a/E1 = a·(A+B)/(A·(a+b))
    val t1 = when(col("a") === 0L, 0.0)
      .otherwise(d(col("a")) *
        log((d(col("a")) * d(nab)) / (d(col("at")) * d(ab))))
    val t2 = when(col("b") === 0L, 0.0)
      .otherwise(d(col("b")) *
        log((d(col("b")) * d(nab)) / (d(col("bt")) * d(ab))))
    counts.crossJoin(broadcast(tot))
      .select(col("tok").as("term"), col("a").as("tgt_cnt"),
        col("b").as("ref_cnt"),
        floor(lit(2.0) * (t1 + t2) * lit(1000000.0) + lit(0.5))
          .cast("long").as("g2_fp"),
        (col("a") * col("bt") > col("b") * col("at")).as("overused"))
      .orderBy(desc("g2_fp"), col("term")).limit(k)
  }

  /** Distributional term similarity over PPMI context vectors
    * (Levy & Goldberg 2014's count baseline): each term's sparse
    * vector holds the positive pointwise mutual information of its
    * ±`window` co-occurring contexts; term pairs rank by cosine. The
    * embedding-free synonym/variant miner — "which tokens behave
    * alike" — feeding vocabulary normalization and query expansion,
    * trained by counting alone so the oracle replays it exactly.
    *
    * Scale shape: co-occurrence pairs form INSIDE each row (offset
    * slices over the bound token array — never a corpus-wide
    * position self-join), reduce to the (term, ctx) count frame, and
    * PMI derives from that frame's own marginals (one pass, two
    * vocab-sized aggregates, a broadcast total). The cosine stage is
    * an inverted-index equi-join on the CONTEXT key — pair cost
    * tracks shared-context mass, never vocab² — and the PPMI
    * positivity cut is itself the hub killer: a context co-occurring
    * with everything has PMI <= 0 against every term and vanishes,
    * so the index's hot keys self-prune (the frequency-cap lever
    * [[Dedup]] needs is built into the weighting here). PPMI
    * quantizes to micro-units; dots and norms accumulate as exact
    * decimal(38,0); floats appear only in the final
    * dot/(sqrt·sqrt) — the [[Checks.olsFitFp]] discipline.
    * Output: top-`k` (t1, t2, sim) by cosine, ties by term pair. */
  def ppmiTermSimilarity(df: DataFrame, id: Column, text: Column,
                         window: Int = 2, minCount: Long = 10L,
                         k: Int = 30): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val toksD = df.select(filter(tokens(text), t => t =!= "").as("__ts"))
    val ts = col("__ts")
    // one (a, b) row per ordered pair at each offset 1..window; the
    // symmetrized union makes context counts direction-free
    val fwd = (1 to window).map { off =>
      toksD.filter(size(ts) > off)
        .select(explode(transform(sequence(lit(1), size(ts) - off), i =>
          struct(element_at(ts, i).as("a"),
                 element_at(ts, i + off).as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
    }.reduce(_ unionByName _)
    val sym = fwd.unionByName(
      fwd.select(col("b").as("a"), col("a").as("b")))
    val cc = sym.groupBy("a", "b").agg(count(lit(1)).as("ctc"))
      .cut() // marginals + total + ppmi all consume it
    val ct = cc.groupBy("a").agg(sum("ctc").as("ctm"))
    val n = cc.agg(sum("ctc").as("nn"))
    val ppmi = cc.filter(col("ctc") >= minCount)
      .join(ct, "a")
      .join(ct.select(col("a").as("b"), col("ctm").as("ccm")), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"),
        floor(log((col("ctc") * col("nn")).cast("double") /
                  (col("ctm") * col("ccm")).cast("double")) *
              lit(1000000.0) + lit(0.5)).cast("long").as("w"))
      .filter(col("w") > 0L)
      .cut() // consumed by norms + both join sides
    val norms = ppmi.groupBy("a")
      .agg(sum((col("w") * col("w")).cast(d38)).as("nsq"))
    val dots = ppmi.select(col("a").as("t1"), col("b"), col("w").as("w1"))
      .join(ppmi.select(col("a").as("t2"), col("b"), col("w").as("w2")),
            "b")
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(sum((col("w1") * col("w2")).cast(d38)).as("dot"))
    dots
      .join(norms.select(col("a").as("t1"), col("nsq").as("n1")), "t1")
      .join(norms.select(col("a").as("t2"), col("nsq").as("n2")), "t2")
      .select(col("t1"), col("t2"),
        round(col("dot").cast("double") /
              (sqrt(col("n1").cast("double")) *
               sqrt(col("n2").cast("double"))), 6).as("sim"))
      .orderBy(desc("sim"), col("t1"), col("t2")).limit(k)
  }

  /** Naive Bayes quality classifier — the CCNet/fastText-style seed
    * classifier in closed form: unigram log-odds are trained from a
    * positive (curated seed) and a negative (background) document set
    * with add-one smoothing over the union vocabulary, and each
    * document is scored by the MEAN token log-odds (positive score =
    * looks like the seed). Reference framing: README.md's quality
    * filtering stage; the standard web-corpus curation classifier.
    *
    * Scale shape: training is two token-count aggregations plus a
    * vocab-sized full-outer join; the only driver state is three
    * scalars (class totals + vocab size). Scoring is one explode, one
    * model join (broadcast by default — vocab is tiny next to the
    * corpus; pass broadcastModel=false to shuffle-join with AQE skew
    * handling when the vocab itself is huge), one per-doc agg.
    *
    * Determinism: log-odds are quantized to integer MICRO-UNITS
    * (round(lo*1e6) as long) before the per-doc sum, so the
    * aggregation is order-independent integer arithmetic — same
    * fixed-point discipline as the k-means trainer — and the oracle
    * replays it exactly. The EXACT outputs are the integer pair
    * (lo_micro_sum, n_tokens); nb_score = lo_micro_sum/1e6/n_tokens is
    * derived for convenience and NOT oracle-compared, because a mean
    * of integers can land on an exact .5 rounding boundary where
    * engines' float-rounding conventions legitimately differ. Tokens
    * absent from the model score as the smoothed unknown (count 0 in
    * both classes). Docs with no tokens produce no row. Output:
    * (doc_id, lo_micro_sum, n_tokens, nb_score). */
  def nbQualityScore(df: DataFrame, id: Column, text: Column,
                     pos: DataFrame, posText: Column,
                     neg: DataFrame, negText: Column,
                     broadcastModel: Boolean = true): DataFrame = {
    // ONE shuffle trains both classes: the pos/neg token streams ride
    // a union tagged with the class, and a single groupBy(tok) with
    // conditional sums replaces two per-class count aggregations plus
    // their vocab-sized full-outer join (r13 — same counts: a token
    // absent from a class sums to 0 exactly as the old coalesce did).
    // Map-side partial aggregation still collapses each input to
    // vocab scale before the exchange.
    // vocab-sized; materialized because BOTH the scalar totals below
    // and the scoring join consume it — without the pin each one
    // re-runs the two full tokenize+count corpus scans
    val m0 = pos.select(explode(tokens(posText)).as("tok"),
        lit(1L).as("isp"))
      .unionByName(neg.select(explode(tokens(negText)).as("tok"),
        lit(0L).as("isp")))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(sum(col("isp")).as("cp"),
           sum(lit(1L) - col("isp")).as("cn"))
      .cut()
    val row = m0.agg(sum("cp"), sum("cn"), count(lit(1))).collect()(0)
    val (np, nn, v) = (row.getLong(0), row.getLong(1), row.getLong(2))
    require(np > 0 && nn > 0,
      "nbQualityScore: both classes need at least one token")
    def lo(c: Column, tot: Long): Column =
      log((c.cast("double") + 1.0) / (tot + v).toDouble)
    val model = m0.select(col("tok"),
      round((lo(col("cp"), np) - lo(col("cn"), nn)) * 1e6)
        .cast("long").as("__lo"))
    val m = if (broadcastModel) broadcast(model) else model
    val unk = math.round(
      (math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))) * 1e6)
    df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .join(m, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("__lo"), lit(unk))).as("lo_micro_sum"),
           count(lit(1)).as("n_tokens"))
      .withColumn("nb_score",
        col("lo_micro_sum") / 1e6 / col("n_tokens"))
  }

  /** DSIR-style importance weights (data selection via importance
    * resampling): each document is weighted by how much more likely its
    * tokens are under a TARGET corpus distribution than under the raw
    * corpus distribution, both estimated over HASHED token buckets —
    * the model is O(buckets) regardless of vocabulary size, which is
    * what lets the method price 100 TB of raw text against a small
    * high-quality target set. Per-bucket add-one-smoothed log ratio
    * ln(p_target/p_raw), quantized to integer micro-units before the
    * per-doc sum (the [[nbQualityScore]] fixed-point discipline:
    * order-independent integer aggregation, bit-exact in the oracle).
    *
    * Scale shape: the char-fold bucket hash (PortableHash.h31 % B,
    * replayed by the oracle as a list_reduce) runs ONLY on the
    * vocab-sized count table — corpus occurrences reach their bucket
    * via the (tok → lo) model join, so the interpreted fold never
    * touches the hot path. Two corpus-wide count aggs + a vocab-sized
    * full-outer join train the model; scoring is one explode, one
    * model join (broadcast by default), one per-doc agg.
    *
    * Exact outputs are (w_micro_sum, n_tokens); the derived
    * dsir_logw = w_micro_sum/1e6/n_tokens is convenience only (same
    * rationale as nb_score). Docs with no tokens produce no row. */
  def dsirWeights(df: DataFrame, id: Column, text: Column,
                  target: DataFrame, targetText: Column,
                  buckets: Int = 256,
                  broadcastModel: Boolean = true): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // vocab-sized; the bucket agg AND the token-model join both
    // consume it — pin once (nbQualityScore discipline). ONE shuffle
    // trains both corpora (tagged union + conditional sums — the
    // nbQualityScore r13 fold; counts identical to the old per-corpus
    // aggs + full-outer join).
    val tok = col("tok")
    val codes = transform(sequence(lit(1), length(tok)), i =>
      ascii(tok.substr(i, lit(1))).cast("long"))
    val hb = df.select(explode(tokens(text)).as("tok"),
        lit(0L).as("ist"))
      .unionByName(target.select(explode(tokens(targetText)).as("tok"),
        lit(1L).as("ist")))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(sum(lit(1L) - col("ist")).as("cr"),
           sum(col("ist")).as("ct"))
      .withColumn("b",
        aggregate(codes, lit(7L),
          (a, ch) => (a * 31L + ch) % 2147483647L) % buckets)
      .cut()
    // B rows; consumed by the scalar totals and the per-bucket model
    val bc = hb.groupBy("b")
      .agg(sum("cr").as("crb"), sum("ct").as("ctb"))
      .cut()
    val row = bc.agg(sum("crb"), sum("ctb")).collect()(0)
    val (tr, tt) = (row.getLong(0), row.getLong(1))
    require(tr > 0 && tt > 0,
      "dsirWeights: both corpora need at least one token")
    def lp(c: Column, tot: Long): Column =
      log((c.cast("double") + 1.0) / (tot + buckets).toDouble)
    val bm = bc.select(col("b"),
      round((lp(col("ctb"), tt) - lp(col("crb"), tr)) * 1e6)
        .cast("long").as("__lo"))
    val tm0 = hb.join(bm, "b").select(tok, col("__lo"))
    val tm = if (broadcastModel) broadcast(tm0) else tm0
    df.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .filter(tok =!= "")
      .join(tm, Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("__lo")).as("w_micro_sum"),
           count(lit(1)).as("n_tokens"))
      .withColumn("dsir_logw",
        col("w_micro_sum") / 1e6 / col("n_tokens"))
  }

  /** Closed DSIR model: per-bucket micro-unit log ratios plus the
    * empty-bucket (unseen-at-training) score. O(buckets) driver state
    * — small enough to ship into a plan as a literal, which is what
    * makes the gate run on unbounded streams
    * ([[graft.streaming.EventStreams.dsirGateStream]]). */
  final case class DsirModel(byBucket: Map[Long, Long], unk: Long,
                             buckets: Int)

  /** Train the [[dsirWeights]] bucket model and CLOSE it (collect the
    * B rows). Same counts, smoothing, and rounding as the frame-based
    * op — a doc scores identically under either path. */
  def dsirModel(df: DataFrame, text: Column,
                target: DataFrame, targetText: Column,
                buckets: Int = 256): DsirModel = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // one-shuffle tagged-union trainer (the dsirWeights/nbQualityScore
    // r13 fold — identical counts)
    val tok = col("tok")
    val codes = transform(sequence(lit(1), length(tok)), i =>
      ascii(tok.substr(i, lit(1))).cast("long"))
    val bc = df.select(explode(tokens(text)).as("tok"),
        lit(0L).as("ist"))
      .unionByName(target.select(explode(tokens(targetText)).as("tok"),
        lit(1L).as("ist")))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(sum(lit(1L) - col("ist")).as("cr"), sum(col("ist")).as("ct"))
      .select(col("cr"), col("ct"),
              (aggregate(codes, lit(7L),
                (a, ch) => (a * 31L + ch) % 2147483647L) % buckets)
                .as("b"))
      .groupBy("b").agg(sum("cr").as("crb"), sum("ct").as("ctb"))
      .cut()
    val row = bc.agg(sum("crb"), sum("ctb")).collect()(0)
    val (tr, tt) = (row.getLong(0), row.getLong(1))
    require(tr > 0 && tt > 0,
      "dsirModel: both corpora need at least one token")
    def lp(c: Column, tot: Long): Column =
      log((c.cast("double") + 1.0) / (tot + buckets).toDouble)
    val m = bc.select(col("b"),
        round((lp(col("ctb"), tt) - lp(col("crb"), tr)) * 1e6)
          .cast("long").as("lo"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unk = math.round(
      (math.log(1.0 / (tt + buckets)) -
       math.log(1.0 / (tr + buckets))) * 1e6)
    DsirModel(m, unk, buckets)
  }

  /** Sliding token-window chunking — long documents split into
    * `window`-token chunks every `stride` tokens (stride < window =
    * overlap), the standard pre-tokenization shaping for context-bound
    * models. Chunk count = 1 for docs of <= window tokens, else
    * ceil((n - window)/stride) + 1 (integer form: (n - window +
    * stride - 1) div stride + 1; the tail chunk may be partial).
    * Narrow explode — no shuffle, chunk identity (doc_id, chunk_id) is
    * deterministic, and the formula is replayed 1:1 by the oracle. */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1,
      s"need window >= 1 and stride >= 1, got $window/$stride")
    val toks = tokens(text)
    val n = size(toks)
    // floor((n - window + stride - 1) / stride): token counts are far
    // below 2^53, so double division + floor is exact integer division
    val lastIdx = floor((n - window + stride - 1) / stride).cast("int")
    val starts = when(n <= window, array(lit(0)))
      .otherwise(transform(sequence(lit(0), lastIdx), i => i * stride))
    df.select(id.as("doc_id"), toks.as("__toks"),
        posexplode(starts).as(Seq("chunk_id", "__start")))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(window)), " ")
          .as("chunk_text"),
        least(lit(window), size(col("__toks")) - col("__start"))
          .as("chunk_tokens"))
  }

  /** TF-IDF term scores: tf = in-doc count, idf = ln((N+1)/(df+1))
    * (smoothed), score = tf * idf. Two shuffles — (doc, term) counts,
    * then term document-frequencies joined back on the term. The df
    * table is |vocabulary|-sized, so the join is NOT hinted: AQE
    * broadcasts it when it fits and falls back to a shuffle join when a
    * web-scale vocabulary doesn't; `minDf` prunes the long hapax tail
    * (terms in fewer docs carry high idf but match nothing downstream).
    * The doc count N is one row — broadcast-trivial. */
  def tfIdf(df: DataFrame, id: Column, text: Column,
            minDf: Int = 1): DataFrame = {
    val terms = df.select(id.as("doc_id"), explode(tokens(text)).as("term"))
    // (doc, term)-sized; materialized — doc frequencies AND the final
    // join both consume it, and unpinned each re-runs the full
    // tokenize+aggregate pass
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .cut()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val n = df.select(countDistinct(id).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * log((col("n_docs") + 1).cast("double") /
                         (col("df") + 1))).as("tfidf"))
  }
}
