package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent corpus-preprocessing funnel — the user-facing composition of
  * the pipeline operators (each stage is one of the individually
  * oracle-proven ops; q42 is this funnel hand-assembled). Stages are
  * lazy DataFrame transformations: nothing executes until an action, and
  * Catalyst fuses the narrow stages into the scan.
  *
  * {{{
  * Pipeline(docs, "doc_id", "text")
  *   .filterLang("en")
  *   .filterQuality(minQualityX1e4 = 4500)
  *   .dedupExactByPrefix(nTokens = 8)
  *   .removeNearDups(tau = 0.8)
  *   .result               // surviving rows, original schema
  * }}}
  */
final case class Pipeline(df: DataFrame, idCol: String, textCol: String) {

  private def id: Column = col(idCol)
  private def text: Column = col(textCol)

  /** Keep documents whose predicted language is `lang` — the same
    * classifier as [[TextAnalysis.langIdOf]], applied as a pure
    * per-row PREDICATE. An earlier form joined a derived score frame
    * back on id; because each later stage derives its own frame from
    * the current `df`, that join made every downstream stage re-run
    * the whole upstream funnel once more (measured 7x on the q52
    * funnel at sf0.1). A narrow filter fuses into the scan and keeps
    * the funnel's lineage linear. */
  def filterLang(lang: String): Pipeline =
    copy(df = df.filter(
      graft.functions.TextFunctions.langId(
        graft.functions.TextFunctions.tokens(text)) === lang))

  /** Keep documents at or above the composite quality score
    * ([[TextAnalysis.qualityScoreX1e4]], x1e4 fixed-point) — per-row
    * predicate, same rationale as [[filterLang]]. */
  def filterQuality(minQualityX1e4: Long): Pipeline =
    copy(df = df.filter(
      TextAnalysis.qualityScoreX1e4(text) >= minQualityX1e4))

  /** Keep documents whose compressibility is at or above `minRatio`
    * (repetitive/templated text crushes under deflate —
    * [[TextAnalysis.compressionRatio]]). */
  def filterCompressibility(minRatio: Double): Pipeline =
    copy(df = df.filter(TextAnalysis.compressionRatio(text) >= minRatio))

  /** Drop documents matching ANY category of a phrase blocklist
    * ([[TextAnalysis.blocklistScreen]]'s flag as a pure per-row
    * predicate — one word-boundary alternation regex per category,
    * fused into the scan; same narrow-stage rationale as
    * [[filterLang]]). Null text is dropped (cannot be screened). */
  def filterBlocklist(categories: Seq[(String, Seq[String])]): Pipeline = {
    val hit = categories.map { case (cat, phrases) =>
      require(phrases.nonEmpty, s"category '$cat' has no phrases")
      phrases.foreach(p => require(p.matches("[a-z0-9 ]+"),
        s"phrase '$p' outside [a-z0-9 ] — escaping differs by engine"))
      regexp_count(text,
        lit("\\b(?:" + phrases.mkString("|") + ")\\b")) > 0
    }.reduce(_ || _)
    copy(df = df.filter(!coalesce(hit, lit(true))))
  }

  /** Keep documents contributing at least `minPermille` first-seen
    * shingles ([[TextAnalysis.coverageNovelty]]) — drops "nothing new
    * here" rehash against the whole corpus. A derived-frame stage
    * (novelty is corpus-relative), joined back on id like
    * [[removeNearDups]]. */
  def filterNovelty(minPermille: Long, n: Int = 3): Pipeline = {
    val keep = TextAnalysis.coverageNovelty(df, id, text, n)
      .filter(col("novelty_permille") >= minPermille)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(keep, idCol))
  }

  /** Exact dedup: keep the lowest id per `nTokens`-token prefix key
    * ([[Dedup.exactKeepFirst]]). */
  def dedupExactByPrefix(nTokens: Int): Pipeline = {
    val kept = Dedup.exactKeepFirst(df,
        concat_ws(" ", slice(split(text, " "), 1, nTokens)), id)
      .select(col("kept").as(idCol))
    copy(df = df.join(kept, idCol))
  }

  /** Near-dup removal: drop the higher id of each jaccard >= tau pair
    * ([[Dedup.jaccardPairs]]; swap in minhashLshPairs at corpus scale
    * via `removeNearDupsLsh`). */
  def removeNearDups(tau: Double): Pipeline = {
    val dups = Dedup.jaccardPairs(df, id, text, tau)
      .select(col("id2").as(idCol)).distinct()
    copy(df = df.join(dups, Seq(idCol), "left_anti"))
  }

  /** Near-dup removal via MinHash LSH — the corpus-scale path (same
    * keep-lower-id policy, probabilistic candidate generation with
    * exact verification). */
  def removeNearDupsLsh(tau: Double): Pipeline = {
    val dups = Dedup.minhashLshPairs(df, id, text, tau)
      .select(col("id2").as(idCol)).distinct()
    copy(df = df.join(dups, Seq(idCol), "left_anti"))
  }

  /** Near-dup removal by duplicate CLUSTER: connected components over
    * the MinHash-LSH pair graph ([[Dedup.connectedComponents]]), keeping
    * the minimum id per component. The transitive policy — a chain
    * a~b~c collapses to one survivor even when a,c are not directly
    * similar, where the per-pair policy of [[removeNearDups]] can keep
    * both endpoints of an unseen transitive pair. */
  def removeNearDupClusters(tau: Double): Pipeline = {
    val cc = Dedup.connectedComponents(
      Dedup.minhashLshPairs(df, id, text, tau), col("id1"), col("id2"))
    val drop = cc.filter(col("id") =!= col("comp")).select(col("id").as(idCol))
    copy(df = df.join(drop, Seq(idCol), "left_anti"))
  }

  /** Containment (partial-overlap) removal: drop the higher id of every
    * pair sharing >= `minShared` winnowed fingerprints
    * ([[Dedup.winnowContainmentPairs]]) — the stage that catches a long
    * duplicated PASSAGE inside otherwise-different documents, which the
    * whole-doc jaccard stages dilute below any workable tau. */
  def removeContained(minShared: Int = 3, maxDocFreq: Int = 20): Pipeline = {
    val dups = Dedup.winnowContainmentPairs(df, id, text,
        minShared = minShared, maxDocFreq = maxDocFreq)
      .select(col("id2").as(idCol)).distinct()
    copy(df = df.join(dups, Seq(idCol), "left_anti"))
  }

  /** Leakage-safe train/val/test assignment over the CURRENT funnel
    * frame ([[Sampling.leakageSafeSplit]] on the MinHash-LSH pair
    * graph): appends `split`, guaranteeing no near-dup pair straddles
    * splits. Run AFTER the dedup stages — what survives them is what
    * the split must protect. */
  def splitLeakageSafe(weights: Seq[(String, Double)], tau: Double = 0.6,
                       seed: Long = 0L): Pipeline = {
    val pairs = Dedup.minhashLshPairs(df, id, text, tau)
    copy(df = Sampling.leakageSafeSplit(df, id, pairs,
      col("id1"), col("id2"), weights, seed))
  }

  /** Keep documents the NB seed classifier scores at or above
    * `minMeanMicro` micro-units of mean token log-odds
    * ([[TextAnalysis.nbQualityScore]]; 0 = "more seed-like than
    * background"). The cut compares integers — lo_micro_sum >=
    * minMeanMicro * n_tokens — so it is exact and engine-portable. */
  def filterSeedQuality(pos: DataFrame, posText: Column,
                        neg: DataFrame, negText: Column,
                        minMeanMicro: Long): Pipeline = {
    val keep = TextAnalysis.nbQualityScore(df, id, text,
        pos, posText, neg, negText)
      .filter(col("lo_micro_sum") >= lit(minMeanMicro) * col("n_tokens"))
      .select(col("doc_id").as(idCol))
    copy(df = df.join(keep, Seq(idCol), "left_semi"))
  }

  /** Keep documents DSIR prices at or above `minMeanMicro` micro-units
    * of mean hashed-bucket target-vs-raw log ratio
    * ([[TextAnalysis.dsirWeights]]; 0 = "more target-like than the raw
    * corpus"). Same exact integer cut as [[filterSeedQuality]]. */
  def filterDsir(target: DataFrame, targetText: Column,
                 minMeanMicro: Long, buckets: Int = 256): Pipeline = {
    val keep = TextAnalysis.dsirWeights(df, id, text,
        target, targetText, buckets)
      .filter(col("w_micro_sum") >= lit(minMeanMicro) * col("n_tokens"))
      .select(col("doc_id").as(idCol))
    copy(df = df.join(keep, Seq(idCol), "left_semi"))
  }

  /** [[removeNearDupClusters]] with a keep-BEST policy: the surviving
    * member of each duplicate cluster is the one maximizing `score`
    * (ties -> smallest id) instead of the smallest id — keep the
    * longest / highest-quality copy ([[Dedup.keepBestPerCluster]]). */
  def removeNearDupClustersKeepBest(tau: Double, score: Column): Pipeline =
    copy(df = Dedup.keepBestPerCluster(df,
      Dedup.minhashLshPairs(df, id, text, tau), id, score))

  /** Semantic (embedding-space) near-dup removal, SemDeDup-style:
    * cluster-route the document embeddings, find within-cluster cosine
    * pairs ([[Similarity.semDedupPairs]]), drop the higher id of each —
    * the same keep-lower-id policy as the lexical stages, so semantic
    * and lexical dedup compose in either order. `embeddings` is the
    * (doc id, vector) side table. */
  def removeSemanticDups(embeddings: DataFrame, embId: Column,
                         embVec: Column, tau: Double,
                         k: Int = 8, iters: Int = 2): Pipeline = {
    val dups = Similarity.semDedupPairs(embeddings, embId, embVec,
        tau, k, iters)
      .select(col("id2").as(idCol)).distinct()
    copy(df = df.join(dups, Seq(idCol), "left_anti"))
  }

  /** Semantic dedup at CORPUS-ADAPTIVE cost
    * ([[Similarity.semDedupPairsAuto]] — k ~ sqrt(n), sampled Lloyd
    * training): the scale form of [[removeSemanticDups]], same
    * keep-lower-id policy. */
  def removeSemanticDupsAuto(embeddings: DataFrame, embId: Column,
                             embVec: Column, tau: Double): Pipeline = {
    val dups = Similarity.semDedupPairsAuto(embeddings, embId, embVec,
        tau)
      .select(col("id2").as(idCol)).distinct()
    copy(df = df.join(dups, Seq(idCol), "left_anti"))
  }

  /** REWRITE stage: corpus-wide CDC chunk dedup
    * ([[Dedup.cdcDedupSegments]]) — documents keep only the first
    * corpus occurrence of each content-defined chunk and reassemble;
    * the shift-robust boilerplate remover (an edit upstream of a
    * repeated passage does not hide it from a fixed grid). Documents
    * rewritten to empty survive the stage — compose `filterQuality`
    * or a length gate after, as policy. */
  def dedupCdcChunks(maskBits: Int = 6): Pipeline = {
    val rewritten = Dedup.cdcDedupSegments(df, id, text, maskBits)
      .select(col("id").as(idCol), col("text_deduped"))
    copy(df = df.drop(textCol).join(rewritten, idCol)
      .withColumnRenamed("text_deduped", textCol))
  }

  /** REWRITE stage: exact duplicated-substring dedup
    * ([[Dedup.dedupSubstrings]]) — every character run ≥ `gramLen`
    * repeated corpus-wide is spliced out except at its first
    * occurrence (Lee et al.'s exact-substring training-data dedup as
    * a fluent stage; the sliding-window complement of the
    * [[dedupCdcChunks]] chunk grid). Documents rewritten to empty
    * survive — compose `filterQuality` or a length gate after. */
  def dedupSubstringRuns(gramLen: Int = 25): Pipeline = {
    val rewritten = Dedup.dedupSubstrings(df, id, text, gramLen)
      .select(col("id").as(idCol), col("text_deduped"))
    copy(df = df.drop(textCol).join(rewritten, idCol)
      .withColumnRenamed("text_deduped", textCol))
  }

  /** Keep documents below a repetition ceiling: the n-gram duplicate
    * character-mass fraction ([[TextAnalysis.repetitionSignals]],
    * Gopher-style, x1e4 fixed-point) must stay under `maxDupX1e4`. */
  def filterRepetition(maxDupX1e4: Long, n: Int = 2): Pipeline = {
    val keep = TextAnalysis.repetitionSignals(df, id, text, Seq(n))
      .filter(col(s"dup${n}_x1e4") <= maxDupX1e4)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(keep, idCol))
  }

  /** Drop documents sharing >= minHits distinct n-grams with a held-out
    * eval set ([[Dedup.decontaminate]] — broadcast eval shingles). */
  def decontaminateAgainst(evalSet: DataFrame, evalText: Column,
                           n: Int = 13, minHits: Int = 1): Pipeline =
    copy(df = Dedup.decontaminate(df, evalSet, id, text, evalText,
      n, minHits))

  /** Scrub PII in place: the text column is replaced by its redacted
    * form ([[TextAnalysis.redactPii]]'s replacement passes), schema
    * otherwise unchanged. */
  def redactPii(): Pipeline = {
    val cleaned = TextAnalysis.redactPii(df, id, text)
      .select(col("doc_id").as(idCol), col("clean_text"))
    copy(df = df.drop(textCol).join(cleaned, idCol)
      .withColumnRenamed("clean_text", textCol))
  }

  /** Keep the top `fraction` of each stratum by the built-in quality
    * score ([[Relational.topFractionPerGroup]] over
    * [[TextAnalysis.quality]] — the "best X% of each source by
    * score" curation cut, rank-based and deterministic). */
  def keepTopQuality(strata: Column, fraction: Double): Pipeline = {
    val scored = TextAnalysis.quality(df, id, text)
      .select(col("doc_id").as(idCol), col("quality_x1e4"))
    val kept = Relational.topFractionPerGroup(
      df.join(scored, idCol), strata, col("quality_x1e4"), id, fraction)
    copy(df = kept.drop("quality_x1e4"))
  }

  /** Deterministically downsample per stratum
    * ([[Sampling.stratifiedSample]] — e.g. rebalance languages). */
  def sampleStratified(strata: Column, rates: Seq[(String, Double)],
                       defaultRate: Double = 0.0): Pipeline =
    copy(df = Sampling.stratifiedSample(df, id, strata, rates,
      defaultRate))

  /** Surviving documents, original schema. */
  def result: DataFrame = df

  /** Terminal: write the surviving corpus as deterministic shuffle
    * shards (one partition dir per shard, `pos_in_shard` order key)
    * and return the shard manifest
    * ([[graft.sources.Sources.writeShards]]). */
  def writeSharded(path: String, numShards: Int,
                   seed: Long = 0L): DataFrame =
    graft.sources.Sources.writeShards(df, id, textCol, path, numShards,
      seed)

  /** Terminal: context-window chunks of the surviving corpus
    * ([[TextAnalysis.chunkTokens]]). */
  def chunks(window: Int, stride: Int): DataFrame =
    TextAnalysis.chunkTokens(df, id, text, window, stride)

  /** Terminal: fixed-length sequence-packing manifest of the surviving
    * corpus ([[Packing.packSequences]]). */
  def packed(seqLen: Int, partitions: Int = 32): DataFrame =
    Packing.packSequences(df, id, text, seqLen, partitions)

  /** Terminal: length-bucketed batch manifest of the surviving corpus
    * ([[Packing.lengthBucketBatches]] — pad to the bucket, not the
    * corpus max). */
  def batched(bucketWidth: Int, batchSize: Int,
              partitions: Int = 32): DataFrame =
    Packing.lengthBucketBatches(df, id, text, bucketWidth, batchSize,
      partitions)

  /** Terminal: deterministic shuffled-shard manifest of the surviving
    * corpus ([[Packing.shuffleShards]]). */
  def sharded(numShards: Int, seed: Long = 0L,
              partitions: Int = 32): DataFrame =
    Packing.shuffleShards(df, id, numShards, seed, partitions)

  /** Terminal: the surviving corpus repeated `rate` times with an
    * `epoch` tag ([[Sampling.epochUpsample]]). Terminal because the
    * id column stops being unique once rows repeat — run dedup and
    * curation stages first, upsample last. */
  def upsampled(rate: Double, seed: Long = 0L): DataFrame =
    Sampling.epochUpsample(df, id, rate, seed)

  /** One-row accounting: surviving docs + whitespace tokens. */
  def stats: DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
           sum(size(split(text, " "))).as("sum_tokens"))

  /** Plant a free row/token counter at this point in the funnel via
    * Spark's Observation API: the metrics ride the SAME action that
    * materializes the result (accumulator-backed plan node), so
    * per-stage attrition accounting costs ZERO extra scans — at
    * 100 TB the alternative (`.count()` between stages) re-runs the
    * whole upstream funnel once per stage. Read `obs.get` after the
    * terminal action completes. Each Observation name must be unique
    * within one query. */
  def observed(obs: org.apache.spark.sql.Observation): Pipeline =
    copy(df = df.observe(obs, count(lit(1)).as("n_rows"),
      sum(size(split(text, " "))).as("n_tokens")))
}

object Pipeline {

  /** Start the funnel from raw HTML pages: [[Html.extractTextDf]]'s
    * main-text extraction (block split, entity decode, link-density
    * boilerplate drop) becomes the pipeline's text column — the
    * crawl-side entry point, so `Warc.readWarcRecords → fromHtml →
    * quality/dedup stages` is the whole ingest path in one fluent
    * chain. Narrow per-row kernel; fuses into the page scan. */
  def fromHtml(pages: DataFrame, idCol: String, htmlCol: String,
               minChars: Int = 5, densityNum: Int = 1,
               densityDen: Int = 3): Pipeline =
    Pipeline(Html.extractTextDf(pages, idCol, htmlCol, minChars,
        densityNum, densityDen)
      .select(col(idCol), col("text")), idCol, "text")
}
