package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Distributed BPE (byte-pair encoding) tokenizer training — the
  * vocabulary-learning pass a training-data pipeline runs before it can
  * count or pack "real" model tokens (Sennrich et al. 2016; the GPT-2 /
  * SentencePiece training loop, minus byte-fallback).
  *
  * Scale shape: the one move that makes BPE training tractable on a
  * 100 TB corpus is compressing it to a WORD-FREQUENCY table first
  * ([[wordCounts]] — one corpus-wide aggregation). Every subsequent
  * pair-count and merge iteration runs over unique words weighted by
  * count: ~10^7 vocabulary rows instead of ~10^10 token occurrences, a
  * thousand-fold shrink before the iterative part begins. Each merge
  * iteration is then one vocab-sized narrow map (the merge rewrite) plus
  * one explode+agg (pair counts) — and the argmax collect is ONE row per
  * iteration, the only driver state.
  *
  * Reference scope: faconne has no tokenizer trainer (`src/` holds only
  * the transform core); this is part of the LLM-pipeline extension tier
  * alongside dedup/packing/mixing.
  */
object Bpe {

  /** Corpus word-frequency table `(word, cnt)`, empty tokens dropped.
    * One shuffle on word with map-side partial counts. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(tokens(text)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Iteration-0 BPE pair statistics: corpus-weighted frequency of every
    * adjacent CHARACTER pair inside words (each 2-char substring counts
    * once per occurrence, weighted by the word's corpus count), top
    * `topN` by (count desc, pair asc) — the statistic whose argmax is
    * the first BPE merge. Deterministic and oracle-exact (q105).
    *
    * Plan: word-count agg, a narrow explode over VOCAB rows only, one
    * more small agg, TakeOrdered for the top-N (no global sort). */
  def pairStats(df: DataFrame, text: Column, topN: Int): DataFrame = {
    val w = col("word")
    // sequence(1, 0) steps DOWN ([1, 0]) — single-char words must yield
    // no pairs, not two phantom ones (same guard as polyHash62)
    val pairs = wordCounts(df, text).select(col("cnt"),
      explode(when(length(w) >= 2,
          transform(sequence(lit(1), length(w) - 1), i =>
            w.substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))).as("pair"))
    pairs.groupBy("pair").agg(sum(col("cnt")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topN)
  }

  /** One greedy left-to-right merge pass over a symbol array: each
    * adjacent `(a, b)` becomes the single symbol `a + b`. Standard BPE
    * scan order — after a merge the NEW symbol is the left context for
    * the next comparison, so "aaa" under (a,a) → [aa, a], never [a, aa].
    * try_element_at returns null on the empty accumulator and null
    * comparisons fall through to append, so no size guard is needed. */
  private[ops] def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (out, s) =>
      when(try_element_at(out, lit(-1)) === lit(a) && s === lit(b),
          concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(s))))

  /** Learn `numMerges` merges from the corpus, most-frequent-first.
    * Tie-break on (count desc, a asc, b asc) keeps the learned
    * tokenizer bit-reproducible across runs and partitionings.
    *
    * Per iteration: one explode+agg over the vocab table for pair
    * counts, a 1-row TakeOrdered collect (the argmax — the only driver
    * state), and one narrow merge rewrite. The vocab frame is
    * localCheckpointed each round so lineage doesn't snowball over
    * numMerges chained jobs (the k-means trainer discipline). Stops
    * early when no pair occurs twice (count < 2 merges would only
    * memorize hapax words). */
  def train(df: DataFrame, text: Column, numMerges: Int)
      : Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val sy = col("syms")
    var vocab = wordCounts(df, text).select(col("cnt"),
        transform(sequence(lit(1), length(col("word"))), i =>
          col("word").substr(i, lit(1))).as("syms"))
      .cut()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = numMerges > 0
    while (continue) {
      val top = vocab.select(col("cnt"),
          explode(when(size(sy) >= 2,
              transform(sequence(lit(1), size(sy) - 1), i =>
                struct(element_at(sy, i).as("a"),
                       element_at(sy, i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>")))
            .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = vocab
          .select(col("cnt"), mergeOnce(sy, a, b).as("syms"))
          .cut()
        vocab = next
        continue = merges.size < numMerges
      }
    }
    merges.toSeq
  }

  /** Encode text with a learned merge list: whitespace words → char
    * symbols → each merge replayed in learned order → subword tokens
    * (flattened, word boundaries never crossed — standard BPE).
    *
    * This is the REFERENCE semantics and test path: each merge is one
    * interpreted fold over the symbol array, so cost is
    * O(merges × length) per row. Fine for spec-scale corpora and for
    * re-tokenizing the vocab table; a production corpus-wide encode
    * would compile the closed merge table into a native longest-match
    * kernel (the [[graft.functions.GramMassStats]] pattern) — the
    * training side above is the distributed-systems part. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val words = filter(tokens(text), w => w =!= "")
    flatten(transform(words, w => {
      val chars = transform(sequence(lit(1), length(w)), i =>
        w.substr(i, lit(1)))
      merges.foldLeft(chars) { case (acc, (a, b)) => mergeOnce(acc, a, b) }
    }))
  }

  /** Corpus token count under a learned tokenizer — the "how many model
    * tokens is this corpus" answer with the REAL learned vocabulary,
    * computed over the word-frequency table (encode cost ~ vocab, never
    * corpus): sum over unique words of cnt × |encode(word)|. */
  def tokenCountUnder(df: DataFrame, text: Column,
                      merges: Seq[(String, String)]): DataFrame =
    wordCounts(df, text)
      .select((col("cnt") * size(
        merges.foldLeft(
          transform(sequence(lit(1), length(col("word"))), i =>
            col("word").substr(i, lit(1)))) {
          case (acc, (a, b)) => mergeOnce(acc, a, b)
        })).as("toks"))
      .agg(sum(col("toks")).as("n_tokens"))
}
