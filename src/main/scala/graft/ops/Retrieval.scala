package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Sparse keyword retrieval — the inverted-index complement of the dense
  * ANN paths in [[Similarity]]. A training-data pipeline needs it for
  * targeted corpus probes ("every document about X"), seed-set expansion
  * for classifier bootstrapping, and eval-set construction. */
object Retrieval {

  /** BM25 (Robertson/Spärck Jones; the Lucene-default `k1`/`b` and the
    * non-negative `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant)
    * top-k retrieval of documents for a query set.
    *
    * Scale shape: the term-frequency frame (the inverted index) is the
    * one corpus-sized artifact — built with a single (doc, term)
    * shuffle and immediately cut down by the BROADCAST query-term join
    * (queries are human-sized; the corpus never joins all its terms to
    * anything). Document frequencies ride the same tf frame
    * (vocab-sized aggregate), corpus stats are one broadcast row, and
    * the final per-query ranking is [[Relational.topKScored]]'s
    * partial-top-k aggregator — k-row buffers merge map-side, no
    * full-score-matrix shuffle, no window. At 100 TB the tf frame is
    * the thing you persist (bucket it by term for shuffle-free daily
    * probes); everything downstream is query-sized.
    *
    * Determinism: float expressions are structured IDENTICALLY to the
    * oracle SQL (same literals, same association — `k1 + 1.0` stays a
    * runtime sum because the SQL's `(1.2 + 1)` is not the double
    * literal `2.2`), per-pair scores round half-up at 1e-6 before
    * ranking, ties break by ascending doc id. Query terms are
    * DISTINCT per query (repeating a term in a query does not double
    * its weight); empty tokens carry no signal and are dropped on both
    * the doc and query side. */
  def bm25(docs: DataFrame, id: Column, text: Column,
           queries: DataFrame, qid: Column, qtext: Column,
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tk = docs.select(id.as("doc_id"), tokens(text).as("__toks"))
    val lens = tk.select(col("doc_id"), size(col("__toks")).as("dl"))
    val terms = tk.select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
    // (doc, term)-sized; materialized — doc frequencies AND the scoring
    // join both consume it, and unpinned each re-runs the full
    // tokenize+aggregate pass
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .cut()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
                         sum(col("dl")).as("total_dl"))
    val qterms = queries.select(qid.as("qid"),
        explode(array_distinct(tokens(qtext))).as("term"))
      .filter(col("term") =!= "")
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + 0.5) /
      (col("df").cast("double") + 0.5))
    val norm = col("tf").cast("double") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl") * col("n_docs") / col("total_dl"))))
    val scored = tf.join(broadcast(qterms), "term")
      .join(dfreq, "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("qid", "doc_id")
      .agg(round(sum(idf * norm), 6).as("score"))
    Relational.topKScored(scored, col("qid"), col("score"),
      col("doc_id"), k, idName = "doc_id")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of ranked
    * retrieval lists: score(q, d) = Σ over lists of 1/(k0 + rank) —
    * the standard way to ensemble heterogeneous retrievers (BM25 +
    * dense ANN, different parameterizations, ...) because it needs
    * only RANKS, never the incomparable raw scores. Each input frame
    * must carry (qid, doc_id, rank); a doc absent from a list simply
    * contributes nothing (no imputation — the usual convention).
    *
    * Determinism: every term is 1/(k0 + rank) with integer
    * denominators — identical IEEE division in any engine — and the
    * per-doc sum has at most `lists.size` addends, rounded half-even
    * at 1e-6 before the final ranking (ties by doc id). Scale: inputs
    * are top-k-sized (k rows per query per list — retrieval output,
    * not corpora); the union + (qid, doc) agg + partial top-k all
    * operate on that tiny frame. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10,
              k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contrib = lists.map(_.select(col("qid"), col("doc_id"),
      (lit(1.0) / (lit(k0) + col("rank"))).as("__c")))
    val scored = contrib.reduce(_ unionByName _)
      .groupBy("qid", "doc_id")
      .agg(round(sum(col("__c")), 6).as("score"))
    Relational.topKScored(scored, col("qid"), col("score"),
      col("doc_id"), k, idName = "doc_id")
  }
}
