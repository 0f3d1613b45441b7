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

  /** Keep documents whose predicted language is `lang`
    * ([[TextAnalysis.langIdOf]]). */
  def filterLang(lang: String): Pipeline = {
    val keep = TextAnalysis.langIdOf(df, id, text)
      .filter(col("pred_lang") === lang)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(keep, idCol))
  }

  /** Keep documents at or above the composite quality score
    * ([[TextAnalysis.quality]], x1e4 fixed-point). */
  def filterQuality(minQualityX1e4: Long): Pipeline = {
    val keep = TextAnalysis.quality(df, id, text)
      .filter(col("quality_x1e4") >= minQualityX1e4)
      .select(col("doc_id").as(idCol))
    copy(df = df.join(keep, idCol))
  }

  /** Keep documents whose compressibility is at or above `minRatio`
    * (repetitive/templated text crushes under deflate —
    * [[TextAnalysis.compressionRatio]]). */
  def filterCompressibility(minRatio: Double): Pipeline =
    copy(df = df.filter(TextAnalysis.compressionRatio(text) >= minRatio))

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

  /** Surviving documents, original schema. */
  def result: DataFrame = df

  /** One-row accounting: surviving docs + whitespace tokens. */
  def stats: DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
           sum(size(split(text, " "))).as("sum_tokens"))
}
