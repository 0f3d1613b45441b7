package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-text extraction — the web-crawl curation step between
  * the raw fetch and every text op: strip markup/head/script/style,
  * split into blocks, decode entities, and drop link-dense
  * boilerplate (nav bars, footers) by the jusText link-density test.
  * The kernel is the codegen'd [[graft.functions.HtmlExtract]]
  * expression (one compiled pass per page, no UDF, stays inside
  * whole-stage codegen); this object adds the DataFrame plumbing and
  * the deterministic page synthesizer the oracle replays.
  *
  * Scale shape: pure per-row expressions — no shuffle, no state; at
  * 100 TB the extraction rides the scan of whatever source holds the
  * raw pages (see [[Warc]] for the container side).
  */
object Html {

  /** One deterministic HTML page per row, built from (`id`, `text`):
    * head (title + style + a script whose body contains `<`, `"` and
    * a fake `</p>` — the classic raw-text-element traps), a nav bar
    * and footer of pure links (boilerplate the extractor must drop),
    * an `<h1>` with an `&amp;` entity, one `<p>` per `width`-char
    * slice of `text` (entity-encoded, so corpus text containing
    * `&<>"'` round-trips), and one paragraph with an inline anchor
    * and an `&#8212;` numeric entity (content a link-density test
    * must NOT drop). Every byte is a closed-form function of
    * (id, text) — the DuckDB oracle rebuilds the expected extraction
    * without parsing HTML, so an extractor defect breaks the hash. */
  def synthHtml(df: DataFrame, id: Column, text: Column,
                width: Int = 100): DataFrame = {
    require(width >= 1, s"synthHtml: width $width < 1")
    val enc = (s: Column) =>
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(s, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"),
        "\"", "&quot;"), "'", "&#39;")
    val t = coalesce(text, lit(""))
    val idStr = id.cast("string")
    val paras = when(length(t) === 0, lit("")).otherwise(
      array_join(transform(
        sequence(lit(0), ((length(t) + (width - 1)) / width)
          .cast("int") - 1),
        i => concat(lit("<p>"),
          enc(t.substr(i * width + 1, lit(width))), lit("</p>"))), ""))
    df.select(id.as("page_id"), concat(
      lit("<!DOCTYPE html><html><head><title>t</title>" +
        "<style>p{c:red}</style>" +
        "<script>if(1<2){var x=\"</p>\";}</script></head><body>" +
        "<!-- <p>not content</p> -->" +
        "<nav><a href=\"/\">Home</a> <a href=\"/a\">Tags</a> " +
        "<a href=\"/b\">About</a></nav><h1>Doc &amp; "),
      idStr,
      lit("</h1>"), paras,
      lit("<p>See <a href=\"/r\">ref "), idStr,
      lit("</a> &#8212; plus the longer article details here.</p>" +
        "<footer><a href=\"/p\">Privacy</a> " +
        "<a href=\"/t\">Terms</a> &copy; 2026</footer>" +
        "</body></html>")).as("html"))
  }

  /** Extraction over an HTML column: returns `idName` plus the
    * kernel's struct fields — `text` (kept blocks joined by \n),
    * `n_kept`, `n_dropped` (non-empty blocks only), `anchor_chars`,
    * `text_chars`. `minChars` and `densityNum/densityDen` are the
    * block keep thresholds (defaults: ≥ 5 chars, link density
    * ≤ 1/3). */
  def extractTextDf(df: DataFrame, idName: String, htmlName: String,
                    minChars: Int = 5, densityNum: Int = 1,
                    densityDen: Int = 3): DataFrame =
    df.withColumn("__x", graft.functions.HtmlExtract(
        col(htmlName), minChars, densityNum, densityDen))
      .select(col(idName), col("__x.text").as("text"),
        col("__x.n_kept").as("n_kept"),
        col("__x.n_dropped").as("n_dropped"),
        col("__x.anchor_chars").as("anchor_chars"),
        col("__x.text_chars").as("text_chars"))
}
