package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tools.FuzzConformance.Spec

/** Differential conformance fuzzing for the round-7 FAMILIES — the
  * classifier-evaluation ops ([[graft.ops.Eval]]) and the crawl-ingest
  * funnel ([[graft.ops.Warc]]/[[graft.ops.Html]]) — which until round
  * 8 had only their single hand-written oracle each (r7 verdict task
  * #7). Same technique as [[FuzzConformance]]: one seeded generator
  * emits BOTH the Spark query and the DuckDB SQL from one parameter
  * draw, so a divergence anywhere in the rank-statistic prefix sums,
  * the micro-unit rounding, the HTML entity/boilerplate handling or
  * the WARC framing surfaces as a hash mismatch on some qN.
  *
  * Eval shapes deliberately include the degenerate classes that bit
  * before (the q491 d3b959c fix): an ALL-ONE-CLASS corpus (AUC is
  * NULL, exercised with a division guard on both engines) and an
  * ALL-TIES score (every row one tie group — average-rank handling
  * must yield exactly 500000 micro). Scores/labels are modular
  * arithmetic over `orders` columns, so both classes and tie groups
  * exist by construction at every scale factor.
  *
  * Crawl shapes vary the synth/extraction PARAMETERS the hand oracle
  * fixed: paragraph slice width, the min-chars keep threshold (the
  * entity edge case: a slice boundary can land inside text that
  * entity-encodes, and the closed form must survive any width), the
  * link-density threshold inside the band where the synth page's
  * block outcomes are provably unchanged (nav 13/15 and footer 3/5
  * stay dropped, content at ≤ ~0.19 stays kept), and the WARC
  * records-per-file packing (reframing must never change content).
  *
  * A NEW Random (fixed seed 20260815) keeps [[FuzzConformance]]'s
  * stream untouched — its 200 specs stay byte-stable.
  */
object FuzzEvalCrawl {

  // ---- eval family ----

  /** A (score, label) draw over `orders`: Spark columns + the SQL
    * text. Modulus ≥ 7 guarantees tie groups; the label keeps both
    * classes at every sf (custkey spans ≥ 150 ids, totalprice is
    * mid-range cut). */
  private def scoreLabel(r: scala.util.Random)
      : (Column, String, Column, String) = {
    val m = 7 + r.nextInt(394)
    val (sc, ss) =
      if (r.nextBoolean()) (pmod(col("o_orderkey"), lit(m)),
        s"o_orderkey % $m")
      else (pmod(col("o_custkey"), lit(m)), s"o_custkey % $m")
    val (lc, ls) = r.nextInt(3) match {
      case 0 =>
        val k = 2 + r.nextInt(9)
        val t = 1 + r.nextInt(k - 1)
        (pmod(col("o_custkey"), lit(k)) < t, s"(o_custkey % $k) < $t")
      case 1 =>
        val x = 50000 + r.nextInt(100000)
        (col("o_totalprice") > x.toDouble, s"o_totalprice > $x.0")
      case _ =>
        val k = 2 + r.nextInt(5)
        (pmod(col("o_orderkey"), lit(k)) === 0, s"(o_orderkey % $k) = 0")
    }
    (sc, ss, lc, ls)
  }

  /** The shared score CTE: sc(s, y) then the distinct-score table
    * g(s, n, p) — the exact shape the hand oracles build. */
  private def baseCte(scoreSql: String, labelSql: String): String =
    s"""WITH sc AS (SELECT $scoreSql AS s,
             CASE WHEN $labelSql THEN 1 ELSE 0 END AS y FROM orders),
       g AS (SELECT s, count(*) AS n, sum(y) AS p FROM sc GROUP BY s)"""

  /** q479's rank tail with the one-class division guard (the fuzz
    * corpus is allowed to be degenerate; the hand corpus is not). */
  private def rocTail: String =
    """,
       r AS (SELECT s, n, p,
               coalesce(sum(n) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS nb
             FROM g),
       a AS (SELECT sum(p) AS np, sum(n - p) AS nn,
               sum(p * (2*nb + n + 1)) AS rs2 FROM r)
       SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
         CAST(rs2 - np*(np + 1) AS BIGINT) AS auc_num2,
         CAST(2*np*nn AS BIGINT) AS auc_den,
         CASE WHEN np = 0 OR nn = 0 THEN NULL
              ELSE CAST(((rs2 - np*(np + 1)) * 1000000 + np*nn)
                // (2*np*nn) AS BIGINT) END AS auc_micro
       FROM a"""

  private def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")

  private def evalSpec(r: scala.util.Random, name: String,
                       shape: Int): Spec = shape match {
    case 0 => // exact ROC-AUC
      val (sc, ss, lc, ls) = scoreLabel(r)
      Spec(name, (s, dir) => graft.ops.Eval.rocAuc(orders(s, dir), sc, lc),
        baseCte(ss, ls) + rocTail)

    case 1 => // step PR-AUC
      val (sc, ss, lc, ls) = scoreLabel(r)
      Spec(name, (s, dir) => graft.ops.Eval.prAuc(orders(s, dir), sc, lc),
        baseCte(ss, ls) + """,
       r AS (SELECT s, n, p,
               coalesce(sum(n) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS nb,
               coalesce(sum(p) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS pb
             FROM g),
       tot AS (SELECT sum(p) AS np, sum(n - p) AS nn FROM g),
       t AS (SELECT p, pb + p AS tp, nb + n AS pp FROM r)
       SELECT CAST(any_value(np) AS BIGINT) AS n_pos,
              CAST(any_value(nn) AS BIGINT) AS n_neg,
              count(*) AS n_thresholds,
              CAST(sum((p * tp * 2000000 + pp * np) // (pp * np * 2))
                AS BIGINT) AS pr_auc_micro
       FROM t, tot""")

    case 2 => // full PR curve
      val (sc, ss, lc, ls) = scoreLabel(r)
      Spec(name, (s, dir) =>
        graft.ops.Eval.prCurve(orders(s, dir), sc, lc)
          .orderBy("threshold"),
        baseCte(ss, ls) + """,
       r AS (SELECT s, n, p,
               coalesce(sum(n) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS nb,
               coalesce(sum(p) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS pb
             FROM g),
       tot AS (SELECT sum(p) AS np FROM g),
       t AS (SELECT s, n, p, pb + p AS tp, nb + n AS pp FROM r)
       SELECT s AS threshold, n, CAST(p AS BIGINT) AS p,
         CAST(tp AS BIGINT) AS tp, CAST(pp AS BIGINT) AS pp,
         CAST((tp * 2000000 + pp) // (pp * 2) AS BIGINT) AS prec_micro,
         CAST((tp * 2000000 + np) // (np * 2) AS BIGINT) AS rec_micro
       FROM t, tot ORDER BY threshold""")

    case 3 => // best-F1 operating point
      val (sc, ss, lc, ls) = scoreLabel(r)
      Spec(name, (s, dir) => graft.ops.Eval.bestF1(orders(s, dir), sc, lc),
        baseCte(ss, ls) + """,
       r AS (SELECT s, n, p,
               coalesce(sum(n) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS nb,
               coalesce(sum(p) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS pb
             FROM g),
       tot AS (SELECT sum(p) AS np FROM g),
       t AS (SELECT s, pb + p AS tp, nb + n AS pp FROM r)
       SELECT s AS threshold, CAST(tp AS BIGINT) AS tp,
         CAST(pp AS BIGINT) AS pp,
         CAST((tp * 4000000 + pp + np) // ((pp + np) * 2) AS BIGINT)
           AS f1_micro,
         CAST((tp * 2000000 + pp) // (pp * 2) AS BIGINT) AS prec_micro,
         CAST((tp * 2000000 + np) // (np * 2) AS BIGINT) AS rec_micro
       FROM t, tot
       ORDER BY f1_micro DESC, threshold DESC LIMIT 1""")

    case 4 => // calibration bins at a random bin count
      val (sc, ss, lc, ls) = scoreLabel(r)
      val bins = 3 + r.nextInt(14)
      Spec(name, (s, dir) =>
        graft.ops.Eval.calibrationBins(orders(s, dir), sc, lc, bins)
          .orderBy("bin"),
        baseCte(ss, ls) + s""",
       mm AS (SELECT min(s) AS lo, max(s) AS hi FROM sc),
       b AS (SELECT ((s - lo) * $bins) // (hi - lo + 1) AS bin,
                    s - lo AS shift, y FROM sc, mm)
       SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(shift) AS BIGINT) AS sum_shift,
         CAST((sum(y) * 2000000 + count(*)) // (count(*) * 2) AS BIGINT)
           AS pos_rate_micro
       FROM b GROUP BY 1 ORDER BY bin""")

    case 5 => // per-group AUC (groups may be one-class -> NULL auc)
      val (sc, ss, lc, ls) = scoreLabel(r)
      val (gc, gs) = r.nextInt(3) match {
        case 0 => (col("o_orderstatus"), "o_orderstatus")
        case 1 => (col("o_orderpriority"), "o_orderpriority")
        case _ =>
          val g = 2 + r.nextInt(7)
          (pmod(col("o_custkey"), lit(g)),
            s"CAST(o_custkey % $g AS VARCHAR)")
      }
      Spec(name, (s, dir) =>
        graft.ops.Eval.rocAucByGroup(orders(s, dir), gc, sc, lc)
          .orderBy("g"),
        s"""WITH sc AS (SELECT $gs AS g, $ss AS s,
               CASE WHEN $ls THEN 1 ELSE 0 END AS y FROM orders),
       g2 AS (SELECT g, s, count(*) AS n, sum(y) AS p FROM sc
              GROUP BY 1, 2),
       r AS (SELECT g, s, n, p,
               coalesce(sum(n) OVER (PARTITION BY g ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS nb
             FROM g2),
       a AS (SELECT g, sum(p) AS np, sum(n - p) AS nn,
               sum(p * (2*nb + n + 1)) AS rs2 FROM r GROUP BY g)
       SELECT g, CAST(np AS BIGINT) AS n_pos,
         CAST(nn AS BIGINT) AS n_neg,
         CAST(rs2 - np*(np + 1) AS BIGINT) AS auc_num2,
         CAST(2*np*nn AS BIGINT) AS auc_den,
         CASE WHEN np = 0 OR nn = 0 THEN NULL
              ELSE CAST(((rs2 - np*(np + 1)) * 1000000 + np*nn)
                // (2*np*nn) AS BIGINT) END AS auc_micro
       FROM a ORDER BY g""")

    case 6 => // ALL ONE CLASS: auc_den 0, auc_micro NULL on both sides
      val (sc, ss, _, _) = scoreLabel(r)
      val allPos = r.nextBoolean()
      val (lc, ls) =
        if (allPos) (col("o_orderkey") >= 0, "o_orderkey >= 0")
        else (col("o_orderkey") < 0, "o_orderkey < 0")
      Spec(name, (s, dir) => graft.ops.Eval.rocAuc(orders(s, dir), sc, lc),
        baseCte(ss, ls) + rocTail)

    case _ => // ALL TIES: one tie group, average-rank AUC = 500000
      val (_, _, lc, ls) = scoreLabel(r)
      Spec(name, (s, dir) =>
        graft.ops.Eval.rocAuc(orders(s, dir), lit(0L), lc),
        baseCte("0", ls) + rocTail)
  }

  // ---- crawl family ----

  /** q483's closed-form extraction replay, templated on the slice
    * width and the min-chars keep threshold (density stays inside the
    * outcome-stable band, so the block structure is width/threshold
    * arithmetic only). */
  private def htmlSql(w: Int, m: Int): String =
    s"""WITH d0 AS (SELECT doc_id, coalesce(text, '') AS tx,
                CAST(doc_id AS VARCHAR) AS ids FROM documents),
         ch AS (SELECT doc_id, i,
                  trim(regexp_replace(substr(tx, CAST(i*$w + 1 AS INT),
                       $w), '[ \\t\\n\\r]+', ' ', 'g')) AS c
                FROM (SELECT doc_id, tx,
                        unnest(range(0, (len(tx) + ${w - 1}) // $w)) AS i
                      FROM d0 WHERE len(tx) > 0)),
         agg AS (SELECT doc_id,
                   string_agg(CASE WHEN len(c) >= $m THEN c END,
                     chr(10) ORDER BY i) AS body,
                   count(*) FILTER (WHERE len(c) >= $m) AS kc,
                   count(*) FILTER (WHERE len(c) BETWEEN 1 AND ${m - 1})
                     AS dc,
                   sum(len(c)) AS sumlen
                 FROM ch GROUP BY 1)
         SELECT d0.doc_id,
           concat_ws(chr(10), 'Doc & ' || ids, body,
             'See ref ' || ids || ' ' || chr(8212) ||
             ' plus the longer article details here.') AS main_text,
           CAST(2 + coalesce(kc, 0) AS BIGINT) AS n_kept,
           CAST(2 + coalesce(dc, 0) AS BIGINT) AS n_dropped,
           CAST(29 + len(ids) AS BIGINT) AS anchor_chars,
           CAST(89 + 2*len(ids) + coalesce(sumlen, 0) AS BIGINT)
             AS text_chars
         FROM d0 LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""

  /** Density thresholds provably outcome-equal on the synth page:
    * strictly above the content paragraph's max link ratio (≤ ~0.19
    * for any id the testdata can hold) and strictly below the footer's
    * 3/5. */
  private val safeDensities = Seq((1, 3), (2, 5), (5, 12), (9, 20))

  private def crawlSpec(r: scala.util.Random, name: String,
                        shape: Int): Spec = shape match {
    case 0 => // extraction at a random slice width + keep threshold
      val w = 30 + r.nextInt(220)
      val m = 2 + r.nextInt(6)
      Spec(name, (s, dir) => {
        val pages = graft.ops.Html.synthHtml(
          s.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), col("text"), width = w)
        graft.ops.Html.extractTextDf(pages, "page_id", "html",
            minChars = m)
          .select(col("page_id").as("doc_id"),
            col("text").as("main_text"), col("n_kept"),
            col("n_dropped"), col("anchor_chars"), col("text_chars"))
          .orderBy("doc_id")
      }, htmlSql(w, m))

    case 1 => // extraction under a shifted (outcome-stable) density
      val w = 30 + r.nextInt(220)
      val m = 2 + r.nextInt(6)
      val (dn, dd) = safeDensities(r.nextInt(safeDensities.size))
      Spec(name, (s, dir) => {
        val pages = graft.ops.Html.synthHtml(
          s.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), col("text"), width = w)
        graft.ops.Html.extractTextDf(pages, "page_id", "html",
            minChars = m, densityNum = dn, densityDen = dd)
          .select(col("page_id").as("doc_id"),
            col("text").as("main_text"), col("n_kept"),
            col("n_dropped"), col("anchor_chars"), col("text_chars"))
          .orderBy("doc_id")
      }, htmlSql(w, m))

    case 2 => // WARC demux at a random records-per-file packing
      val rpf = Seq(7, 13, 33, 57)(r.nextInt(4))
      Spec(name, (s, dir) => {
        val warcs = graft.ops.Warc.synthWarc(
          s.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), col("text"), recordsPerFile = rpf)
        graft.ops.Warc.readWarcRecords(warcs, "file_id", "warc")
          .select(col("file_id"), col("rec_idx"), col("warc_type"),
            col("uri"), col("content_length"), col("http_status"),
            length(col("body")).cast("long").as("body_chars"))
          .orderBy("file_id", "rec_idx")
      },
        s"""WITH d0 AS (SELECT doc_id, coalesce(text, '') AS tx,
                CAST(doc_id AS VARCHAR) AS ids FROM documents),
         ch AS (SELECT doc_id, i,
                  replace(replace(replace(replace(replace(
                    substr(tx, CAST(i*100 + 1 AS INT), 100),
                    '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                    '"', '&quot;'), '''', '&#39;') AS c
                FROM (SELECT doc_id, tx,
                        unnest(range(0, (len(tx) + 99) // 100)) AS i
                      FROM d0 WHERE len(tx) > 0)),
         pg AS (SELECT doc_id,
                  string_agg('<p>' || c || '</p>', '' ORDER BY i)
                    AS paras
                FROM ch GROUP BY 1),
         hx AS (SELECT d0.doc_id, ids, doc_id // $rpf AS file_id,
                  '<!DOCTYPE html><html><head><title>t</title>' ||
                  '<style>p{c:red}</style>' ||
                  '<script>if(1<2){var x="</p>";}</script></head>' ||
                  '<body><!-- <p>not content</p> -->' ||
                  '<nav><a href="/">Home</a> <a href="/a">Tags</a> ' ||
                  '<a href="/b">About</a></nav><h1>Doc &amp; ' || ids ||
                  '</h1>' || coalesce(paras, '') ||
                  '<p>See <a href="/r">ref ' || ids ||
                  '</a> &#8212; plus the longer article details here.' ||
                  '</p><footer><a href="/p">Privacy</a> ' ||
                  '<a href="/t">Terms</a> &copy; 2026</footer>' ||
                  '</body></html>' AS html
                FROM d0 LEFT JOIN pg USING (doc_id)),
         resp AS (SELECT file_id,
                    CAST(row_number() OVER (PARTITION BY file_id
                      ORDER BY doc_id) AS INT) AS rec_idx,
                    'response' AS warc_type,
                    'http://example.org/doc/' || ids AS uri,
                    CAST(44 + len(html) AS BIGINT) AS content_length,
                    CAST(200 AS INT) AS http_status,
                    CAST(len(html) AS BIGINT) AS body_chars
                  FROM hx),
         info AS (SELECT DISTINCT file_id, CAST(0 AS INT) AS rec_idx,
                    'warcinfo' AS warc_type, CAST(NULL AS VARCHAR)
                      AS uri,
                    CAST(22 AS BIGINT) AS content_length,
                    CAST(NULL AS INT) AS http_status,
                    CAST(NULL AS BIGINT) AS body_chars
                  FROM hx)
         SELECT * FROM info UNION ALL SELECT * FROM resp
         ORDER BY file_id, rec_idx""")

    case _ => // full WARC -> HTML funnel: packing must not change text
      val rpf = Seq(3, 11, 29, 83)(r.nextInt(4))
      Spec(name, (s, dir) => {
        val warcs = graft.ops.Warc.synthWarc(
          s.read.parquet(s"$dir/documents.parquet"),
          col("doc_id"), col("text"), recordsPerFile = rpf)
        val recs = graft.ops.Warc
          .readWarcRecords(warcs, "file_id", "warc")
          .filter(col("warc_type") === "response")
          .select(regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"), col("body"))
        graft.ops.Html.extractTextDf(recs, "doc_id", "body")
          .select(col("doc_id"), col("text").as("main_text"),
            col("n_kept"))
          .orderBy("doc_id")
      },
        """WITH d0 AS (SELECT doc_id, coalesce(text, '') AS tx,
                CAST(doc_id AS VARCHAR) AS ids FROM documents),
         ch AS (SELECT doc_id, i,
                  trim(regexp_replace(substr(tx, CAST(i*100 + 1 AS INT),
                       100), '[ \t\n\r]+', ' ', 'g')) AS c
                FROM (SELECT doc_id, tx,
                        unnest(range(0, (len(tx) + 99) // 100)) AS i
                      FROM d0 WHERE len(tx) > 0)),
         agg AS (SELECT doc_id,
                   string_agg(CASE WHEN len(c) >= 5 THEN c END,
                     chr(10) ORDER BY i) AS body,
                   count(*) FILTER (WHERE len(c) >= 5) AS kc
                 FROM ch GROUP BY 1)
         SELECT d0.doc_id,
           concat_ws(chr(10), 'Doc & ' || ids, body,
             'See ref ' || ids || ' ' || chr(8212) ||
             ' plus the longer article details here.') AS main_text,
           CAST(2 + coalesce(kc, 0) AS BIGINT) AS n_kept
         FROM d0 LEFT JOIN agg USING (doc_id) ORDER BY doc_id""")
  }

  /** The fixed suite: q503–q514 eval (the first 8 cycle every shape,
    * 4 more draw randomly), q515–q522 crawl (first 4 cycle, 4 draw).
    * Seed-stable: widening must append AFTER these draws. */
  def specs: Seq[Spec] = {
    val r = new scala.util.Random(20260815L)
    val evals = (0 until 12).map { i =>
      evalSpec(r, s"q${503 + i}_efuzz", if (i < 8) i else r.nextInt(6))
    }
    val crawls = (0 until 8).map { i =>
      crawlSpec(r, s"q${515 + i}_cfuzz", if (i < 4) i else r.nextInt(4))
    }
    evals ++ crawls
  }
}
