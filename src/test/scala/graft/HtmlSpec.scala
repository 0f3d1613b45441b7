package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Html

/** HTML extraction kernel against hand-built fixtures — the traps a
  * real crawl serves daily: raw-text elements holding fake tags,
  * quoted `>` inside attributes, comments, numeric entities, unclosed
  * structures, nested anchors. The oracle (q483) pins the synth-page
  * round trip; these pin the parser itself.
  */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def extract(html: String, minChars: Int = 5,
                      num: Int = 1, den: Int = 3) = {
    import spark.implicits._
    Html.extractTextDf(Seq((1L, html)).toDF("id", "html"),
      "id", "html", minChars, num, den).collect()(0)
  }

  test("script/style/head contents are stripped, even with fake tags") {
    val r = extract("<head><title>t</title></head>" +
      "<script>if(1<2){var x=\"</p>fake text\";}</script>" +
      "<style>p{color:red}</style><p>real content here</p>")
    assert(r.getAs[String]("text") == "real content here")
    assert(r.getAs[Long]("n_kept") == 1)
  }

  test("a quoted '>' inside an attribute does not end the tag") {
    val r = extract("<p><a href=\"x>y\">linked</a> plus much longer " +
      "surrounding content text</p>")
    assert(r.getAs[String]("text") ==
      "linked plus much longer surrounding content text")
    assert(r.getAs[Long]("anchor_chars") == 6)
  }

  test("comments vanish, including tags inside them") {
    val r = extract("<p>before</p><!-- <p>ghost</p> --><p>after text</p>")
    assert(r.getAs[String]("text") == "before\nafter text")
  }

  test("entities decode: named, decimal, hex; unknown stays literal") {
    val r = extract("<p>a &amp; b &lt;c&gt; &#65; &#x42; &unknown; d</p>",
      minChars = 1)
    assert(r.getAs[String]("text") == "a & b <c> A B &unknown; d")
  }

  test("whitespace runs collapse and blocks trim") {
    val r = extract("<p>  spaced\t\tout\n\ncontent  </p>", minChars = 1)
    assert(r.getAs[String]("text") == "spaced out content")
    assert(r.getAs[Long]("text_chars") == 18)
  }

  test("link-dense blocks drop; short blocks drop; empties ignored") {
    val r = extract(
      "<nav><a href=\"/\">One</a> <a href=\"/a\">Two</a></nav>" +
      "<p>ok</p><p></p><p>long enough to keep</p>")
    assert(r.getAs[String]("text") == "long enough to keep")
    assert(r.getAs[Long]("n_kept") == 1)
    assert(r.getAs[Long]("n_dropped") == 2) // nav (density) + "ok" (short)
  }

  test("unclosed tag, unterminated comment and script do not throw") {
    assert(extract("<p>text then <a href=\"x")
      .getAs[String]("text") == "text then")
    assert(extract("<p>seen here</p><!-- never closed " +
      "more").getAs[String]("text") == "seen here")
    assert(extract("<p>seen here</p><script>var x = 1;")
      .getAs[String]("text") == "seen here")
  }

  test("stray '<' and '&' are literal text") {
    val r = extract("<p>1 < 2 and fish & chips</p>", minChars = 1)
    assert(r.getAs[String]("text") == "1 < 2 and fish & chips")
  }

  test("nested anchors count once per char; close clamps at zero") {
    val r = extract("</a><p><a><a>in</a>still</a>out of the anchor " +
      "span entirely</p>", minChars = 1)
    // 'in' (depth 2) + 'still' (depth 1) are anchor chars; 'out...' not
    assert(r.getAs[Long]("anchor_chars") == 7)
    assert(r.getAs[String]("text") ==
      "instillout of the anchor span entirely")
  }

  test("br and uppercase tags split blocks") {
    val r = extract("<P>first line<BR>second line</P>", minChars = 1)
    assert(r.getAs[String]("text") == "first line\nsecond line")
    assert(r.getAs[Long]("n_kept") == 2)
  }

  test("synth page extraction matches the closed-form prediction") {
    import spark.implicits._
    val text = ("alpha beta gamma " * 20).trim // 339 chars → 4 slices
    val pages = Html.synthHtml(Seq((7L, text)).toDF("id", "tx"),
      col("id"), col("tx"))
    val r = Html.extractTextDf(pages, "page_id", "html").collect()(0)
    val slices = text.grouped(100).map(_.trim).toSeq
    val expected = ("Doc & 7" +: slices.filter(_.length >= 5)) :+
      "See ref 7 — plus the longer article details here."
    assert(r.getAs[String]("text") == expected.mkString("\n"))
    assert(r.getAs[Long]("n_kept") == 2 + slices.count(_.length >= 5))
    assert(r.getAs[Long]("anchor_chars") == 29 + 1)
    // fixed blocks: nav 15 + footer 20 + h1 (6+d) + link para (48+d)
    assert(r.getAs[Long]("text_chars") ==
      89 + 2 + slices.map(_.length).sum)
  }

  test("null text synth page still yields the h1 and link paragraph") {
    import spark.implicits._
    val pages = Html.synthHtml(
      Seq((3L, null.asInstanceOf[String])).toDF("id", "tx"),
      col("id"), col("tx"))
    val r = Html.extractTextDf(pages, "page_id", "html").collect()(0)
    assert(r.getAs[String]("text") == "Doc & 3\nSee ref 3 — " +
      "plus the longer article details here.")
    assert(r.getAs[Long]("n_dropped") == 2)
  }
}
