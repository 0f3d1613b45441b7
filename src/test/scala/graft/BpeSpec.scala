package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE trainer/encoder vs an independent driver-side reference
  * implementation (plain Scala collections, written straight from the
  * algorithm: word counts → weighted pair counts → greedy merge). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  // ---- driver-side reference BPE ----
  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }

  private def refMergeOnce(syms: List[String], a: String,
                           b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b) {
        out.remove(out.length - 1); out += (a + b)
      } else out += syms(i)
      i += 1
    }
    out.toList
  }

  private def refTrain(texts: Seq[String],
                       n: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] =
      refWordCounts(texts).map { case (w, c) =>
        w.toList.map(_.toString) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = n > 0
    while (continue) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab if syms.length >= 2;
           w <- syms.sliding(2) if w.length == 2)
        pairs((w(0), w(1))) = pairs.getOrElse((w(0), w(1)), 0L) + c
      val best = pairs.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2L =>
          merges += ((a, b))
          vocab = vocab.groupBy { case (syms, _) =>
            refMergeOnce(syms, a, b) }
            .map { case (k, m) => k -> m.values.sum }
          continue = merges.size < n
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  private def refEncode(text: String,
                        merges: Seq[(String, String)]): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq.flatMap { w =>
      merges.foldLeft(w.toList.map(_.toString)) {
        case (syms, (a, b)) => refMergeOnce(syms, a, b) }
    }

  // ---- specs ----
  test("pairStats matches a hand count on a tiny corpus") {
    import spark.implicits._
    val tiny = Seq("low lower lowest", "new newer", "a").toDF("text")
    // "low":1 pairs lo,ow; "lower":1 lo,ow,we,er; "lowest":1
    // lo,ow,we,es,st; "new":1 ne,ew; "newer":1 ne,ew,we,er; "a": none
    val got = Bpe.pairStats(tiny, col("text"), 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("lo", 3L), ("ow", 3L), ("we", 3L)))
  }

  test("train matches the reference implementation on real docs") {
    val texts = docs.limit(60).select("text").collect()
      .map(_.getString(0)).toSeq
    import spark.implicits._
    val df = texts.toDF("text")
    val mine = Bpe.train(df, col("text"), 12)
    assert(mine == refTrain(texts, 12))
    assert(mine.size == 12) // a real corpus has >= 12 mergeable pairs
  }

  test("encode matches the reference tokenization and round-trips") {
    val texts = docs.limit(40).select("text").collect()
      .map(_.getString(0)).toSeq
    import spark.implicits._
    val df = texts.toDF("text")
    val merges = Bpe.train(df, col("text"), 10)
    val got = df.select(Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(_.getSeq[String](0).toSeq)
    texts.zip(got).foreach { case (t, mineToks) =>
      assert(mineToks == refEncode(t, merges), s"doc: ${t.take(60)}")
      // lossless: concatenating subwords rebuilds the spaceless text
      assert(mineToks.mkString == t.split(" ", -1).filter(_.nonEmpty).mkString)
    }
  }

  test("merges actually compress: learned tokens < chars, >= words") {
    val df = docs.limit(50).select("text")
    val merges = Bpe.train(df, col("text"), 16)
    val n = Bpe.tokenCountUnder(df, col("text"), merges)
      .collect()(0).getLong(0)
    val chars = Bpe.tokenCountUnder(df, col("text"), Nil)
      .collect()(0).getLong(0)
    val words = df.select(
        sum(size(filter(split(col("text"), " "), w => w =!= ""))))
      .collect()(0).getLong(0)
    assert(n < chars)   // merging shrank the stream
    assert(n >= words)  // BPE never crosses word boundaries
  }

  test("greedy left-to-right semantics on overlapping pairs") {
    import spark.implicits._
    val df = Seq("aaa aaaa").toDF("text")
    val got = df.select(Bpe.encode(col("text"), Seq(("a", "a"))).as("t"))
      .collect()(0).getSeq[String](0).toSeq
    assert(got == Seq("aa", "a", "aa", "aa"))
  }
}
