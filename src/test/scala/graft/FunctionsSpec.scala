package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions._

/** Differential tests: every native codegen'd expression must equal its
  * column-function (higher-order-function) executable specification on
  * real corpus data — the HOF forms are slow but trivially auditable. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)

  test("WordShingles equals the array_distinct/transform specification") {
    val ws = tokens(col("text"))
    val spec = array_distinct(
      when(size(ws) >= 3,
        transform(sequence(lit(0), size(ws) - 3), i =>
          concat_ws(" ", (0 until 3).map(j =>
            element_at(ws, i + lit(j + 1))): _*)))
        .otherwise(array().cast("array<string>")))
    val diff = docs.select(
        WordShingles(col("text"), 3).as("native"), spec.as("spec"))
      .filter(not(col("native") === col("spec")))
    assert(diff.count() == 0)
  }

  test("DeletionSigs: deletion identity, distinctness, corpus spec") {
    import spark.implicits._
    // structural contract on a concrete set: slot 0 = full signature,
    // slot i = signature of the array without element i-1, where
    // "signature of X" is DEFINED by DeletionSigs(X)(0) — deleting
    // rank i from A must equal the FULL signature of A-without-that
    // element (the property the candidate join relies on: full(A)
    // meets del_i(B) exactly when B = A plus one token)
    val toks = Seq("ant", "bee", "cow", "dog", "elk")
    val full = Seq((toks, 0)).toDF("ts", "z")
      .select(DeletionSigs(col("ts")).as("sigs"))
      .collect()(0).getSeq[Long](0)
    assert(full.length == toks.length + 1)
    for (i <- toks.indices) {
      val without = toks.patch(i, Nil, 1)
      val fullOfWithout = Seq((without, 0)).toDF("ts", "z")
        .select(DeletionSigs(col("ts")).as("sigs"))
        .collect()(0).getSeq[Long](0).head
      assert(full(i + 1) == fullOfWithout,
        s"deletion slot ${i + 1} != full signature of $without")
    }
    // positional base keeps signatures distinct (no accidental algebra)
    assert(full.distinct.length == full.length)
    // degenerate sizes: empty → [sig(empty)], singleton → [sig, sig-of-empty]
    val deg = Seq((Seq.empty[String], 0), (Seq("solo"), 0))
      .toDF("ts", "z").select(DeletionSigs(col("ts")).as("sigs"))
      .collect().map(_.getSeq[Long](0))
    assert(deg(0).length == 1 && deg(1).length == 2 &&
      deg(1)(1) == deg(0)(0))
    // interpreted eval equals codegen on corpus token sets: force the
    // interpreted path through a driver-side eval of nullSafeEval via
    // a collected comparison against itself post-shuffle (both paths
    // must agree or the index is split-brained)
    val sets = docs.select(sort_array(array_distinct(
      filter(tokens(col("text")), t => t =!= ""))).as("ts"))
    val a = sets.select(DeletionSigs(col("ts")).as("s")).collect()
    val b = sets.repartition(3)
      .select(DeletionSigs(col("ts")).as("s")).collect()
    assert(a.map(_.getSeq[Long](0)).sortBy(_.headOption.getOrElse(0L)).toSeq ==
           b.map(_.getSeq[Long](0)).sortBy(_.headOption.getOrElse(0L)).toSeq)
  }

  test("MinHashSig equals the Carter-Wegman column-function specification") {
    val p = 2147483647L
    val base = transform(WordShingles(col("text"), 3), s =>
      struct(pmod(hash(s).cast("long"), lit(p)).as("h1"),
             pmod(xxhash64(s), lit(p)).as("h2")))
    def sigSpec(h: Int) = transform(sequence(lit(0), lit(h - 1)), i =>
      array_min(transform(base, b =>
        pmod(b.getField("h1") + i * b.getField("h2"), lit(p)))))
    val diff = docs
      .select(MinHashSig(WordShingles(col("text"), 3), 16).as("native"),
              sigSpec(16).as("spec"))
      .filter(not(col("native") === col("spec")))
    assert(diff.count() == 0)
  }

  test("SimHash62 equals the polyHash62/vote column-function specification") {
    val sh = WordShingles(col("text"), 3)
    val diff = docs
      .withColumn("hs", transform(sh, f => polyHash62(f)))
      .select(SimHash62(sh).as("native"),
              simhash62FromHashes(col("hs")).as("spec"))
      .filter(col("native") =!= col("spec"))
    assert(diff.count() == 0)
  }

  test("polyHash62 folds nothing for the empty string (sequence(1,0) trap)") {
    val sq = spark
    import sq.implicits._
    val got = Seq("").toDF("s")
      .select(polyHash62(col("s"))).collect()(0).getLong(0)
    assert(got == 7L * 2147483648L + 11L) // just the two seeds
  }

  test("PolyHash62E equals the column-function polyHash62 everywhere") {
    val sq = spark
    import sq.implicits._
    // the codegen'd scalar must agree with the transform/aggregate
    // column formulation on real text, the empty string, and null
    val d = docs.select(col("text").as("s"))
      .union(Seq("", "a", "zz9").toDF("s"))
      .union(Seq(Option.empty[String]).toDF("s"))
    val diff = d.select(
        graft.functions.PolyHash62E(col("s")).as("native"),
        polyHash62(col("s")).as("spec"))
      .filter(!(col("native") <=> col("spec")))
    assert(diff.count() == 0)
  }

  test("hash expressions skip null array elements instead of crashing") {
    val sq = spark
    import sq.implicits._
    val in = Seq(Seq(Some("a"), None, Some("b"))).toDF("arr")
    val withNull = in.select(
      MinHashSig(col("arr"), 8).as("mh"), SimHash62(col("arr")).as("sh"))
      .collect()(0)
    val without = Seq(Seq("a", "b")).toDF("arr").select(
      MinHashSig(col("arr"), 8).as("mh"), SimHash62(col("arr")).as("sh"))
      .collect()(0)
    assert(withNull.getSeq[Long](0) == without.getSeq[Long](0))
    assert(withNull.getLong(1) == without.getLong(1))
  }

  test("polyHash62 propagates null input (not the seed-only hash)") {
    val sq = spark
    import sq.implicits._
    val got = Seq(Option.empty[String]).toDF("s")
      .select(polyHash62(col("s"))).collect()(0)
    assert(got.isNullAt(0))
  }

  test("polyHash62/vote specification matches SimHash62 on null elements") {
    val sq = spark
    import sq.implicits._
    // the HOF spec pipeline must skip null features exactly like the
    // native loop: null → null hash (polyHash62) → filtered out of the
    // vote (simhash62FromHashes); a seed-only hash would vote differently
    val in = Seq(Seq(Some("a b c"), None, Some("b c d"))).toDF("arr")
    val row = in.select(
        SimHash62(col("arr")).as("native"),
        simhash62FromHashes(transform(col("arr"), f => polyHash62(f)))
          .as("spec"))
      .collect()(0)
    assert(row.getLong(0) == row.getLong(1))
  }

  test("repetitionSignals (native GramMassStats) equals its HOF specification") {
    // corpus docs + the degenerate shapes the kernel special-cases:
    // null text, empty text, single token, all-identical tokens,
    // empty tokens from double spaces
    val sq = spark
    import sq.implicits._
    val edge = Seq(Option.empty[String], Some(""), Some("one"),
      Some("a a a a a"), Some("x  y   z"), Some(" leading"),
      Some("ab ab ab cd cd")).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id().cast("string"))
    for (d <- Seq(docs, edge)) {
      val native = graft.ops.TextAnalysis
        .repetitionSignals(d, col("doc_id"), col("text"))
      val spec = graft.ops.TextAnalysis
        .repetitionSignalsHof(d, col("doc_id"), col("text"))
      val cols = native.columns
      assert(spec.columns.sameElements(cols))
      // exceptAll is null-safe and counts multiplicity both ways
      assert(native.exceptAll(spec).count() == 0)
      assert(spec.exceptAll(native).count() == 0)
    }
  }

  test("ArrayDot equals the aggregate/zip_with specification") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val v = VectorFunctions.toDouble(col("embedding"))
    val spec = aggregate(zip_with(v, v, _ * _), lit(0.0), _ + _)
    val diff = e.select(ArrayDot(v, v).as("native"), spec.as("spec"))
      .filter(col("native") =!= col("spec")) // bit-identical, same order
    assert(diff.count() == 0)
  }

  test("DeflateRatio (native) equals the UDF specification") {
    val sq = spark
    import sq.implicits._
    val edge = Seq(Some(""), Some("a"), Some("a" * 500),
      Some("the quick brown fox jumps over the lazy dog"),
      Some("ab " * 100)).toDF("text")
    for (d <- Seq(docs, edge)) {
      val diff = d.select(
          graft.ops.TextAnalysis.compressionRatio(col("text")).as("n"),
          graft.ops.TextAnalysis.compressionRatioUdf(col("text")).as("s"))
        .filter(col("n") =!= col("s")) // zlib is deterministic per input
      assert(diff.count() == 0)
    }
    // divergence by design on null: native propagates, UDF said 1.0
    val nulls = Seq(Option.empty[String]).toDF("text")
    assert(nulls.select(
      graft.ops.TextAnalysis.compressionRatio(col("text"))).head().isNullAt(0))
    // repetitive text compresses far below prose (the signal itself)
    val pair = Seq("ab " * 200,
      "the quick brown fox jumps over the lazy dog").toDF("text")
      .orderBy(length(col("text")).desc)
      .select(graft.ops.TextAnalysis.compressionRatio(col("text")))
      .collect().map(_.getDouble(0))
    assert(pair(0) < pair(1), pair.mkString(","))
  }

  test("WinnowFps (native deque) equals its HOF specification") {
    import spark.implicits._
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // real corpus + the edge shapes: empty, single token, fewer grams
    // than the window, doubled spaces (empty tokens), null
    val edge = Seq(Some(""), Some("one"), Some("a b c"), Some("a b c d"),
                   Some("x  y   z q r"), None)
      .zipWithIndex.map { case (t, i) => (9000L + i, t) }
      .toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 4), (2, 5), (1, 1), (4, 2))) {
      for (d <- Seq(docs.select(col("doc_id"), col("text")), edge)) {
        val native = sets(graft.ops.TextAnalysis.winnowFingerprints(
          d, col("doc_id"), col("text"), k, w))
        val hof = sets(graft.ops.TextAnalysis.winnowFingerprintsHof(
          d, col("doc_id"), col("text"), k, w))
        assert(native == hof, s"k=$k w=$w")
      }
    }
  }
}
