package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Classifier-evaluation ops against hand-computed and independently
  * derived ground truth (the pair-counting U statistic, a driver-side
  * step integration) — the oracle checks cross-engine exactness;
  * these check the math itself.
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df(rows: Seq[(Long, Boolean)]) = {
    import spark.implicits._
    rows.toDF("score", "label")
  }

  test("rocAuc hand case with a tie group") {
    // scores 1-,2-,2+,3+: ranks 1, 2.5, 2.5, 4 → Σranks⁺ = 6.5,
    // U = 6.5 − 3 = 3.5, AUC = 3.5/4 = 0.875
    val r = Eval.rocAuc(df(Seq((1L, false), (2L, false), (2L, true),
      (3L, true))), col("score"), col("label")).collect()(0)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Long]("auc_num2") == 7) // 2U
    assert(r.getAs[Long]("auc_den") == 8)
    assert(r.getAs[Long]("auc_micro") == 875000)
  }

  test("rocAuc equals the pair-counting U statistic on seeded data") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(400) {
      val s = rnd.nextInt(25).toLong
      // label correlates with score so AUC is far from both 0.5 and 1
      (s, rnd.nextInt(25) < s)
    }
    val r = Eval.rocAuc(df(rows), col("score"), col("label")).collect()(0)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg if p > n) yield 1).size.toLong
    val ties = (for (p <- pos; n <- neg if p == n) yield 1).size.toLong
    assert(r.getAs[Long]("auc_num2") == 2 * wins + ties)
    assert(r.getAs[Long]("auc_den") ==
      2L * pos.size * neg.size)
  }

  test("rocAuc with one class absent yields null auc_micro") {
    val r = Eval.rocAuc(df(Seq((1L, true), (2L, true))),
      col("score"), col("label")).collect()(0)
    assert(r.getAs[Long]("n_neg") == 0)
    assert(r.isNullAt(r.fieldIndex("auc_micro")))
  }

  test("prCurve hand case: suffix counts and micro ratios") {
    // desc thresholds: 3 → tp=1 pp=1; 2 → tp=2 pp=3; 1 → tp=2 pp=4
    val rows = Eval.prCurve(df(Seq((1L, false), (2L, false), (2L, true),
        (3L, true))), col("score"), col("label"))
      .orderBy(desc("threshold")).collect()
    assert(rows.map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("tp"),
      r.getAs[Long]("pp"))).toSeq ==
      Seq((3L, 1L, 1L), (2L, 2L, 3L), (1L, 2L, 4L)))
    assert(rows.map(_.getAs[Long]("prec_micro")).toSeq ==
      Seq(1000000L, 666667L, 500000L)) // 2/3 rounds half-up
    assert(rows.map(_.getAs[Long]("rec_micro")).toSeq ==
      Seq(500000L, 1000000L, 1000000L))
  }

  test("prAuc is exactly 1e6 for a perfect separable classifier") {
    // 4 positives above all negatives, term-divisible: each ΔTP·P/np
    // term is exactly 250000 micro
    val rows = (1L to 4L).map(s => (s, false)) ++
      (11L to 14L).map(s => (s, true))
    val r = Eval.prAuc(df(rows), col("score"), col("label")).collect()(0)
    assert(r.getAs[Long]("pr_auc_micro") == 1000000L)
    assert(r.getAs[Long]("n_thresholds") == 8)
  }

  test("prAuc matches a driver-side step integration within rounding") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300) {
      val s = rnd.nextInt(40).toLong
      (s, rnd.nextInt(40) < s)
    }
    val r = Eval.prAuc(df(rows), col("score"), col("label")).collect()(0)
    val np = rows.count(_._2).toDouble
    val byS = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.size, g.count(_._2)) }.toSeq.sortBy(-_._1)
    var tp = 0L; var pp = 0L; var area = 0.0
    for ((_, n, p) <- byS) {
      tp += p; pp += n
      area += p / np * (tp.toDouble / pp)
    }
    val nTh = r.getAs[Long]("n_thresholds")
    assert(math.abs(r.getAs[Long]("pr_auc_micro") - area * 1e6)
      <= nTh.toDouble) // ≤ 0.5µ per micro-rounded term + fp noise
  }

  test("rocAucByGroup matches per-group pair counting; one-class null") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(300) {
      val g = s"g${rnd.nextInt(3)}"
      val s = rnd.nextInt(15).toLong
      (g, s, rnd.nextInt(15) < s)
    } :+ (("solo", 9L, true)) // one-class group → null AUC
    val out = Eval.rocAucByGroup(rows.toDF("g", "score", "label"),
        col("g"), col("score"), col("label"), partitions = 4)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val sub = rows.filter(_._1 == g)
      val pos = sub.filter(_._3).map(_._2)
      val neg = sub.filterNot(_._3).map(_._2)
      val wins = (for (p <- pos; n <- neg if p > n) yield 1).size.toLong
      val ties = (for (p <- pos; n <- neg if p == n) yield 1).size.toLong
      assert(out(g).getAs[Long]("auc_num2") == 2 * wins + ties, g)
      assert(out(g).getAs[Long]("auc_den") ==
        2L * pos.size * neg.size, g)
    }
    assert(out("solo").isNullAt(out("solo").fieldIndex("auc_micro")))
  }

  test("rocAucByGroup surfaces null group keys as the <null> group") {
    import spark.implicits._
    val rows = Seq((Option("a"), 1L, false), (Option("a"), 2L, true),
      (Option.empty[String], 1L, false), (Option.empty[String], 3L, true),
      (Option.empty[String], 2L, true))
    val out = Eval.rocAucByGroup(rows.toDF("g", "score", "label"),
        col("g"), col("score"), col("label"), partitions = 2)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out.keySet == Set("a", "<null>"))
    val n = out("<null>")
    assert(n.getAs[Long]("n_pos") == 2 && n.getAs[Long]("n_neg") == 1)
    assert(n.getAs[Long]("auc_micro") == 1000000L) // perfectly separated
  }

  test("bestF1 on an empty frame returns zero rows, not a null row") {
    assert(Eval.bestF1(df(Seq.empty), col("score"), col("label"))
      .collect().isEmpty)
  }

  test("bestF1 picks the F1-maximizing threshold") {
    // thresholds desc: 3 → F1 2/3; 2 → 4/5 (best); 1 → 4/6
    val r = Eval.bestF1(df(Seq((3L, true), (2L, true), (2L, false),
      (1L, false))), col("score"), col("label")).collect()(0)
    assert(r.getAs[Long]("threshold") == 2L)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("pp") == 3L)
    assert(r.getAs[Long]("f1_micro") == 800000L)
  }

  test("bestF1 matches a driver-side argmax on seeded data") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(500) {
      val s = rnd.nextInt(30).toLong
      (s, rnd.nextInt(30) < s)
    }
    val r = Eval.bestF1(df(rows), col("score"), col("label")).collect()(0)
    val np = rows.count(_._2).toLong
    val byS = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.size.toLong, g.count(_._2).toLong) }.toSeq.sortBy(-_._1)
    var tp = 0L; var pp = 0L
    val cands = byS.map { case (s, n, p) =>
      tp += p; pp += n
      val den = pp + np
      (s, (tp * 4000000 + den) / (den * 2)) // same half-up micro F1
    }
    val best = cands.maxBy { case (s, f1) => (f1, s) }
    assert(r.getAs[Long]("threshold") == best._1)
    assert(r.getAs[Long]("f1_micro") == best._2)
  }

  test("calibrationBins hand case: identity bins, exact rates") {
    val rows = (0L to 9L).map(s => (s, s >= 5L))
    val out = Eval.calibrationBins(df(rows), col("score"), col("label"),
      bins = 10).orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    assert(out.forall(_.getAs[Long]("n") == 1L))
    assert(out.map(_.getAs[Long]("pos_rate_micro")).toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 1000000L, 1000000L, 1000000L, 1000000L,
        1000000L))
    // sum_shift reconstructs the mean: shift = s − min = s
    assert(out.map(_.getAs[Long]("sum_shift")).toSeq == (0L to 9L))
  }

  test("calibrationBins collapses identical scores into bin 0") {
    val out = Eval.calibrationBins(df(Seq((5L, true), (5L, false),
        (5L, true))), col("score"), col("label"), bins = 10).collect()
    assert(out.length == 1 && out(0).getAs[Long]("bin") == 0L)
    assert(out(0).getAs[Long]("n") == 3L)
    assert(out(0).getAs[Long]("pos_rate_micro") == 666667L)
  }

  test("spearmanMicro: monotone = 1e6, reversed = -1e6, ties match " +
       "the average-rank hand case, constant column is NULL") {
    val spark = TestSpark.spark
    import spark.implicits._
    def sp(rows: Seq[(Long, Long)]): (Long, Option[Long]) = {
      val r = Eval.spearmanMicro(rows.toDF("x", "y"),
        col("x"), col("y")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
    }
    assert(sp(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
      == ((4L, Some(1000000L))))
    assert(sp(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)))
      == ((4L, Some(-1000000L))))
    // x = (1,1,2), y = (5,6,7): doubled ranks rx2 = (3,3,6),
    // ry2 = (2,4,6) -> rho = 18/sqrt(18*24) = 0.8660254 -> 866025
    assert(sp(Seq((1L, 5L), (1L, 6L), (2L, 7L)))
      == ((3L, Some(866025L))))
    // constant column: zero variance -> NULL, not a crash or a 0
    assert(sp(Seq((7L, 1L), (7L, 2L), (7L, 3L))) == ((3L, None)))
  }

  test("spearmanMicro drops null-bearing rows pairwise: ranks and " +
       "moments cover the same population") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq((Some(1L), Some(10L)), (Some(2L), None),
      (None, Some(25L)), (Some(3L), Some(30L)), (Some(4L), Some(40L)))
    val r = Eval.spearmanMicro(rows.toDF("x", "y"), col("x"), col("y"))
      .collect()(0)
    // survivors (1,10),(3,30),(4,40): perfectly monotone over n=3
    assert(r.getLong(0) == 3L && r.getLong(1) == 1000000L)
  }

  test("spearmanByGroup: per-group rho equals global rho computed " +
       "group-by-group; degenerate group NULL; null group surfaces") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), // monotone
      ("b", 1L, 40L), ("b", 2L, 30L), ("b", 3L, 20L), // reversed
      ("c", 7L, 1L), ("c", 7L, 2L),                   // constant x
      (null.asInstanceOf[String], 1L, 5L),
      (null.asInstanceOf[String], 2L, 9L))
    val out = Eval.spearmanByGroup(rows.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("<null>", 2L, Some(1000000L)),
      ("a", 3L, Some(1000000L)),
      ("b", 3L, Some(-1000000L)),
      ("c", 2L, None)))
  }

  test("kendallTauBByGroup: hand cases — monotone +1e6, reversed " +
       "-1e6, the tie-corrected textbook case, all-tied margin NULL") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 30L), ("b", 2L, 20L), ("b", 3L, 10L),
      // ties both margins: x=(1,1,2,2), y=(1,2,1,2) -> C=1 pair
      // ((1,1)-(2,2)), D=1 ((1,2)-(2,1)), plus (1,1)-(2,1) and
      // (1,2)-(2,2) are y-ties -> C=2, D=1? enumerate: cells
      // (1,1),(1,2),(2,1),(2,2) each f=1; x1<x2 pairs:
      // (1,1)-(2,1): y tie; (1,1)-(2,2): C; (1,2)-(2,1): D;
      // (1,2)-(2,2): y tie -> C=1, D=1, tau=0
      ("t", 1L, 1L), ("t", 1L, 2L), ("t", 2L, 1L), ("t", 2L, 2L),
      ("z", 5L, 1L), ("z", 5L, 2L)) // all-tied x margin
    val out = Eval.kendallTauBByGroup(rows.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 3L, 3L, 0L, Some(1000000L)),
      ("b", 3L, 0L, 3L, Some(-1000000L)),
      ("t", 4L, 1L, 1L, Some(0L)),
      ("z", 2L, 0L, 0L, None)))
  }
}
