package graft

import org.scalatest.funsuite.AnyFunSuite

/** The grouping-sets multi-granularity lowering must read the input ONCE
  * (SURVEY.md §4.3 — at 100 TB the scan dominates; one pass per extra
  * granularity is the difference between N scans and one). The two
  * grouping-set consumers share a byte-identical Exchange, so the second
  * branch must resolve to ReusedExchange in the final adaptive plan. */
class MultigrainPlanCheck extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  test("q12 multi-granularity reuses one scan via exchange reuse") {
    val df = SparkEntry.queries("q12_multigrain_map")(spark, sf0001)
    df.collect() // AQE only finalizes the plan at runtime
    // toString prints "== Final Plan ==" then "== Initial Plan ==" —
    // only the final section reflects what actually ran
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("Expand"), "grouping sets should lower via Expand")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected a single scan, got $scans\n${p.take(1500)}")
  }
}
