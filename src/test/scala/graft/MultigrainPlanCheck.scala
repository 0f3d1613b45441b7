package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plan.RangeLowering

/** The grouping-sets multi-granularity lowering must read the input ONCE
  * when the input is big (SURVEY.md §4.3 — at 100 TB the scan dominates;
  * one pass per extra granularity is the difference between N scans and
  * one) and is allowed to re-scan when the input is small (the Expand's
  * row multiplication costs more than re-reading a few MB — measured 4x
  * at sf0.1). The choice is stats-driven (RangeLowering.preferOneScan);
  * these tests pin BOTH regimes and that results agree across them. */
class MultigrainPlanCheck extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE only finalizes the plan at runtime
    // toString prints "== Final Plan ==" then "== Initial Plan ==" —
    // only the final section reflects what actually ran
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def withThreshold[A](bytes: String)(f: => A): A = {
    spark.conf.set(RangeLowering.oneScanMinBytesKey, bytes)
    try f finally spark.conf.unset(RangeLowering.oneScanMinBytesKey)
  }

  test("q12 multi-granularity reuses one scan at the large-input setting") {
    withThreshold("0") {
      val p = finalPlan(SparkEntry.queries("q12_multigrain_map")(spark, sf0001))
      assert(p.contains("Expand"), "grouping sets should lower via Expand")
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans == 1, s"expected a single scan, got $scans\n${p.take(1500)}")
    }
  }

  test("q12 takes the join path below the size threshold (default at sf)") {
    // sf0.001 lineitem is far below the 1 GiB default: the adaptive
    // choice must pick the per-granularity join path (no Expand)
    val p = finalPlan(SparkEntry.queries("q12_multigrain_map")(spark, sf0001))
    assert(!p.contains("Expand"),
      s"small input should avoid the Expand path\n${p.take(1500)}")
  }

  test("both multigrain plans produce identical results") {
    val one = withThreshold("0") {
      SparkEntry.queries("q12_multigrain_map")(spark, sf0001).collect().toSeq
    }
    val join = withThreshold(Long.MaxValue.toString) {
      SparkEntry.queries("q12_multigrain_map")(spark, sf0001).collect().toSeq
    }
    assert(one == join)
  }
}
