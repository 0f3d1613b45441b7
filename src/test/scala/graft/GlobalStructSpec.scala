package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dsl.Domain._
import graft.dsl.Range._

/** Global (unkeyed) multi-granularity structs take the one-scan
  * grouping-sets path too: GROUPING SETS ((), (innerKey)). */
class GlobalStructSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("root RStruct with nested map computes globally in one pass") {
    val in = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = Transform(
      rows("k", "v"),
      RStruct(Seq(
        "total" -> RAgg(sum(col("v"))),
        "by_k" -> RMap(col("k"), RAgg(count(lit(1)))))))
      .nested(in)
    val row = out.collect()(0).getStruct(0)
    assert(row.getLong(row.fieldIndex("total")) == 6L)
    assert(row.getAs[Map[String, Long]]("by_k") == Map("a" -> 2L, "b" -> 1L))
  }
}
