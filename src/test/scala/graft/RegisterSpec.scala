package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** SQL-registered native functions agree with the Column API. */
class RegisterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered SQL functions match the Column API expressions") {
    graft.functions.Register.all(spark)
    Seq((1L, "a b c d e f"), (2L, "x y"))
      .toDF("id", "text").createOrReplaceTempView("reg_docs")
    val viaSql = spark.sql(
      """SELECT id, simhash62(word_shingles(text, 3)) AS sh,
                size(minhash_sig(word_shingles(text, 3), 32)) AS m,
                array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d
         FROM reg_docs ORDER BY id""").collect()
    val viaCols = spark.table("reg_docs")
      .select(col("id"),
        graft.functions.SimHash62(TextFunctions.shingles(col("text"), 3)).as("sh"),
        size(TextFunctions.minhashSignature(
          TextFunctions.shingles(col("text"), 3), 32)).as("m"))
      .orderBy("id").collect()
    assert(viaSql.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
           viaCols.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq)
    assert(viaSql.head.getDouble(3) == 11.0) // 1*3 + 2*4
  }
}
