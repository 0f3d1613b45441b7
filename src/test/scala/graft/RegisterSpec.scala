package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** SQL-registered native functions agree with the Column API. */
class RegisterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extensions hook resolves native functions with no Register call") {
    // TestSpark builds the session withExtensions(new GraftExtensions);
    // SQL text must resolve the injected functions cold — no
    // Register.all in this test, by design
    val r = spark.sql(
      "SELECT array_dot(array(2.0d, 3.0d), array(5.0d, 7.0d))").collect()
    assert(r.head.getDouble(0) == 31.0)
    // and the injection survives session forks (newSession shares the
    // extensions), which is what cluster SQL entry points rely on
    val forked = spark.newSession()
    val f = forked.sql(
      "SELECT size(minhash_sig(word_shingles('a b c d', 3), 16))")
      .collect()
    assert(f.head.getInt(0) == 16)
  }

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
