package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev-only recall probe for [[Similarity.cosinePairsLsh]] at the
  * embedding corpus's actual cosine levels (pairs sit at 0.40-0.55 —
  * there are no high-cosine planted dups, so the config must reach
  * recall 1 right at the threshold). The hyperplanes are seeded, so
  * recall per (nPlanes, tables) on a given corpus is DETERMINISTIC —
  * this probe finds the config q49 pins. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = pairs(Dedup.embeddingPairs(
        e, col("vec_id"), col("embedding"), tau = 0.4))
      println(s"[probe] $sf exact pairs: ${exact.size}")
      for (b <- Seq(2); t <- Seq(24)) {
        val got = pairs(Similarity.cosinePairsLsh(
          e, col("vec_id"), col("embedding"), tau = 0.4,
          nPlanes = b, tables = t))
        val miss = exact -- got
        println(s"[probe] $sf b=$b t=$t found=${got.size} missed=${miss.size}")
      }
    }
    spark.stop()
  }
}
