package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scaling probe: replicate the bench corpus 10x (50k docs,
  * every doc in a 10-copy near-dup clique — a worst-case duplication
  * profile) and time the dedup operators. Checks the knee of the curve:
  * candidate generation must scale with true-pair count, not corpus^2. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = d.count()
    // 10 copies with distinct ids; tiny per-copy suffix so copies are
    // near-dups (j ~ 0.97), not byte-identical
    val big = (0 until 10).map { i =>
      d.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
               concat(col("text"), lit(s" probe$i tail")).as("text"))
    }.reduce(_ union _)
    big.write.mode("overwrite").parquet("/tmp/graft_scale_docs")
    val corpus = spark.read.parquet("/tmp/graft_scale_docs")
    println(s"[scale] corpus: ${corpus.count()} docs (base $n)")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s   rows=$r")
    }
    time("minhash_lsh 50k")(graft.ops.Dedup.minhashLshPairs(
      corpus, col("doc_id"), col("text"), tau = 0.6).count())
    time("simhash 50k")(graft.ops.Dedup.simhashPairs(
      corpus, col("doc_id"), col("text"), tau = 0.6).count())
    time("jaccard exact 50k")(graft.ops.Dedup.jaccardPairs(
      corpus, col("doc_id"), col("text"), tau = 0.6).count())
    spark.stop()
  }
}
