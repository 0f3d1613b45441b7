package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r10 evidence: read wall on a 400-append (400-dir) table
  * through the multi-leaf fast path, vs the 28.8 s the per-dir union
  * measured on the same shape (tablelife RAW checkpoint). */
object FastReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Sources
    val path = "/tmp/graft_fastread_probe"
    Sources.dropShardedTable(spark, path)
    def batch(i: Int) = spark.range(20)
      .select((col("id") + 20L * i).as("doc_id"),
        concat(lit("d"), col("id") + 20L * i).as("t"))
    (0 until 400).foreach { i =>
      Sources.shardedTableSinkBatch(batch(i), i.toLong,
        col("doc_id"), col("doc_id"), path, 1, Seq("doc_id"))
    }
    (0 until 3).foreach { k =>
      val t0 = System.nanoTime()
      val n = Sources.readShardedTable(spark, path).count()
      println(f"[scale] fastread 400-dir table run$k: rows=$n " +
        f"read=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    Sources.dropShardedTable(spark, path)
    spark.stop()
  }
}
