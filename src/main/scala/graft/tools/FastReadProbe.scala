package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fast-read evidence rows. r10: read wall on a 400-append (400-dir)
  * UNPARTITIONED table through the multi-leaf fast path, vs the
  * 28.8 s the per-dir union measured on the same shape (tablelife RAW
  * checkpoint). r12: the same 400-dir shape PARTITIONED (the layout
  * the fast path was gated off for until this round) and RENAMED
  * mid-chain — both must stay within ~2x of the unpartitioned fast
  * read, or the generalization failed its purpose. */
object FastReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Sources

    def runCase(tag: String, partitioned: Boolean,
                renameAt: Option[Int]): Unit = {
      val path = s"/tmp/graft_fastread_probe_$tag"
      Sources.dropShardedTable(spark, path)
      def batch(i: Int, c: String) = spark.range(20)
        .select((col("id") + 20L * i).as("doc_id"),
          concat(lit("s"), pmod(col("id"), lit(4))).as("src"),
          concat(lit("d"), col("id") + 20L * i).as(c))
      val t0w = System.nanoTime()
      (0 until 400).foreach { i =>
        val c = if (renameAt.exists(i > _)) "t2" else "t"
        if (i == 0)
          Sources.writeShardedTable(batch(0, c), col("doc_id"),
            col("doc_id"), path, 1, Seq("doc_id"),
            partitionCols = if (partitioned) Seq("src") else Nil)
        else
          Sources.appendShardedTable(batch(i, c), col("doc_id"),
            col("doc_id"), path, 1, Seq("doc_id"))
        renameAt.foreach(at => if (i == at)
          Sources.renameShardedTableColumn(spark, path, "t", "t2"))
      }
      println(f"[scale] fastread $tag: 400 commits " +
        f"${(System.nanoTime() - t0w) / 1e9}%.1f s " +
        f"(${(System.nanoTime() - t0w) / 400e6}%.0f ms/commit)")
      (0 until 3).foreach { k =>
        val t0 = System.nanoTime()
        val n = Sources.readShardedTable(spark, path).count()
        println(f"[scale] fastread $tag run$k: rows=$n " +
          f"read=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      Sources.dropShardedTable(spark, path)
    }
    runCase("plain", partitioned = false, renameAt = None)
    runCase("partitioned", partitioned = true, renameAt = None)
    runCase("renamed", partitioned = false, renameAt = Some(200))
    spark.stop()
  }
}
