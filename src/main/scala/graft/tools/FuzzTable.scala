package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.FuzzConformance.Spec
import graft.sources.Sources

/** Differential conformance fuzzing for the SHARDED-TABLE semantics —
  * random sequences of DELETE / MERGE / COMPACT against the documents
  * table, with the final logical state replayed in closed-form DuckDB
  * SQL from the same parameter draw. The hand-written table queries
  * (q523/q527/q531-q538) each pin ONE operation; these specs pin the
  * INTERACTIONS: a merge re-inserting keys an earlier delete removed,
  * a later merge overriding an earlier merge's value, a compaction in
  * the middle of a tombstone chain (which must apply the live
  * tombstones to the runs it rewrites and keep covering the rest),
  * and delete-of-absent-keys no-ops.
  *
  * The oracle simulation is symbolic: state = (presence predicate,
  * value expression) over residue classes of doc_id, folded per op —
  * delete ANDs out its class, merge ORs its class in and wraps the
  * value in one more CASE (later merges nest OUTSIDE earlier ones,
  * exactly the last-writer-wins the sequence numbers implement),
  * compaction is a logical no-op by definition. Merge batches derive
  * from the ORIGINAL documents rows on both engines, so value
  * expressions stay closed-form at any scale factor.
  *
  * A NEW Random (fixed seed 20260816) keeps the [[FuzzConformance]]
  * and [[FuzzEvalCrawl]] streams untouched — their specs stay
  * byte-stable. */
object FuzzTable {

  private sealed trait Op
  private final case class Delete(m: Int, r: Int) extends Op
  private final case class Merge(m: Int, r: Int, delta: Long) extends Op
  private final case object Compact extends Op

  def specs: Seq[Spec] = {
    val rnd = new scala.util.Random(20260816L)
    (0 until 12).map { i =>
      val name = s"q${539 + i}_tfuzz"
      // initial write: a non-empty union of residue classes mod m0
      val m0 = 2 + rnd.nextInt(5) // 2..6
      val w0 = (0 until m0).filter(_ => rnd.nextBoolean()).toSet
      val w = if (w0.isEmpty) Set(rnd.nextInt(m0)) else w0
      val nShards = 1 + rnd.nextInt(8)
      val nOps = 2 + rnd.nextInt(3) // 2..4 ops
      val ops: Seq[Op] = (0 until nOps).map { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 =>
            val m = 2 + rnd.nextInt(7); Delete(m, rnd.nextInt(m))
          case 2 | 3 =>
            val m = 2 + rnd.nextInt(7)
            Merge(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case _ => Compact
        }
      }
      // ---- symbolic SQL replay ----
      var present = w.toSeq.sorted
        .map(r => s"doc_id % $m0 = $r").mkString("(", " OR ", ")")
      var value = "n_chars"
      ops.foreach {
        case Delete(m, r) =>
          present = s"($present) AND NOT (doc_id % $m = $r)"
        case Merge(m, r, d) =>
          present = s"($present) OR (doc_id % $m = $r)"
          value =
            s"CASE WHEN doc_id % $m = $r THEN n_chars + $d ELSE $value END"
        case Compact => ()
      }
      val sql =
        s"""SELECT doc_id, source, CAST($value AS BIGINT) AS n_chars
           FROM documents WHERE $present ORDER BY doc_id"""
      // ---- the actual table-op sequence ----
      val query = (s: SparkSession, dir: String) => {
        import graft.Checkpoints.CheckpointOps
        val path = java.nio.file.Files
          .createTempDirectory("graft_tfuzz_").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        Sources.writeShardedTable(
          docs.filter(w.toSeq.sorted
            .map(r => pmod(col("doc_id"), lit(m0)) === r)
            .reduce(_ || _)),
          col("doc_id"), col("doc_id"), path, numShards = nShards,
          statsCols = Seq("doc_id"))
        ops.foreach {
          case Delete(m, r) =>
            Sources.deleteFromShardedTable(s, path, "doc_id",
              docs.filter(pmod(col("doc_id"), lit(m)) === r)
                .select(col("doc_id")))
          case Merge(m, r, d) =>
            Sources.mergeShardedTable(
              docs.filter(pmod(col("doc_id"), lit(m)) === r)
                .withColumn("n_chars", col("n_chars") + d),
              "doc_id", col("doc_id"), path, numShards = 2,
              statsCols = Seq("doc_id"))
          case Compact =>
            Sources.compactShardedTable(s, path, col("doc_id"),
              col("doc_id"), numShards = 4, statsCols = Seq("doc_id"),
              smallDirRows = Long.MaxValue / 4)
        }
        val res = Sources.readShardedTable(s, path)
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("n_chars"))
          .cut()
        Sources.dropShardedTable(s, path)
        res.orderBy("doc_id")
      }
      Spec(name, query, sql)
    }
  }
}
