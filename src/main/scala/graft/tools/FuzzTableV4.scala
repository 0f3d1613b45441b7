package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.FuzzConformance.Spec
import graft.sources.Sources

/** tfuzz4: differential fuzzing over SCHEMA EVOLUTION beyond
  * add-only — TYPE WIDENING (the table starts with an INT value
  * column; a widening append switches it to LONG mid-chain, and
  * later narrow writers must up-cast, never demote) and COLUMN
  * RENAME via the manifest-level mapping (value column AND the
  * row-id/tombstone key column, possibly several times per chain) —
  * interleaved with append/merge/delete/compact/expire.
  *
  * Evolution is value-invariant, so the oracle is the v1/v2
  * event/killer fold untouched; only the FINAL column names change:
  * the replay selects `doc_id AS <current key name>` and the value
  * expression `AS <current value name>`. Any translation bug —
  * a rename orphaning an old dir's column, a tombstone that stops
  * killing after its key column was renamed, a compaction folding
  * pre-rename runs under stale names, a widening flip-flop — shows
  * up as a row/schema/hash mismatch.
  *
  * A NEW Random (fixed seed 20260819) keeps every other fuzz family
  * byte-stable. */
object FuzzTableV4 {

  private sealed trait Op4
  private final case class Append4(m: Int, r: Int, d: Long,
                                   widen: Boolean) extends Op4
  private final case class Merge4(m: Int, r: Int, d: Long) extends Op4
  private final case class Delete4(m: Int, r: Int) extends Op4
  private final case class RenameVal4(ix: Int) extends Op4
  private final case class RenameKey4(ix: Int) extends Op4
  private final case object Compact4 extends Op4
  private final case class Expire4(keep: Int) extends Op4

  private final case class Ev4(pred: String, value: String, step: Int)

  private final case class Draw(m0: Int, w: Set[Int], nShards: Int,
                                ops: Seq[Op4])

  /** Numeric pre-flight over doc_id 0..499 (see FuzzTableV3): a chain
    * whose final state is near-empty verifies nothing — redraw. */
  private def finalCount(d: Draw): Int = {
    val present = Array.tabulate(500)(doc => d.w.contains(doc % d.m0))
    val extra = Array.fill(500)(0) // duplicate copies from appends
    d.ops.foreach {
      case Append4(m, r, _, _) =>
        for (doc <- 0 until 500 if doc % m == r) {
          if (present(doc)) extra(doc) += 1 else present(doc) = true
        }
      case Merge4(m, r, _) =>
        for (doc <- 0 until 500 if doc % m == r) {
          present(doc) = true; extra(doc) = 0
        }
      case Delete4(m, r) =>
        for (doc <- 0 until 500 if doc % m == r) {
          present(doc) = false; extra(doc) = 0
        }
      case _ => ()
    }
    (0 until 500).count(present)
  }

  def specs: Seq[Spec] = {
    val rnd = new scala.util.Random(20260819L)
    def draw(): Draw = {
      val m0 = 2 + rnd.nextInt(5)
      val w0 = (0 until m0).filter(_ => rnd.nextBoolean()).toSet
      val w = if (w0.isEmpty) Set(rnd.nextInt(m0)) else w0
      val nShards = 1 + rnd.nextInt(8)
      val nOps = 3 + rnd.nextInt(3) // 3..5 ops
      var renames = 0
      val ops: Seq[Op4] = (0 until nOps).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 =>
            val m = 2 + rnd.nextInt(7)
            Merge4(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case 2 =>
            val m = 2 + rnd.nextInt(7)
            Append4(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)),
              widen = true)
          case 3 =>
            val m = 2 + rnd.nextInt(7)
            Append4(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)),
              widen = false)
          case 4 | 5 =>
            val m = 2 + rnd.nextInt(7); Delete4(m, rnd.nextInt(m))
          case 6 =>
            renames += 1; RenameVal4(renames)
          case 7 =>
            renames += 1; RenameKey4(renames)
          case 8 => Compact4
          case _ => Expire4(1 + rnd.nextInt(3))
        }
      }
      Draw(m0, w, nShards, ops)
    }
    (0 until 8).map { i =>
      val name = s"q${583 + i}_tfuzz4"
      var d = draw()
      while (finalCount(d) < 20) d = draw()
      val Draw(m0, w, nShards, ops) = d
      // ---- symbolic event/killer replay + final-name tracking ----
      val p0 = w.toSeq.sorted
        .map(r => s"doc_id % $m0 = $r").mkString("(", " OR ", ")")
      var events = List(Ev4(p0, "n_chars", step = 0))
      var killers = List.empty[(String, Int)]
      var keyName = "doc_id"
      var valName = "n_chars"
      ops.zipWithIndex.foreach { case (op, ix) =>
        val s = ix + 1
        op match {
          case Append4(m, r, dd, _) =>
            events ::= Ev4(s"doc_id % $m = $r", s"n_chars + $dd", s)
          case Merge4(m, r, dd) =>
            killers ::= (s"doc_id % $m = $r", s)
            events ::= Ev4(s"doc_id % $m = $r", s"n_chars + $dd", s)
          case Delete4(m, r) =>
            killers ::= (s"doc_id % $m = $r", s)
          case RenameVal4(ix2) => valName = s"val$ix2"
          case RenameKey4(ix2) => keyName = s"key$ix2"
          case Compact4 | Expire4(_) => ()
        }
      }
      val terms = events.reverse.map { e =>
        val later = killers.filter(_._2 > e.step).map(_._1).sorted
        val kill =
          if (later.isEmpty) ""
          else later.mkString(" AND NOT (", " OR ", ")")
        s"""SELECT doc_id AS $keyName, source,
            CAST(${e.value} AS BIGINT) AS $valName
            FROM documents WHERE (${e.pred})$kill"""
      }
      val sql = terms.mkString(
        "SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY 1, 3")
      // ---- the actual table-op sequence ----
      val query = (s: SparkSession, dir: String) => {
        import graft.Checkpoints.CheckpointOps
        val path = java.nio.file.Files
          .createTempDirectory("graft_tfuzz4_").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        var curKey = "doc_id"
        var curVal = "n_chars"
        var curType = "int" // widened to long mid-chain
        def shaped(m: Int, r: Int, dd: Long, t: String) =
          docs.filter(pmod(col("doc_id"), lit(m)) === r)
            .select(col("doc_id").as(curKey), col("source"),
              (col("n_chars") + dd).cast(t).as(curVal))
        Sources.writeShardedTable(
          docs.filter(w.toSeq.sorted
              .map(r => pmod(col("doc_id"), lit(m0)) === r)
              .reduce(_ || _))
            .select(col("doc_id"), col("source"),
              col("n_chars").cast("int").as("n_chars")),
          col("doc_id"), col("doc_id"), path, numShards = nShards,
          statsCols = Seq("doc_id"))
        ops.foreach {
          case Append4(m, r, dd, widen) =>
            if (widen) curType = "long"
            Sources.appendShardedTable(shaped(m, r, dd, curType),
              col(curKey), col(curKey), path, numShards = 2,
              statsCols = Seq(curKey))
          case Merge4(m, r, dd) =>
            Sources.mergeShardedTable(shaped(m, r, dd, curType),
              curKey, col(curKey), path, numShards = 2,
              statsCols = Seq(curKey))
          case Delete4(m, r) =>
            Sources.deleteFromShardedTable(s, path, curKey,
              docs.filter(pmod(col("doc_id"), lit(m)) === r)
                .select(col("doc_id").as(curKey)))
          case RenameVal4(ix2) =>
            val to = s"val$ix2"
            Sources.renameShardedTableColumn(s, path, curVal, to)
            curVal = to
          case RenameKey4(ix2) =>
            val to = s"key$ix2"
            Sources.renameShardedTableColumn(s, path, curKey, to)
            curKey = to
          case Compact4 =>
            Sources.compactShardedTable(s, path, col(curKey),
              col(curKey), numShards = 4, statsCols = Seq(curKey),
              smallDirRows = Long.MaxValue / 4)
          case Expire4(keep) =>
            Sources.expireShardedSnapshots(s, path, keep)
        }
        val res = Sources.readShardedTable(s, path)
          .select(col(curKey), col("source"),
            col(curVal).cast("long").as(curVal))
          .cut()
        Sources.dropShardedTable(s, path)
        res.orderBy(col(curKey), col(curVal))
      }
      Spec(name, query, sql)
    }
  }
}
