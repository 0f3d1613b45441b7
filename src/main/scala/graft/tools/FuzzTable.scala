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

  // ---- v2 (r10): the WIDENED op set --------------------------------
  //
  // The r9 chains draw only Delete/Merge/Compact. These add the ops
  // where table formats actually rot — the INTERACTIONS: a schema
  // evolution in the middle of a tombstone chain (compaction must
  // null-fill across the boundary), plain appends AFTER an evolution
  // (schema authority must be the newest dir), snapshot expiry under
  // a later read, duplicate doc_ids from overlapping appends that a
  // merge must kill in one shot, and a bloom-sidecar point-lookup
  // final read whose pruning must be invisible to results.
  //
  // The oracle generalizes v1's (presence, value) fold to an
  // EVENT/KILLER model: every write/append/merge contributes an
  // insert EVENT (predicate over doc_id residues, value expression,
  // lang-carrying flag, step number); every delete/merge contributes
  // a KILLER (predicate, step). A row of event e survives iff no
  // killer with a LARGER step covers it — exactly the sequence-number
  // semantics the tombstones implement. The SQL replay is one
  // UNION ALL term per event. Compact and expire are logical no-ops.
  //
  // A NEW Random (fixed seed 20260817) keeps the v1 stream and every
  // other fuzz family byte-stable.

  private sealed trait Op2
  private final case class Append2(m: Int, r: Int, delta: Long,
                                   evolve: Boolean) extends Op2
  private final case class Delete2(m: Int, r: Int) extends Op2
  private final case class Merge2(m: Int, r: Int, delta: Long)
    extends Op2
  private final case object Compact2 extends Op2
  private final case class Expire2(keep: Int) extends Op2

  private final case class Ev(pred: String, value: String,
                              hasLang: Boolean, step: Int)

  def specsV2: Seq[Spec] = {
    val rnd = new scala.util.Random(20260817L)
    (0 until 10).map { i =>
      val name = s"q${554 + i}_tfuzz2"
      val m0 = 2 + rnd.nextInt(5)
      val w0 = (0 until m0).filter(_ => rnd.nextBoolean()).toSet
      val w = if (w0.isEmpty) Set(rnd.nextInt(m0)) else w0
      val nShards = 1 + rnd.nextInt(8)
      val nOps = 3 + rnd.nextInt(3) // 3..5 ops
      val ops: Seq[Op2] = (0 until nOps).map { _ =>
        rnd.nextInt(9) match {
          case 0 | 1 =>
            val m = 2 + rnd.nextInt(7)
            Append2(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)),
              evolve = false)
          case 2 =>
            val m = 2 + rnd.nextInt(7)
            Append2(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)),
              evolve = true)
          case 3 | 4 =>
            val m = 2 + rnd.nextInt(7); Delete2(m, rnd.nextInt(m))
          case 5 | 6 =>
            val m = 2 + rnd.nextInt(7)
            Merge2(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case 7 => Compact2
          case _ => Expire2(1 + rnd.nextInt(3))
        }
      }
      val lookup: Option[Int] =
        if (rnd.nextInt(3) == 0) Some(rnd.nextInt(50)) else None
      // ---- symbolic event/killer replay ----
      val p0 = w.toSeq.sorted
        .map(r => s"doc_id % $m0 = $r").mkString("(", " OR ", ")")
      var events = List(Ev(p0, "n_chars", hasLang = false, step = 0))
      var killers = List.empty[(String, Int)]
      var evolvedSym = false
      ops.zipWithIndex.foreach { case (op, ix) =>
        val s = ix + 1
        op match {
          case Append2(m, r, d, ev) =>
            if (ev) evolvedSym = true
            events ::= Ev(s"doc_id % $m = $r", s"n_chars + $d",
              evolvedSym, s)
          case Delete2(m, r) =>
            killers ::= (s"doc_id % $m = $r", s)
          case Merge2(m, r, d) =>
            killers ::= (s"doc_id % $m = $r", s)
            events ::= Ev(s"doc_id % $m = $r", s"n_chars + $d",
              evolvedSym, s)
          case Compact2 | Expire2(_) => ()
        }
      }
      val anyEvolved = evolvedSym
      val terms = events.reverse.map { e =>
        val later = killers.filter(_._2 > e.step).map(_._1)
        val kill =
          if (later.isEmpty) ""
          else later.sorted.mkString(" AND NOT (", " OR ", ")")
        val probe = lookup.map(x => s" AND doc_id = $x").getOrElse("")
        val langSel =
          if (!anyEvolved) ""
          else if (e.hasLang) ", lang"
          else ", CAST(NULL AS VARCHAR) AS lang"
        s"""SELECT doc_id, source,
            CAST(${e.value} AS BIGINT) AS n_chars$langSel
            FROM documents WHERE (${e.pred})$kill$probe"""
      }
      // lang sorts NULLS FIRST to match Spark's asc default (mixed
      // null/value ties happen when a pre- and post-evolution event
      // insert the same doc at the same value)
      val orderTail =
        if (anyEvolved) ", lang NULLS FIRST" else ""
      val sql = terms.mkString(
        "SELECT * FROM (\n", "\nUNION ALL\n",
        s"\n) ORDER BY doc_id, n_chars$orderTail")
      // ---- the actual table-op sequence ----
      val query = (s: SparkSession, dir: String) => {
        import graft.Checkpoints.CheckpointOps
        val path = java.nio.file.Files
          .createTempDirectory("graft_tfuzz2_").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        Sources.writeShardedTable(
          docs.filter(w.toSeq.sorted
            .map(r => pmod(col("doc_id"), lit(m0)) === r)
            .reduce(_ || _))
            .select(col("doc_id"), col("source"), col("n_chars")),
          col("doc_id"), col("doc_id"), path, numShards = nShards,
          statsCols = Seq("doc_id"))
        var evolved = false
        def shaped(m: Int, r: Int, d: Long) = {
          val b = docs.filter(pmod(col("doc_id"), lit(m)) === r)
            .withColumn("n_chars", col("n_chars") + d)
          if (evolved)
            b.select(col("doc_id"), col("source"), col("n_chars"),
              col("lang"))
          else b.select(col("doc_id"), col("source"), col("n_chars"))
        }
        ops.foreach {
          case Append2(m, r, d, ev) =>
            if (ev && !evolved) {
              evolved = true
              Sources.appendShardedTable(shaped(m, r, d),
                col("doc_id"), col("doc_id"), path, numShards = 2,
                statsCols = Seq("doc_id"), allowNewColumns = true)
            } else
              Sources.appendShardedTable(shaped(m, r, d),
                col("doc_id"), col("doc_id"), path, numShards = 2,
                statsCols = Seq("doc_id"))
          case Delete2(m, r) =>
            Sources.deleteFromShardedTable(s, path, "doc_id",
              docs.filter(pmod(col("doc_id"), lit(m)) === r)
                .select(col("doc_id")))
          case Merge2(m, r, d) =>
            Sources.mergeShardedTable(shaped(m, r, d), "doc_id",
              col("doc_id"), path, numShards = 2,
              statsCols = Seq("doc_id"))
          case Compact2 =>
            Sources.compactShardedTable(s, path, col("doc_id"),
              col("doc_id"), numShards = 4, statsCols = Seq("doc_id"),
              smallDirRows = Long.MaxValue / 4)
          case Expire2(keep) =>
            Sources.expireShardedSnapshots(s, path, keep)
        }
        val read = lookup match {
          case Some(x) =>
            Sources.buildShardedBloom(s, path, "doc_id",
              bits = 1 << 14, k = 3)
            Sources.readShardedTablePointLookup(s, path, "doc_id",
              lit(x.toLong)).filter(col("doc_id") === x)
          case None => Sources.readShardedTable(s, path)
        }
        val cols = Seq(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("n_chars")) ++
          (if (evolved) Seq(col("lang")) else Nil)
        val res = read.select(cols: _*).cut()
        Sources.dropShardedTable(s, path)
        val order = Seq(col("doc_id"), col("n_chars")) ++
          (if (evolved) Seq(col("lang").asc_nulls_first) else Nil)
        res.orderBy(order: _*)
      }
      Spec(name, query, sql)
    }
  }
}
