package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.FuzzConformance.Spec
import graft.sources.Sources

/** tfuzz3: differential fuzzing over the table ops the v1/v2 draws
  * omit — Z-ORDER writes (initial layout AND mid-chain overwrite),
  * predicate UPDATE, and predicate DELETE-WHERE — interleaved with
  * merge/delete/compact/expire, plus a predicate-driven FINAL READ
  * whose AST-extracted pruning runs against MIXED stats columns
  * (z-order dirs track (doc_id, n_chars); merge/update dirs track
  * doc_id only, so their manifest rows carry NULL n_chars bounds —
  * the read must keep those dirs, the r10 advisor's null-safety
  * hole).
  *
  * Oracle model: the v2 EVENT/KILLER fold, extended with PRESENCE.
  * A predicate UPDATE re-inserts only the rows PRESENT at its step,
  * so its insert event's predicate is `u AND P_s`, where P_s — the
  * presence of a doc at step s — is closed-form: OR over earlier
  * events e of (e.pred AND no killer between e.step and s). Its
  * killer is just `u` (killing an absent row is a no-op, so the
  * presence conjunct is unnecessary on the kill side). The update's
  * SET expression depends only on doc_id, never on the current
  * value, which keeps the replay provenance-free. A mid-chain
  * z-order write is table OVERWRITE (fresh manifest) — the fold
  * resets to a single event.
  *
  * Uniqueness invariant (updateShardedTable requires unique matched
  * keys): every event-inserting op (merge, update, z-reset) also
  * kills all older copies of the docs it inserts, and the initial
  * write is unique per doc — so doc_id stays unique through any
  * chain this family can draw.
  *
  * A NEW Random (fixed seed 20260818) keeps every other fuzz family
  * byte-stable. */
object FuzzTableV3 {

  private sealed trait Op3
  private final case class Merge3(m: Int, r: Int, d: Long) extends Op3
  private final case class Update3(m: Int, r: Int, c: Long) extends Op3
  private final case class Delete3(m: Int, r: Int) extends Op3
  private final case class DeleteWhere3(m: Int, r: Int) extends Op3
  private final case object Compact3 extends Op3
  private final case class Expire3(keep: Int) extends Op3
  private final case class ZReset3(m: Int, r: Int, d: Long) extends Op3

  private final case class Ev3(pred: String, value: String, step: Int)

  /** One candidate chain draw. */
  private final case class Draw(m0: Int, w: Set[Int], nShards: Int,
                                zInitial: Boolean, ops: Seq[Op3],
                                box: Option[(Long, Long, Long)])

  /** Numeric pre-flight over doc_id 0..499 (the documents table's id
    * space at every test sf): fold the chain per doc, tracking
    * presence and a conservative value UPPER bound (base n_chars <=
    * 553; merge adds d; update sets (doc_id%400)+c <= 399+c) — a
    * draw whose final read would return fewer than `minRows` rows is
    * redrawn, so every chain actually verifies something. Data-free:
    * pure residue arithmetic, no Spark. */
  private def finalCount(d: Draw): Int = {
    val valMax = Array.fill(500)(553L)
    val present = Array.fill(500)(false)
    for (doc <- 0 until 500)
      present(doc) = d.w.contains(doc % d.m0)
    d.ops.foreach {
      case Merge3(m, r, dd) =>
        for (doc <- 0 until 500 if doc % m == r) {
          present(doc) = true; valMax(doc) = 553L + dd
        }
      case Update3(m, r, c) =>
        for (doc <- 0 until 500 if doc % m == r && present(doc))
          valMax(doc) = 399L + c
      case Delete3(m, r) =>
        for (doc <- 0 until 500 if doc % m == r) present(doc) = false
      case DeleteWhere3(m, r) =>
        for (doc <- 0 until 500 if doc % m == r) present(doc) = false
      case ZReset3(m, r, dd) =>
        for (doc <- 0 until 500) {
          present(doc) = doc % m == r
          valMax(doc) = 553L + dd
        }
      case Compact3 | Expire3(_) => ()
    }
    (0 until 500).count { doc =>
      present(doc) && d.box.forall { case (lo, hi, k) =>
        doc >= lo && doc <= hi && valMax(doc) <= k }
    }
  }

  def specs: Seq[Spec] = {
    val rnd = new scala.util.Random(20260818L)
    def draw(): Draw = {
      val m0 = 2 + rnd.nextInt(5)
      val w0 = (0 until m0).filter(_ => rnd.nextBoolean()).toSet
      val w = if (w0.isEmpty) Set(rnd.nextInt(m0)) else w0
      val nShards = 1 + rnd.nextInt(8)
      val zInitial = rnd.nextBoolean()
      val nOps = 3 + rnd.nextInt(3) // 3..5 ops
      val ops: Seq[Op3] = (0 until nOps).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 =>
            val m = 2 + rnd.nextInt(7)
            Merge3(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case 2 | 3 =>
            val m = 2 + rnd.nextInt(7)
            Update3(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case 4 =>
            val m = 2 + rnd.nextInt(7); Delete3(m, rnd.nextInt(m))
          case 5 =>
            val m = 2 + rnd.nextInt(7); DeleteWhere3(m, rnd.nextInt(m))
          case 6 => Compact3
          case 7 => Expire3(1 + rnd.nextInt(3))
          case _ =>
            val m = 2 + rnd.nextInt(7)
            ZReset3(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
        }
      }
      // final read: half plain, half a predicate-driven box whose
      // n_chars bound must survive null-stat manifest rows
      val box: Option[(Long, Long, Long)] =
        if (rnd.nextBoolean()) None
        else Some((rnd.nextInt(200).toLong,
          (200 + rnd.nextInt(300)).toLong,
          Seq(4000L, 20000L, 1000000L)(rnd.nextInt(3))))
      Draw(m0, w, nShards, zInitial, ops, box)
    }
    (0 until 8).map { i =>
      val name = s"q${573 + i}_tfuzz3"
      var d = draw()
      while (finalCount(d) < 20) d = draw()
      val Draw(m0, w, nShards, zInitial, ops, box) = d
      // ---- symbolic event/killer/presence replay ----
      val p0 = w.toSeq.sorted
        .map(r => s"doc_id % $m0 = $r").mkString("(", " OR ", ")")
      var events = List(Ev3(p0, "n_chars", step = 0))
      var killers = List.empty[(String, Int)]
      def presence(): String = events.reverse.map { e =>
        val later = killers.filter(_._2 > e.step).map(_._1).sorted
        if (later.isEmpty) s"(${e.pred})"
        else s"((${e.pred}) AND NOT ${later.mkString("(", " OR ", ")")})"
      }.mkString("(", " OR ", ")")
      ops.zipWithIndex.foreach { case (op, ix) =>
        val s = ix + 1
        op match {
          case Merge3(m, r, d) =>
            killers ::= (s"doc_id % $m = $r", s)
            events ::= Ev3(s"doc_id % $m = $r", s"n_chars + $d", s)
          case Update3(m, r, c) =>
            val u = s"doc_id % $m = $r"
            val p = presence() // BEFORE this op's own killer/event
            killers ::= (u, s)
            events ::= Ev3(s"($u) AND $p", s"(doc_id % 400) + $c", s)
          case Delete3(m, r) =>
            killers ::= (s"doc_id % $m = $r", s)
          case DeleteWhere3(m, r) =>
            killers ::= (s"doc_id % $m = $r", s)
          case ZReset3(m, r, d) =>
            events = List(Ev3(s"doc_id % $m = $r", s"n_chars + $d", s))
            killers = Nil
          case Compact3 | Expire3(_) => ()
        }
      }
      val terms = events.reverse.map { e =>
        val later = killers.filter(_._2 > e.step).map(_._1).sorted
        val kill =
          if (later.isEmpty) ""
          else later.mkString(" AND NOT (", " OR ", ")")
        s"""SELECT doc_id, source, CAST(${e.value} AS BIGINT) AS n_chars
            FROM documents WHERE (${e.pred})$kill"""
      }
      val outer = box.map { case (lo, hi, k) =>
        s" WHERE doc_id BETWEEN $lo AND $hi AND n_chars <= $k"
      }.getOrElse("")
      val sql = terms.mkString(
        "SELECT * FROM (\n", "\nUNION ALL\n",
        s"\n)$outer ORDER BY doc_id, n_chars")
      // ---- the actual table-op sequence ----
      val query = (s: SparkSession, dir: String) => {
        import graft.Checkpoints.CheckpointOps
        val path = java.nio.file.Files
          .createTempDirectory("graft_tfuzz3_").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        def classOf3(m: Int, r: Int) =
          docs.filter(pmod(col("doc_id"), lit(m)) === r)
        val base = docs.filter(w.toSeq.sorted
            .map(r => pmod(col("doc_id"), lit(m0)) === r)
            .reduce(_ || _))
          .select(col("doc_id"), col("source"), col("n_chars"))
        if (zInitial)
          Sources.writeShardedTableZOrdered(base, col("doc_id"),
            Seq("doc_id", "n_chars"), path, numShards = nShards)
        else
          Sources.writeShardedTable(base, col("doc_id"),
            col("doc_id"), path, numShards = nShards,
            statsCols = Seq("doc_id"))
        ops.foreach {
          case Merge3(m, r, d) =>
            Sources.mergeShardedTable(
              classOf3(m, r).withColumn("n_chars", col("n_chars") + d)
                .select(col("doc_id"), col("source"), col("n_chars")),
              "doc_id", col("doc_id"), path, numShards = 2,
              statsCols = Seq("doc_id"))
          case Update3(m, r, c) =>
            Sources.updateShardedTable(s, path, "doc_id",
              pmod(col("doc_id"), lit(m)) === r,
              Seq("n_chars" ->
                (pmod(col("doc_id"), lit(400)) + c).cast("long")),
              col("doc_id"), numShards = 2,
              statsCols = Seq("doc_id"))
          case Delete3(m, r) =>
            Sources.deleteFromShardedTable(s, path, "doc_id",
              classOf3(m, r).select(col("doc_id")))
          case DeleteWhere3(m, r) =>
            Sources.deleteWhereShardedTable(s, path, "doc_id",
              pmod(col("doc_id"), lit(m)) === r)
          case ZReset3(m, r, d) =>
            Sources.writeShardedTableZOrdered(
              classOf3(m, r).withColumn("n_chars", col("n_chars") + d)
                .select(col("doc_id"), col("source"), col("n_chars")),
              col("doc_id"), Seq("doc_id", "n_chars"), path,
              numShards = 2)
          case Compact3 =>
            Sources.compactShardedTable(s, path, col("doc_id"),
              col("doc_id"), numShards = 4, statsCols = Seq("doc_id"),
              smallDirRows = Long.MaxValue / 4)
          case Expire3(keep) =>
            Sources.expireShardedSnapshots(s, path, keep)
        }
        val read = box match {
          case Some((lo, hi, k)) =>
            Sources.readShardedTableWhere(s, path,
              col("doc_id").between(lo, hi) && col("n_chars") <= k)
          case None => Sources.readShardedTable(s, path)
        }
        val res = read.select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("n_chars"))
          .cut()
        Sources.dropShardedTable(s, path)
        res.orderBy(col("doc_id"), col("n_chars"))
      }
      Spec(name, query, sql)
    }
  }
}
