package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.FuzzConformance.Spec
import graft.sources.Sources

/** tfuzz5 (r12): CONNECTOR/CATALOG PARITY fuzzing — the same
  * event/killer/presence chain model as tfuzz3, but the FINAL READ is
  * drawn across the table's three read surfaces, so every op
  * interleaving is pinned to produce identical rows through:
  *
  *  - `spark.read.format("graft-sharded").where(...)` — the DSv2
  *    scan with pushed filters driving manifest pruning,
  *  - pure SQL through [[graft.sources.GraftCatalog]] (an external
  *    LOCATION table named per chain; SELECT ... WHERE box), and
  *  - the library read (`readShardedTableWhere`) as the control.
  *
  * Half the chains also CREATE the table PARTITIONED BY source, so
  * the r12 partitioned fast read and DSv2 partition handling sit
  * under the same differential microscope (a partitioned create
  * disables z-order draws — the z overwrite resets the layout by
  * design).
  *
  * Oracle model: identical to tfuzz3 (see FuzzTableV3's scaladoc) —
  * the read surface must be invisible to results, which is exactly
  * the property this family exists to pin. A NEW Random (fixed seed
  * 20260912) keeps every other family byte-stable. */
object FuzzTableV5 {

  private sealed trait Op5
  private final case class Merge5(m: Int, r: Int, d: Long) extends Op5
  private final case class Update5(m: Int, r: Int, c: Long) extends Op5
  private final case class Delete5(m: Int, r: Int) extends Op5
  private final case class DeleteWhere5(m: Int, r: Int) extends Op5
  private final case object Compact5 extends Op5
  private final case class Expire5(keep: Int) extends Op5
  private final case class ZReset5(m: Int, r: Int, d: Long) extends Op5

  private final case class Ev5(pred: String, value: String, step: Int)

  private final case class Draw(m0: Int, w: Set[Int], nShards: Int,
                                partitioned: Boolean, ops: Seq[Op5],
                                box: Option[(Long, Long, Long)],
                                readMode: Int)

  /** Same data-free pre-flight as tfuzz3: redraw until the final read
    * returns at least `minRows`, so every chain verifies something. */
  private def finalCount(d: Draw): Int = {
    val valMax = Array.fill(500)(553L)
    val present = Array.fill(500)(false)
    for (doc <- 0 until 500)
      present(doc) = d.w.contains(doc % d.m0)
    d.ops.foreach {
      case Merge5(m, r, dd) =>
        for (doc <- 0 until 500 if doc % m == r) {
          present(doc) = true; valMax(doc) = 553L + dd
        }
      case Update5(m, r, c) =>
        for (doc <- 0 until 500 if doc % m == r && present(doc))
          valMax(doc) = 399L + c
      case Delete5(m, r) =>
        for (doc <- 0 until 500 if doc % m == r) present(doc) = false
      case DeleteWhere5(m, r) =>
        for (doc <- 0 until 500 if doc % m == r) present(doc) = false
      case ZReset5(m, r, dd) =>
        for (doc <- 0 until 500) {
          present(doc) = doc % m == r
          valMax(doc) = 553L + dd
        }
      case Compact5 | Expire5(_) => ()
    }
    (0 until 500).count { doc =>
      present(doc) && d.box.forall { case (lo, hi, k) =>
        doc >= lo && doc <= hi && valMax(doc) <= k }
    }
  }

  def specs: Seq[Spec] = {
    val rnd = new scala.util.Random(20260912L)
    def draw(): Draw = {
      val m0 = 2 + rnd.nextInt(5)
      val w0 = (0 until m0).filter(_ => rnd.nextBoolean()).toSet
      val w = if (w0.isEmpty) Set(rnd.nextInt(m0)) else w0
      val nShards = 1 + rnd.nextInt(8)
      val partitioned = rnd.nextBoolean()
      val nOps = 3 + rnd.nextInt(3)
      val ops: Seq[Op5] = (0 until nOps).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 =>
            val m = 2 + rnd.nextInt(7)
            Merge5(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case 2 | 3 =>
            val m = 2 + rnd.nextInt(7)
            Update5(m, rnd.nextInt(m), 1000L * (1 + rnd.nextInt(9)))
          case 4 =>
            val m = 2 + rnd.nextInt(7); Delete5(m, rnd.nextInt(m))
          case 5 =>
            val m = 2 + rnd.nextInt(7); DeleteWhere5(m, rnd.nextInt(m))
          case 6 => Compact5
          case 7 => Expire5(1 + rnd.nextInt(3))
          case _ =>
            val m = 2 + rnd.nextInt(7)
            val z = ZReset5(m, rnd.nextInt(m),
              1000L * (1 + rnd.nextInt(9)))
            // a partitioned table keeps its layout: swap the z
            // overwrite for a merge of the same class (the draw's
            // randomness is consumed either way — byte-stable)
            if (partitioned) Merge5(z.m, z.r, z.d) else z
        }
      }
      val box: Option[(Long, Long, Long)] =
        if (rnd.nextBoolean()) None
        else Some((rnd.nextInt(200).toLong,
          (200 + rnd.nextInt(300)).toLong,
          Seq(4000L, 20000L, 1000000L)(rnd.nextInt(3))))
      // 0 = DSv2 format read, 1 = catalog SQL, 2 = library control
      val readMode = rnd.nextInt(3)
      Draw(m0, w, nShards, partitioned, ops, box, readMode)
    }
    (0 until 8).map { i =>
      val name = s"q${595 + i}_tfuzz5"
      var d = draw()
      while (finalCount(d) < 20) d = draw()
      val Draw(m0, w, nShards, partitioned, ops, box, readMode) = d
      // ---- symbolic event/killer/presence replay (as tfuzz3) ----
      val p0 = w.toSeq.sorted
        .map(r => s"doc_id % $m0 = $r").mkString("(", " OR ", ")")
      var events = List(Ev5(p0, "n_chars", step = 0))
      var killers = List.empty[(String, Int)]
      def presence(): String = events.reverse.map { e =>
        val later = killers.filter(_._2 > e.step).map(_._1).sorted
        if (later.isEmpty) s"(${e.pred})"
        else s"((${e.pred}) AND NOT ${later.mkString("(", " OR ", ")")})"
      }.mkString("(", " OR ", ")")
      ops.zipWithIndex.foreach { case (op, ix) =>
        val s = ix + 1
        op match {
          case Merge5(m, r, dd) =>
            killers ::= (s"doc_id % $m = $r", s)
            events ::= Ev5(s"doc_id % $m = $r", s"n_chars + $dd", s)
          case Update5(m, r, c) =>
            val u = s"doc_id % $m = $r"
            val p = presence()
            killers ::= (u, s)
            events ::= Ev5(s"($u) AND $p", s"(doc_id % 400) + $c", s)
          case Delete5(m, r) =>
            killers ::= (s"doc_id % $m = $r", s)
          case DeleteWhere5(m, r) =>
            killers ::= (s"doc_id % $m = $r", s)
          case ZReset5(m, r, dd) =>
            events = List(Ev5(s"doc_id % $m = $r", s"n_chars + $dd", s))
            killers = Nil
          case Compact5 | Expire5(_) => ()
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
      // ---- the table-op sequence + surface-drawn final read ----
      val query = (s: SparkSession, dir: String) => {
        import graft.Checkpoints.CheckpointOps
        val path = java.nio.file.Files
          .createTempDirectory("graft_tfuzz5_").toString
        val docs = s.read.parquet(s"$dir/documents.parquet")
        def classOf5(m: Int, r: Int) =
          docs.filter(pmod(col("doc_id"), lit(m)) === r)
        val base = docs.filter(w.toSeq.sorted
            .map(r => pmod(col("doc_id"), lit(m0)) === r)
            .reduce(_ || _))
          .select(col("doc_id"), col("source"), col("n_chars"))
        Sources.writeShardedTable(base, col("doc_id"),
          col("doc_id"), path, numShards = nShards,
          statsCols = Seq("doc_id"),
          partitionCols = if (partitioned) Seq("source") else Nil)
        ops.foreach {
          case Merge5(m, r, dd) =>
            Sources.mergeShardedTable(
              classOf5(m, r).withColumn("n_chars", col("n_chars") + dd)
                .select(col("doc_id"), col("source"), col("n_chars")),
              "doc_id", col("doc_id"), path, numShards = 2,
              statsCols = Seq("doc_id"))
          case Update5(m, r, c) =>
            Sources.updateShardedTable(s, path, "doc_id",
              pmod(col("doc_id"), lit(m)) === r,
              Seq("n_chars" ->
                (pmod(col("doc_id"), lit(400)) + c).cast("long")),
              col("doc_id"), numShards = 2,
              statsCols = Seq("doc_id"))
          case Delete5(m, r) =>
            Sources.deleteFromShardedTable(s, path, "doc_id",
              classOf5(m, r).select(col("doc_id")))
          case DeleteWhere5(m, r) =>
            Sources.deleteWhereShardedTable(s, path, "doc_id",
              pmod(col("doc_id"), lit(m)) === r)
          case ZReset5(m, r, dd) =>
            Sources.writeShardedTableZOrdered(
              classOf5(m, r).withColumn("n_chars", col("n_chars") + dd)
                .select(col("doc_id"), col("source"), col("n_chars")),
              col("doc_id"), Seq("doc_id", "n_chars"), path,
              numShards = 2)
          case Compact5 =>
            Sources.compactShardedTable(s, path, col("doc_id"),
              col("doc_id"), numShards = 4, statsCols = Seq("doc_id"),
              smallDirRows = Long.MaxValue / 4)
          case Expire5(keep) =>
            Sources.expireShardedSnapshots(s, path, keep)
        }
        val read = readMode match {
          case 0 =>
            val f0 = s.read.format("graft-sharded").load(path)
            box match {
              case Some((lo, hi, k)) =>
                f0.where(col("doc_id").between(lo, hi) &&
                  col("n_chars") <= k)
              case None => f0
            }
          case 1 =>
            // ONE process-wide fuzz warehouse: catalog confs are
            // session-global, so a per-chain temp dir would silently
            // repoint earlier registrations
            val wh = s"${System.getProperty("java.io.tmpdir")}" +
              "/graft_tfuzz5_warehouse"
            s.conf.set("spark.sql.catalog.gfuzz",
              "graft.sources.GraftCatalog")
            s.conf.set("spark.sql.catalog.gfuzz.warehouse", wh)
            s.sql("CREATE NAMESPACE IF NOT EXISTS gfuzz.t5")
            s.sql(s"DROP TABLE IF EXISTS gfuzz.t5.c$i")
            s.sql(s"""CREATE TABLE gfuzz.t5.c$i
              (doc_id BIGINT, source STRING, n_chars BIGINT)
              USING `graft-sharded` LOCATION '$path'
              TBLPROPERTIES ('idCol'='doc_id')""")
            val where = box.map { case (lo, hi, k) =>
              s" WHERE doc_id BETWEEN $lo AND $hi AND n_chars <= $k"
            }.getOrElse("")
            val r = s.sql(
              s"SELECT doc_id, source, n_chars FROM gfuzz.t5.c$i$where")
            r
          case _ => box match {
            case Some((lo, hi, k)) =>
              Sources.readShardedTableWhere(s, path,
                col("doc_id").between(lo, hi) && col("n_chars") <= k)
            case None => Sources.readShardedTable(s, path)
          }
        }
        val res = read.select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("n_chars"))
          .cut()
        if (readMode == 1) s.sql(s"DROP TABLE gfuzz.t5.c$i")
        Sources.dropShardedTable(s, path)
        res.orderBy(col("doc_id"), col("n_chars"))
      }
      Spec(name, query, sql)
    }
  }
}
