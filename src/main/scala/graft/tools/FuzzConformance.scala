package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Transform
import graft.dsl.Domain._
import graft.dsl.Range._

/** Differential conformance fuzzing: deterministic randomly-generated
  * (domain, range, where) triples where ONE generated AST emits both the
  * Spark DSL query and the equivalent DuckDB SQL — mechanizing what
  * q01–q13 do by hand. The seed is fixed, so the driver's correctness
  * gate (Verify → DuckDB → hash compare) replays the exact same specs
  * every round; a lowering regression in projection/filter/grouping/
  * aggregation/collection/distinct/root-chunking surfaces as a hash
  * mismatch on some qN_fuzz.
  *
  * The expression vocabulary is restricted to the cross-engine-portable
  * subset established by the hand-written queries: integer/string
  * min/max/count/countDistinct, round(sum(double), 2), pmod on positive
  * ints vs SQL %, ASCII string comparisons, sorted-list/set serialization
  * to CSV strings (array columns crash the driver compare), and CAST on
  * DuckDB integer sums (HUGEINT otherwise).
  */
object FuzzConformance {

  final case class Spec(name: String,
                        query: (SparkSession, String) => DataFrame,
                        sql: String)

  private final case class Cat(table: String, ints: Seq[String],
                               doubles: Seq[String], strings: Seq[String])

  private val catalogs = Seq(
    Cat("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_quantity", "l_extendedprice"),
      Seq("l_returnflag", "l_linestatus")),
    Cat("orders",
      Seq("o_orderkey", "o_custkey"),
      Seq("o_totalprice"),
      Seq("o_orderstatus", "o_orderpriority")))

  /** One where-conjunct: Spark Column + SQL text + referenced column. */
  private def genWhere(r: scala.util.Random, c: Cat)
      : (Column, String, String) = r.nextInt(3) match {
    case 0 =>
      // threshold scaled to the column's range AT THE DRIVER'S sf0.01
      // GATE: a cutoff above the column's max (keys scale with sf;
      // l_suppkey only reaches 100 at sf0.01) empties the table and the
      // spec verifies nothing
      val i = c.ints(r.nextInt(c.ints.size))
      val k = i match {
        case "l_linenumber" => 1 + r.nextInt(4)
        case "l_suppkey"    => 5 + r.nextInt(55)
        case "l_partkey"    => 10 + r.nextInt(800)
        case "o_custkey"    => 10 + r.nextInt(600)
        case _              => 10 + r.nextInt(2000) // orderkeys: >=15k ids
      }
      (col(i) > k, s"$i > $k", i)
    case 1 =>
      // F..Y keeps most rows (flag/status/priority values start A..R) —
      // a conjunct that empties the table verifies nothing
      val s = c.strings(r.nextInt(c.strings.size))
      val b = ('F' + r.nextInt(20)).toChar
      (col(s) <= s"$b", s"$s <= '$b'", s)
    case _ =>
      val d = c.doubles(r.nextInt(c.doubles.size))
      val k = 1 + r.nextInt(40)
      (col(d) > k.toDouble, s"$d > $k.0", d)
  }

  /** One aggregate: output name + Spark Column + SQL text + referenced
    * columns. */
  private def genAgg(r: scala.util.Random, c: Cat, idx: Int)
      : (String, Column, String, Seq[String]) = r.nextInt(5) match {
    case 0 => (s"n$idx", count(lit(1)), "count(*)", Nil)
    case 1 =>
      val i = c.ints(r.nextInt(c.ints.size))
      (s"nd$idx", countDistinct(col(i)), s"count(DISTINCT $i)", Seq(i))
    case 2 =>
      val x = (c.ints ++ c.strings)(r.nextInt(c.ints.size + c.strings.size))
      (s"mn$idx", min(col(x)), s"min($x)", Seq(x))
    case 3 =>
      val x = (c.ints ++ c.strings)(r.nextInt(c.ints.size + c.strings.size))
      (s"mx$idx", max(col(x)), s"max($x)", Seq(x))
    case _ =>
      val d = c.doubles(r.nextInt(c.doubles.size))
      (s"s$idx", round(sum(col(d)), 2), s"round(sum($d), 2)", Seq(d))
  }

  /** A grouping key: output name + Spark Column + SQL expr + referenced
    * column. pmod vs % agree on the positive ids used here. */
  private def genKey(r: scala.util.Random, c: Cat, idx: Int)
      : (String, Column, String, String) =
    if (r.nextBoolean()) {
      val s = c.strings(r.nextInt(c.strings.size))
      (s, col(s), s, s)
    } else {
      val i = c.ints(r.nextInt(c.ints.size))
      val m = 2 + r.nextInt(7)
      (s"gk$idx", pmod(col(i), lit(m)).as(s"gk$idx"), s"$i % $m", i)
    }

  private def genSpec(r: scala.util.Random, n: Int, shape: Int): Spec = {
    val c = catalogs(r.nextInt(catalogs.size))
    val nWhere = r.nextInt(3)
    val wheres = Seq.fill(nWhere)(genWhere(r, c))
    val whereSql =
      if (wheres.isEmpty) "" else wheres.map(_._2).mkString(" WHERE ", " AND ", "")
    // q60..q71 for the original 12; the next 4 take q83..q86, the next
    // 4 jump to q98..q101, the next 8 to q115..q122, the next 8 to
    // q135..q142, the next 8 to q149..q156, the next 8 to q176..q183,
    // the next 8 to q211..q218, the next 8 to q234..q241, the next 12
    // to q251..q262 (q72..q82, q87..q97, q102..q114, q123..q134,
    // q143..q148, q157..q175, q184..q210, q219..q233, and
    // q242..q250 are named queries)
    val name =
      if (n < 12) s"q${60 + n}_fuzz"
      else if (n < 16) s"q${71 + n}_fuzz"
      else if (n < 20) s"q${82 + n}_fuzz"
      else if (n < 28) s"q${95 + n}_fuzz"
      else if (n < 36) s"q${107 + n}_fuzz"
      else if (n < 44) s"q${113 + n}_fuzz"
      else if (n < 52) s"q${132 + n}_fuzz"
      else if (n < 60) s"q${159 + n}_fuzz"
      else if (n < 68) s"q${174 + n}_fuzz"
      else if (n < 80) s"q${183 + n}_fuzz" // q251..q262
      else if (n < 120) s"q${223 + n}_fuzz" // q303..q342
      else if (n < 150) s"q${250 + n}_fuzz" // q370..q399 (q343-q369 named)
      else if (n < 170) s"q${279 + n}_fuzz" // q429-q448
      else if (n < 190) s"q${284 + n}_fuzz" // q454-q473
      else s"q${302 + n}_fuzz" // q492+: after the named q474-q491 block

    shape match {
      case 0 => // projection (+ one computed column), total order
        val nCols = 2 + r.nextInt(2)
        val cols = r.shuffle(c.ints ++ c.strings).take(nCols)
        val i = c.ints(r.nextInt(c.ints.size))
        val m = 2 + r.nextInt(7)
        val outs = cols.map(x => x -> col(x)) :+ ("m" -> pmod(col(i), lit(m)))
        val bound = (cols ++ wheres.map(_._3) :+ i).distinct
        val sql = s"SELECT ${cols.mkString(", ")}, $i % $m AS m " +
          s"FROM ${c.table}$whereSql ORDER BY ${(1 to outs.size).mkString(", ")}"
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/${c.table}.parquet"),
            rows(bound: _*),
            RRows(outs), where = wheres.map(_._1))
            .orderBy(outs.map(o => col(o._1)): _*), sql)

      case 1 => // one- or two-level grouping with an aggregate struct
        val nKeys = 1 + r.nextInt(2)
        val keys = {
          val k0 = genKey(r, c, 0)
          if (nKeys == 1) Seq(k0)
          else {
            // two identically-named keys (same string column twice) would
            // collide in both the output schema and the SQL
            var k1 = genKey(r, c, 1)
            while (k1._1 == k0._1) k1 = genKey(r, c, 1)
            Seq(k0, k1)
          }
        }
        val nAggs = 1 + r.nextInt(3)
        val aggs = (0 until nAggs).map(i => genAgg(r, c, i))
        val bound =
          (keys.map(_._4) ++ aggs.flatMap(_._4) ++ wheres.map(_._3)).distinct
        val range = keys.foldRight(
          RStruct(aggs.map(a => a._1 -> (RAgg(a._2): graft.dsl.Range)))
            : graft.dsl.Range) { case (k, inner) => RMap(k._2, inner) }
        val aggSql = aggs.map(a => s"${a._3} AS ${a._1}").mkString(", ")
        val keySql = keys.map(k => s"${k._3} AS ${k._1}").mkString(", ")
        val sql = s"SELECT $keySql, $aggSql FROM ${c.table}$whereSql " +
          s"GROUP BY ${(1 to nKeys).mkString(", ")} " +
          s"ORDER BY ${(1 to nKeys).mkString(", ")}"
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/${c.table}.parquet"),
            rows(bound: _*), range, where = wheres.map(_._1))
            .orderBy(keys.map(k => col(k._1)): _*), sql)

      case 2 => // grouped sorted list, serialized (q03 pattern)
        val (kn, kc, ks, kref) = genKey(r, c, 0)
        val v = c.ints(r.nextInt(c.ints.size))
        val bound = (Seq(kref, v) ++ wheres.map(_._3)).distinct
        val sql = s"SELECT $ks AS $kn, " +
          s"array_to_string(list_sort(list($v)), ',') AS value " +
          s"FROM ${c.table}$whereSql GROUP BY 1 ORDER BY 1"
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/${c.table}.parquet"),
            rows(bound: _*),
            RMap(kc, RList(col(v), sorted = true)), where = wheres.map(_._1))
            .withColumn("value",
              array_join(transform(col("value"), _.cast("string")), ","))
            .orderBy(kn), sql)

      case 3 => // grouped sorted set, serialized (q04 pattern)
        val (kn, kc, ks, kref) = genKey(r, c, 0)
        val v = (c.ints ++ c.strings)(r.nextInt(c.ints.size + c.strings.size))
        val bound = (Seq(kref, v) ++ wheres.map(_._3)).distinct
        val sql = s"SELECT $ks AS $kn, " +
          s"array_to_string(list_sort(list(DISTINCT $v)), ',') AS value " +
          s"FROM ${c.table}$whereSql GROUP BY 1 ORDER BY 1"
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/${c.table}.parquet"),
            rows(bound: _*),
            RMap(kc, RSet(col(v))), where = wheres.map(_._1))
            .withColumn("value",
              array_join(transform(col("value"), _.cast("string")), ","))
            .orderBy(kn), sql)

      case 5 => // distinct-rows projection (q13 pattern)
        val nCols = 2 + r.nextInt(2)
        val cols = r.shuffle(c.ints ++ c.strings).take(nCols)
        val bound = (cols ++ wheres.map(_._3)).distinct
        val sql = s"SELECT DISTINCT ${cols.mkString(", ")} " +
          s"FROM ${c.table}$whereSql ORDER BY ${(1 to nCols).mkString(", ")}"
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/${c.table}.parquet"),
            rows(bound: _*),
            RRowsDistinct(cols.map(x => x -> col(x))),
            where = wheres.map(_._1))
            .orderBy(cols.map(col): _*), sql)

      case 6 => // root-level n-at-a-time chunking under a declared order
        // (q50 pattern — exercises the rootOrder row_number/lead
        // lowering at random chunk widths). orders only: o_orderkey is
        // the unique total order, and slot-1's key makes the output
        // order deterministic. No wheres: fuzz conjuncts reference raw
        // input columns, which chunking rebinds to slot names.
        val nCh = 2 + r.nextInt(2)
        val ordersCols = Seq("o_totalprice", "o_orderstatus", "o_orderpriority",
                             "o_custkey")
        val v = ordersCols(r.nextInt(ordersCols.size))
        val slotPat = (i: Int) => Entries(Seq(
          (KField("o_orderkey"): DKey) -> Leaf(s"k$i"),
          (KField(v): DKey) -> Leaf(s"v$i")))
        val outs = (1 to nCh).flatMap(i =>
          Seq(s"k$i" -> col(s"k$i"), s"v$i" -> col(s"v$i")))
        val slotSql = (1 to nCh).flatMap(i => Seq(
          s"max(CASE WHEN rn % $nCh = ${i % nCh} THEN o_orderkey END) AS k$i",
          s"max(CASE WHEN rn % $nCh = ${i % nCh} THEN $v END) AS v$i"))
          .mkString(",\n                ")
        val sql =
          s"""WITH x AS (SELECT o_orderkey, $v,
                row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
              SELECT $slotSql
              FROM x GROUP BY (rn - 1) // $nCh ORDER BY 1"""
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/orders.parquet"),
            Vec((1 to nCh).map(slotPat)),
            RRows(outs), rootOrder = Seq("o_orderkey"))
            .orderBy("k1"), sql)

      case _ => // multi-granularity struct: aggregate + nested map at one
        // level (the q12 shape — exercises the adaptive one-scan/join
        // lowering). Inner aggregates stick to integers: double→VARCHAR
        // formatting diverges between engines, integer text does not.
        val (k1n, k1c, k1s, k1ref) = genKey(r, c, 0)
        var k2 = genKey(r, c, 1)
        while (k2._1 == k1n) k2 = genKey(r, c, 1)
        val (k2n, k2c, k2s, k2ref) = k2
        val (an, ac, as_, arefs) = genAgg(r, c, 0)
        val (_, ic, is_, irefs) = {
          var a = genAgg(r, c, 1)
          while (a._3.contains("sum")) a = genAgg(r, c, 1) // ints only
          a
        }
        val bound = (Seq(k1ref, k2ref) ++ arefs ++ irefs ++ wheres.map(_._3))
          .distinct
        val sql =
          s"""WITH f AS (SELECT $k1s AS $k1n, $as_ AS $an
                         FROM ${c.table}$whereSql GROUP BY 1),
                s AS (SELECT $k1s AS $k1n, $k2s AS k2n, $is_ AS v
                      FROM ${c.table}$whereSql GROUP BY 1, 2),
                m AS (SELECT $k1n,
                        string_agg(k2n || '=' || CAST(v AS VARCHAR),
                                   ',' ORDER BY k2n) AS by_k
                      FROM s GROUP BY 1)
             SELECT f.$k1n, f.$an, m.by_k
             FROM f JOIN m USING ($k1n) ORDER BY 1"""
        Spec(name, (s, dir) =>
          Transform.run(s.read.parquet(s"$dir/${c.table}.parquet"),
            rows(bound: _*),
            RMap(k1c, RStruct(Seq(
              an -> RAgg(ac),
              "by_k" -> RMap(k2c, RAgg(ic))))),
            where = wheres.map(_._1))
            .withColumn("by_k",
              array_join(transform(array_sort(map_entries(col("by_k"))),
                e => concat_ws("=", e.getField("key").cast("string"),
                  e.getField("value").cast("string"))), ","))
            .orderBy(k1n), sql)
    }
  }

  /** The fixed fuzz suite: the first 7 specs cycle through every grammar
    * shape (so each lowering path is guaranteed a conformance check);
    * the rest draw shapes randomly. Same seed → same specs every run
    * (specs 13+ consume randomness strictly after the first 12, so
    * widening the suite never changes the existing queries). */
  def specs: Seq[Spec] = {
    val r = new scala.util.Random(20260812L)
    val nShapes = 7
    (0 until 200).map(i =>
      genSpec(r, i, if (i < nShapes) i else r.nextInt(nShapes)))
  }
}
