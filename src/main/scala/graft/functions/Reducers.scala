package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom reducers — the engine's analog of the reference's arbitrary
  * `^:expand` reducer functions (faconne `parse_range.cljc:88-179`,
  * SURVEY.md §2 O20-O23): a Spark `Aggregator[IN, BUF, OUT]` has exactly
  * the reference's partial/merge/finalize structure (ReduceData build →
  * deep-merge → eval-reduce-data), generalized to distributed partial
  * aggregation. Plug the resulting Column into `RAgg` and it flows
  * through the same groupBy ladders as the built-ins.
  */
object Reducers {

  /** KMV (k-minimum-hash-values) deterministic distinct sample: keeps the
    * k distinct values with the smallest portable polynomial hash.
    *
    * Why not reservoir sampling: at scale you want samples that are
    * STABLE across runs, mergeable across partitions without
    * coordination, and consistent across engines — hash-ordered bottom-k
    * is all three (and doubles as a KMV cardinality sketch). The hash is
    * the same 31-bit polynomial the DuckDB oracle computes, so the sample
    * is bit-reproducible outside Spark.
    *
    * Output is the sample joined as a comma string, hash-ascending
    * (ties broken by value) — scalar, so engine-comparison friendly. */
  final case class BottomKSample(k: Int)
      extends Aggregator[String, Seq[(Long, String)], String] {

    require(k >= 1, s"BottomKSample needs k >= 1, got $k — k = 0 would " +
      "crash on the first reduce (empty buffer treated as full)")

    override def zero: Seq[(Long, String)] = Nil

    private def insert(b: Seq[(Long, String)],
                       e: (Long, String)): Seq[(Long, String)] = {
      // hot path: a full buffer whose max is below the candidate — skip
      // without allocating (the overwhelmingly common case once warm)
      if (b.length == k && Ordering[(Long, String)].lteq(b.last, e)) b
      else if (b.contains(e)) b
      else ((e +: b).sortBy(identity)).take(k)
    }

    override def reduce(b: Seq[(Long, String)], v: String): Seq[(Long, String)] =
      if (v == null) b else insert(b, (PortableHash.h31(v), v))

    override def merge(a: Seq[(Long, String)],
                       b: Seq[(Long, String)]): Seq[(Long, String)] =
      (a ++ b).distinct.sortBy(identity).take(k)

    override def finish(r: Seq[(Long, String)]): String =
      r.map(_._2).mkString(",")

    override def bufferEncoder: Encoder[Seq[(Long, String)]] =
      ExpressionEncoder[Seq[(Long, String)]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** `bottomKSample(k)(values)` as a Column aggregate. */
  def bottomKSample(k: Int): Column => Column = {
    val f = udaf(BottomKSample(k))
    (c: Column) => f(c)
  }

  /** KMV theta-sketch buffer: the k smallest DISTINCT hash values seen.
    * Input is an already-hashed long (compute
    * [[TextFunctions.polyHash62]] as a codegen'd column upstream so the
    * per-row hash stays in whole-stage codegen; the aggregator only
    * maintains the O(k) buffer). Nulls (null keys) carry no signal.
    *
    * This is the mergeable-state form of a distinct sketch: partials
    * combine by "bottom-k of the union", so a 100 TB scan keeps k longs
    * per group per task, never a distinct shuffle of the keys. Output
    * is the sorted hash array — [[graft.ops.Sketches]] derives distinct
    * estimates and theta set operations from it. */
  final case class KmvBottomK(k: Int)
      extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {

    require(k >= 2, s"KmvBottomK needs k >= 2, got $k — the estimator " +
      "divides by the k-th minimum and a 1-sketch has no spacing signal")

    override def zero: Seq[Long] = Nil

    private def insert(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length == k && b.last <= h) b
      else if (b.contains(h)) b
      else ((h +: b).sorted).take(k)

    override def reduce(b: Seq[Long], v: java.lang.Long): Seq[Long] =
      if (v == null) b else insert(b, v.longValue)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(r: Seq[Long]): Seq[Long] = r

    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** `kmvBottomK(k)(hashes)` as a Column aggregate. */
  def kmvBottomK(k: Int): Column => Column = {
    val f = udaf(KmvBottomK(k))
    (c: Column) => f(c)
  }

  /** SpaceSaving heavy hitters — the frequent-items member of the
    * sketch tier (HLL distinct / KLL quantiles live in
    * [[graft.ops.Sketches.profile]]): approximate most-frequent items
    * with O(capacity) mergeable state per group. Summary maps item ->
    * (cnt, err): cnt over-counts the truth by at most err, and any
    * item whose true frequency exceeds n/capacity is guaranteed
    * present. An unseen item arriving at a full summary evicts the
    * current minimum (ties: smallest key) and inherits its count as
    * error — the Metwally et al. stream rule. Merge follows the
    * mergeable-summaries construction: absent keys take the other
    * side's full-summary minimum as (count, error), the union then
    * truncates back to the top `capacity` by (count desc, key asc);
    * the n/capacity error bound adds across merges.
    *
    * When a group holds fewer distinct items than `capacity`, nothing
    * ever evicts: every count is EXACT with err 0 and the output is
    * the deterministic top-k — the regime the q112 oracle checks
    * bit-for-bit. The bounded approximate regime is spec-checked
    * (`OpsSpec`) against the documented guarantees instead. */
  final case class SpaceSaving(capacity: Int)
      extends Aggregator[String, Map[String, (Long, Long)],
                         Seq[(String, Long, Long)]] {
    require(capacity >= 1, s"need capacity >= 1, got $capacity")

    override def zero: Map[String, (Long, Long)] = Map.empty

    private def minCount(b: Map[String, (Long, Long)]): Long =
      if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min

    override def reduce(b: Map[String, (Long, Long)],
                        v: String): Map[String, (Long, Long)] =
      if (v == null) b
      else b.get(v) match {
        case Some((c, e)) => b.updated(v, (c + 1L, e))
        case None if b.size < capacity => b.updated(v, (1L, 0L))
        case None =>
          val (mk, (mc, _)) = b.minBy { case (k, (c, _)) => (c, k) }
          (b - mk).updated(v, (mc + 1L, mc))
      }

    override def merge(a: Map[String, (Long, Long)],
                       b: Map[String, (Long, Long)])
        : Map[String, (Long, Long)] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val (ma, mb) = (minCount(a), minCount(b))
      val merged = (a.keySet ++ b.keySet).iterator.map { k =>
        val (ca, ea) = a.getOrElse(k, (ma, ma))
        val (cb, eb) = b.getOrElse(k, (mb, mb))
        k -> (ca + cb, ea + eb)
      }.toMap
      if (merged.size <= capacity) merged
      else merged.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity).toMap
    }

    override def finish(r: Map[String, (Long, Long)])
        : Seq[(String, Long, Long)] =
      r.toSeq.map { case (k, (c, e)) => (k, c, e) }
        .sortBy { case (k, c, _) => (-c, k) }

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** Mergeable top-k by (score desc, id asc) — the partial-aggregation
    * form of "rank per group and keep k". The window formulation
    * (row_number over partitionBy) must shuffle EVERY scored row to its
    * group's partition before ranking; this aggregator keeps a k-sized
    * buffer per group per map task, so only k rows per (task, group)
    * cross the shuffle — at ANN scale (|corpus| x |queries| scored
    * pairs, a handful of query groups) that's the difference between
    * shuffling the whole score matrix and shuffling k rows per task.
    * Total order (score desc, id asc) makes the result identical to
    * the window form; `RelationalSpec` pins the equivalence. */
  final case class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)],
                         Seq[(Double, Long)]] {
    require(k >= 1, s"need k >= 1, got $k")
    private val ord: Ordering[(Double, Long)] =
      Ordering.by(t => (-t._1, t._2))

    override def zero: Seq[(Double, Long)] = Nil

    override def reduce(b: Seq[(Double, Long)],
                        v: (Double, Long)): Seq[(Double, Long)] =
      // full buffer whose worst entry beats the candidate: skip, no alloc
      if (b.length == k && ord.lteq(b.last, v)) b
      else ((v +: b).sorted(ord)).take(k)

    override def merge(a: Seq[(Double, Long)],
                       b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (a ++ b).sorted(ord).take(k)

    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }
}
