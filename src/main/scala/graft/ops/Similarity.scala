package graft.ops

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.Hyperplanes

/** Similarity search over an embedding column (ArrayType(Float)).
  *
  * Scale design: the query set is assumed small relative to the corpus
  * (broadcast), the corpus side streams — brute force is a single
  * broadcast-nested-loop pass, embarrassingly parallel, no shuffle of the
  * corpus. The LSH variant buckets both sides on sign-pattern keys so
  * each corpus row is scored only against queries in its (multi-probed)
  * bucket — the 100 TB path when the query set itself is large.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine. `queries` is broadcast;
    * ranking is deterministic (score desc, id asc) on round(6) scores. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: Column, vec: Column,
                     qid: Column, qvec: Column, k: Int): DataFrame = {
    // norms once per row, not per (query, corpus) pair — bit-identical
    // null embeddings are not candidates or queries (same silent-
    // exclusion contract as Dedup.embeddingPairs / cosinePairsLsh);
    // without the filter a null score would rank as 0.0 in topKScored
    val c = Dedup.fanOut(corpus).select(id.as("nbr"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("nrm", l2norm(col("v")))
    val q = queries.select(qid.as("qid"), toDouble(qvec).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qnrm", l2norm(col("qv")))
    val d = col("qnrm") * col("nrm")
    val cos = when(d === 0.0, 0.0).otherwise(dot(col("qv"), col("v")) / d)
    val scored = c.join(broadcast(q), col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"), round(cos, 6).as("score"))
    // mergeable top-k: only k rows per (map task, query) reach the
    // shuffle — the window form would shuffle the whole score matrix
    Relational.topKScored(scored, col("qid"), col("score"), col("nbr"),
      k, idName = "nbr")
  }

  /** Int8-quantized top-k with exact rescore — the memory/IO scale path:
    * per-vector max-abs scaling to [-127, 127] integers (4x fewer bytes
    * than float32, 8x fewer than float64, which is what actually bounds
    * ANN throughput at corpus scale: scan bytes and broadcast size).
    * The quantized pass ranks a deterministic shortlist of
    * `shortlistFactor * k` per query; the shortlist is then rescored
    * with EXACT double cosine and re-ranked, so quantization error can
    * only cost recall (a true neighbor outside the shortlist), never
    * precision — and the entire path (floor(x * 127 / maxabs + 0.5)
    * quantization, integer-exact dots in double, round(6) ranking,
    * id tie-breaks) is bit-reproducible, which is how the oracle
    * replays it end-to-end. Quantized values are small integers whose
    * dots are <= ~64 * 127^2 — exactly representable in double, so
    * "integer arithmetic" and double arithmetic coincide.
    *
    * Here the quantized column is derived inline; the production shape
    * stores v8 as a byte-array column at ingest and reads ONLY it for
    * the shortlist pass (column pruning skips the float vectors until
    * rescore). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    id: Column, vec: Column, qid: Column, qvec: Column,
                    k: Int, shortlistFactor: Int = 4): DataFrame = {
    def quantize(v: Column): Column = {
      val ma = array_max(transform(v, x => abs(x)))
      when(ma === 0.0, transform(v, _ => lit(0.0)))
        .otherwise(transform(v, x =>
          floor(x * lit(127.0) / ma + 0.5).cast("double")))
    }
    val c = Dedup.fanOut(corpus).select(id.as("nbr"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull) // null embeddings excluded (see bruteForceTopK)
      .withColumn("v8", quantize(col("v")))
      .withColumn("n8", l2norm(col("v8")))
    val q = queries.select(qid.as("qid"), toDouble(qvec).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("q8", quantize(col("qv")))
      .withColumn("qn8", l2norm(col("q8")))
    val d8 = col("qn8") * col("n8")
    val cos8 = when(d8 === 0.0, 0.0).otherwise(dot(col("q8"), col("v8")) / d8)
    // shortlist pass carries ONLY (qid, nbr, s8) — in the production
    // shape the scan reads just the quantized bytes here; full float
    // vectors are fetched below for the shortlist rows alone
    val cand = c.join(broadcast(q), col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"), round(cos8, 6).as("s8"))
    val short = Relational.topKScored(cand, col("qid"), col("s8"),
        col("nbr"), k * shortlistFactor, idName = "nbr",
        scoreName = "s8")
      .select("qid", "nbr")
    // rescore fetch: the shortlist (|queries| * shortlist rows) is tiny
    // -> broadcast both joins; the corpus streams, never shuffles
    val rescored = c.select(col("nbr"), col("v"))
      .join(broadcast(short), "nbr")
      .join(broadcast(q.select(col("qid"), col("qv"))), "qid")
    val dn = l2norm(col("qv")) * l2norm(col("v"))
    val cos = when(dn === 0.0, 0.0).otherwise(dot(col("qv"), col("v")) / dn)
    Relational.topKScored(
      rescored.select(col("qid"), col("nbr"), round(cos, 6).as("score")),
      col("qid"), col("score"), col("nbr"), k, idName = "nbr")
  }

  /** Indices of the `n` nearest of `centroids` to `v` by cosine
    * (array_sort on (-score, idx) structs = score-descending,
    * index-ascending on ties). Scores are rounded to 6 so a SQL
    * oracle's ranking (which also rounds) agrees even when float
    * summation order differs. Shared by [[ivfTopK]] (list routing)
    * and [[semDedupPairs]] (cluster routing) — the two MUST rank
    * identically or their oracles diverge. */
  private def nearestCentroids(centroids: Seq[Seq[Double]], v: Column,
                               n: Int): Column =
    if (n == 1)
      // the hot single-assignment path (IVF routing, Lloyd, SemDeDup)
      // runs the codegen'd argmin kernel — bit-identical to the sort
      // form below ([[graft.functions.NearestCentroid]])
      array(graft.functions.NearestCentroid(v, centroids))
    else {
      val cents = typedlit(centroids)
      val ranked = transform(sequence(lit(0), lit(centroids.size - 1)),
        i =>
          struct((-round(cosine(v, element_at(cents, i + 1)), 6)).as("neg"),
                 i.as("idx")))
      slice(transform(array_sort(ranked), s => s.getField("idx")), 1, n)
    }

  /** IVF (inverted-file) approximate top-k: the corpus is bucketed into
    * `nLists` Voronoi cells around centroids; each query probes only its
    * `nProbe` nearest cells, so the scored fraction is ~nProbe/nLists of
    * the corpus — the scale path when brute force stops fitting the SLA.
    *
    * Centroid bootstrap here is "first nLists corpus vectors" (a tiny,
    * deterministic driver collect — production would Lloyd-iterate; the
    * assignment/probe machinery is identical and that's the part that
    * matters at scale: one narrow assignment pass over the corpus, a
    * broadcast of the probed query set, no corpus shuffle). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              id: Column, vec: Column, qid: Column, qvec: Column,
              k: Int, nLists: Int = 16, nProbe: Int = 4,
              trained: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val c = Dedup.fanOut(corpus).select(id.as("nbr"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull) // null embeddings excluded (see bruteForceTopK)
    val centroids: Seq[Seq[Double]] = trained.getOrElse(
      c.orderBy(col("nbr")).limit(nLists)
        .collect().map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq)
    // degenerate corpora (fewer rows than nLists, or empty) yield fewer
    // lists; clamp rather than abort — empty corpus → empty result
    val nL = centroids.size
    if (nL == 0)
      return queries.select(qid.as("qid")).limit(0)
        .crossJoin(c.select(col("nbr")).limit(0))
        .withColumn("score", lit(0.0)).withColumn("rank", lit(0))

    def nearest(v: Column, n: Int): Column = nearestCentroids(centroids, v, n)

    val assigned = c.withColumn("list", element_at(nearest(col("v"), 1), 1))
    val probes = queries.select(qid.as("qid"), toDouble(qvec).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("list", explode(nearest(col("qv"), nProbe)))
    val scored = assigned
      .join(broadcast(probes), Seq("list"))
      .filter(col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"),
              round(cosine(col("qv"), col("v")), 6).as("score"))
    Relational.topKScored(scored, col("qid"), col("score"), col("nbr"),
      k, idName = "nbr")
  }

  /** IVF index packed for stream-static ANN: every corpus vector is
    * assigned to its nearest centroid, and each list becomes ONE row
    * `(list, postings: array<struct<nbr, v>>)`. The packing shuffle
    * happens once, at index-build time — the artifact is a static
    * frame a stream (or repeated batch probes) equi-joins per
    * micro-batch with no further corpus work. Posting-array size is
    * corpus/nLists rows; at 100 TB you raise `nLists` (the knob IVF
    * already has) so a list stays executor-memory-sized, same as any
    * IVF deployment. Returns (centroids, packed). */
  def ivfPack(corpus: DataFrame, id: Column, vec: Column,
              nLists: Int = 16,
              trained: Option[Seq[Seq[Double]]] = None)
      : (Seq[Seq[Double]], DataFrame) = {
    val c = Dedup.fanOut(corpus).select(id.as("nbr"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull) // null embeddings excluded (see bruteForceTopK)
    val centroids: Seq[Seq[Double]] = trained.getOrElse(
      c.orderBy(col("nbr")).limit(nLists)
        .collect().map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq)
    val packed =
      if (centroids.isEmpty)
        c.withColumn("list", lit(1))
          .groupBy("list")
          .agg(collect_list(struct(col("nbr"), col("v"))).as("postings"))
          .limit(0)
      else c
        .withColumn("list",
          element_at(nearestCentroids(centroids, col("v"), 1), 1))
        .groupBy("list")
        .agg(collect_list(struct(col("nbr"), col("v"))).as("postings"))
    (centroids, packed)
  }

  /** Probe side of [[ivfPack]]: route each query to its nearest list
    * (nProbe = 1), equi-join the packed index, and rank that list's
    * postings INSIDE the row (transform → array_sort → slice) — no
    * aggregation, so the whole plan is stateless and runs unchanged on
    * a Structured Streaming query frame in append mode (the
    * stream-static inner equi-join keeps no state store). Scoring and
    * tie-breaks are bit-identical to [[ivfTopK]] at nProbe = 1
    * (round(cos, 6) desc, id asc; self-matches excluded), which is
    * what the spec pins. Returns (qid, nbr, score, rank). */
  def ivfTopKPacked(queries: DataFrame, centroids: Seq[Seq[Double]],
                    packed: DataFrame, qid: Column, qvec: Column,
                    k: Int): DataFrame = {
    require(k >= 1, s"ivfTopKPacked: k must be >= 1, got $k")
    require(centroids.nonEmpty, "ivfTopKPacked: empty centroid set")
    val q = queries.select(qid.as("qid"), toDouble(qvec).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("list",
        element_at(nearestCentroids(centroids, col("qv"), 1), 1))
    q.join(packed, Seq("list"))
      .withColumn("top", slice(array_sort(transform(
          filter(col("postings"), p => p.getField("nbr") =!= col("qid")),
          p => struct(
            (-round(cosine(col("qv"), p.getField("v")), 6)).as("neg"),
            p.getField("nbr").as("nbr")))), 1, k))
      .select(col("qid"), posexplode(col("top")).as(Seq("__pos", "__e")))
      .select(col("qid"), col("__e.nbr").as("nbr"),
              (-col("__e.neg")).as("score"),
              (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Deterministic Lloyd k-means over an embedding column — the centroid
    * trainer for [[ivfTopK]]'s production path. Init = first k vectors by
    * id (deterministic); each iteration is one distributed pass: assign
    * every vector to its nearest centroid (broadcast literal centroids,
    * narrow map) then groupBy-mean — the textbook scalable shape
    * (k*dim values on the driver, never the corpus). Cosine assignment
    * with mean centroids (spherical k-means without re-normalization —
    * adequate for probe routing).
    *
    * Arithmetic is FIXED-POINT so the whole loop is bit-reproducible in
    * a SQL oracle (q51): vectors are quantized to integer micro-units
    * (floor(x*1e6 + 0.5)), per-cluster means are integer sums (exact,
    * order-independent — double summation would vary with partition
    * order) floor-divided by the count, and centroids re-enter the
    * cosine as microUnits/1e6 (one IEEE division — identical in any
    * engine). Assignment ranks on round(cos, 6) desc, index asc. */
  def kmeansCentroids(corpus: DataFrame, id: Column, vec: Column,
                      k: Int, iters: Int): Seq[Seq[Double]] = {
    val c = Dedup.fanOut(corpus).select(id.as("id"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull) // null embeddings carry no signal
      .withColumn("q", transform(col("v"),
        x => floor(x * 1e6 + lit(0.5)).cast("long")))
    var centsQ: Seq[Seq[Long]] = c.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Long](2).toIndexedSeq).toIndexedSeq
    // corpora with < k rows yield that many centroids; empty → none
    // (iterating would dereference head)
    if (centsQ.isEmpty) return Nil
    val dim = centsQ.head.size
    for (_ <- 0 until iters) {
      // codegen'd argmin kernel, bit-identical to the ranked-sort HOF
      // form ([[graft.functions.NearestCentroid]]) — the Lloyd
      // assignment is rows x k x dim, the trainer's whole cost
      val nearestIdx = graft.functions.NearestCentroid(
        col("v"), centsQ.map(_.map(_.toDouble / 1e6)))
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(d => sum(element_at(col("q"), d + 1)).as(s"d$d"))
      val updated = c.withColumn("list", nearestIdx)
        .groupBy("list")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val n = r.getLong(1)
          r.getAs[Number](0).intValue ->
            // floorDiv == floor(sum/n) in double for |sum| <= ~2^31,
            // n <= corpus size: quotient is ≥ 1/n from any other integer
            // unless exact, dwarfing double rounding error
            (0 until dim).map(d => Math.floorDiv(r.getLong(d + 2), n))
        }
        .toMap
      // empty clusters keep their previous centroid
      centsQ = centsQ.indices.map(i => updated.getOrElse(i, centsQ(i)))
    }
    centsQ.map(_.map(_.toDouble / 1e6))
  }

  /** Top principal component of an embedding column — deterministic
    * FIXED-POINT power iteration on the exact GRAM MATRIX (the trainer
    * for common-direction removal, [[removeTopComponent]]: the
    * SIF/"all-but-the-top" post-processing that measurably improves
    * embedding similarity by deleting the dominant frequency direction
    * every encoder produces).
    *
    * ONE corpus pass computes the exact raw moments — n, s_j = Σ q_j,
    * and the packed upper triangle S_jk = Σ q_j·q_k — over micro-
    * quantized vectors (`floor(x·1e6 + 0.5)`, explicit half-up). The
    * centered Gram follows by algebra on the driver (mean m_j =
    * floorDiv(s_j, n); G = S − m sᵀ − s mᵀ + n·m mᵀ, all exact
    * BigInt), and the whole power-iteration/deflation loop then runs
    * DRIVER-SIDE on d×d integers: v₀ = 1e6·e_{argmax diag G}, each
    * iteration w = G·v orthogonalized against prior components
    * (w ← w − (⟨w,uᵢ⟩·uᵢ) quot ⟨uᵢ,uᵢ⟩, truncating integer
    * division = DuckDB `//` = BigInt `/`), then renormalized to
    * max-abs 1e6. Exact integer arithmetic is associative, so the
    * oracle replays the identical numbers from a d²-row Gram CTE
    * instead of corpus-sized per-iteration scans.
    *
    * Scale (r7 verdict task #2): the previous trainer ran 2·m·iters
    * corpus aggregate jobs plus m centering/deflation materializations
    * — the full-suite bench-variance class AND a 100 TB multi-scan.
    * This one runs exactly ONE corpus job (`GramScanSpec` pins the
    * count with a listener). Per-partition state is d(d+1)/2 + d
    * longs, folded into BigInt at a data-adaptive interval (every
    * 2¹⁶ rows for unit-norm embeddings, proportionally sooner for
    * large-magnitude data; a single element beyond |x| ≈ 3000 fails
    * loudly via multiplyExact). The merge is TWO-LEVEL past 8
    * partitions: partials exchange (triangle-sized records, never
    * rows) to 8 executor-side folders, so the driver holds ≤ 8
    * triangles no matter the executor count — d up to 4096 (the real
    * embedding-table range) collects ≤ ~1 GB, still ONE job.
    *
    * Returns the d (dimension, value) pairs in micro-units; empty
    * corpus → Nil. The centered Gram is PSD, so G ≠ 0 implies a
    * positive diagonal max and the iterate never degenerates
    * spuriously; G = 0 (every vector identical) yields the zero
    * direction on both engines. `id` is unused (kept for signature
    * stability with the pre-Gram trainer). */
  def topPrincipalComponent(corpus: DataFrame, id: Column, vec: Column,
                            iters: Int = 2): Seq[(Int, Long)] =
    gramStats(corpus, vec) match {
      case None => Nil
      case Some((n, s, t)) =>
        val v = trainComponents(n, s, t, 1, iters).head
        v.indices.map(j => (j + 1, v(j)))
    }

  /** Packed-triangle index of (j, k), j ≤ k, matching the contiguous
    * accumulation order in [[gramStats]]. */
  private def triIdx(d: Int, j: Int, k: Int): Int = {
    val (a, b) = if (j <= k) (j, k) else (k, j)
    a * d - a * (a - 1) / 2 + (b - a)
  }

  /** Exact raw moments of the micro-quantized embedding column in ONE
    * corpus pass: (n, s, S) with s_j = Σ q_j and S the packed upper
    * triangle of Σ q qᵀ. None for an empty corpus. Null vectors are
    * excluded (the [[cosinePairsLsh]] convention); ragged dimensions
    * fail loudly. */
  private def gramStats(corpus: DataFrame, vec: Column)
      : Option[(Long, Array[BigInt], Array[BigInt])] = {
    val q = corpus
      .select(transform(toDouble(vec),
        x => floor(x * 1e6 + lit(0.5)).cast("long")).as("q"))
      .filter(col("q").isNotNull)
    // fan-out at the RDD level (one Dataset→RDD conversion, lazy
    // repartition): a tiny single-file corpus still uses every core
    // for the O(d²)-per-row moment accumulation, while a big scan
    // already has ≥ defaultParallelism partitions and shuffles
    // nothing. Calling Dedup.fanOut here would convert to RDD twice
    // and cost a second (empty) job — GramScanSpec pins the count.
    val raw = q.rdd
    val target = corpus.sparkSession.sparkContext.defaultParallelism
    val rdd = if (raw.getNumPartitions < target) raw.repartition(target)
              else raw
    val partials = rdd.mapPartitions { rows =>
      var n = 0L
      var dim = 0
      var sL: Array[Long] = null; var tL: Array[Long] = null
      var sB: Array[BigInt] = null; var tB: Array[BigInt] = null
      var sinceFold = 0L
      // worst per-element square seen so far: the fold interval
      // adapts to the DATA's magnitude (unit-norm embeddings fold
      // every ~2^16 rows; |x| ~ 100 folds every ~200 — still cheap)
      // instead of hard-limiting the input domain. A single product
      // overflowing Long on its own (|x| > ~3000) still fails loudly
      // via multiplyExact.
      var worstSq = 1L
      def fold(): Unit = {
        var i = 0
        while (i < dim) { sB(i) += sL(i); sL(i) = 0L; i += 1 }
        i = 0
        while (i < tL.length) { tB(i) += tL(i); tL(i) = 0L; i += 1 }
        sinceFold = 0L
      }
      rows.foreach { r =>
        // boxed view: getSeq[Long] would UNBOX a null element to 0L
        // silently — against the fail-loudly convention (whole-null
        // vectors are filtered upstream; a null COMPONENT is corrupt
        // data, not a shorter vector)
        val v = r.getSeq[Any](0)
        if (sL == null) {
          dim = v.size
          // cap sizes one TASK's triangle (d=4096: 67 MB of longs +
          // the BigInt fold targets); the driver never sees more than
          // `mergers` triangles regardless of executor count — the
          // two-level merge below (r8 verdict task #2, d=1536-4096
          // embedding tables)
          require(dim >= 1 && dim <= 4096,
            s"gramStats: dim $dim outside 1..4096 (per-task Gram " +
            "state is d(d+1)/2 integers)")
          sL = new Array[Long](dim)
          tL = new Array[Long](dim * (dim + 1) / 2)
          sB = Array.fill(dim)(BigInt(0))
          tB = Array.fill(tL.length)(BigInt(0))
        }
        require(v.size == dim,
          s"gramStats: ragged dimension ${v.size} vs $dim")
        val a = new Array[Long](dim)
        var rowMax = 0L
        var i = 0
        while (i < dim) {
          val x = v(i)
          require(x != null,
            s"gramStats: null vector element at index $i")
          a(i) = x.asInstanceOf[Long]
          val ab = math.abs(a(i))
          if (ab > rowMax) rowMax = ab
          i += 1
        }
        if (rowMax > 0) {
          val sq = if (rowMax > 3037000499L) Long.MaxValue // > sqrt(2^63)
                   else rowMax * rowMax
          if (sq > worstSq) worstSq = sq
        }
        // fold BEFORE this row if the pending batch could overflow at
        // the current worst magnitude (margin 4x)
        if (sinceFold + 1 > (Long.MaxValue / 4) / worstSq) fold()
        var j = 0; var p = 0
        while (j < dim) {
          sL(j) = Math.addExact(sL(j), a(j))
          var k = j
          while (k < dim) {
            tL(p) = Math.addExact(tL(p),
              Math.multiplyExact(a(j), a(k)))
            p += 1; k += 1
          }
          j += 1
        }
        n += 1; sinceFold += 1
        if (sinceFold >= 65536) fold()
      }
      if (sL == null) Iterator.empty
      else { fold(); Iterator.single((n, dim, sB, tB)) }
    }
    // two-level merge: the driver must never hold one triangle PER
    // PARTITION (1000 executors x a d=4096 triangle is a dead
    // driver). When the scan has more partitions than `mergers`, an
    // exchange of the O(partitions) partial records — triangle-sized,
    // never row-sized — folds them executor-side to `mergers`
    // triangles first. Still ONE action/job (the tree adds a stage,
    // not a corpus rescan — GramScanSpec pins the count); small
    // fan-ins skip the exchange entirely.
    val mergers = 8
    def mergeInto(acc: (Long, Int, Array[BigInt], Array[BigInt]),
                  x: (Long, Int, Array[BigInt], Array[BigInt]))
        : (Long, Int, Array[BigInt], Array[BigInt]) = {
      require(acc._2 == x._2,
        s"gramStats: partitions disagree on dimension")
      var i = 0
      while (i < acc._3.length) { acc._3(i) += x._3(i); i += 1 }
      i = 0
      while (i < acc._4.length) { acc._4(i) += x._4(i); i += 1 }
      (acc._1 + x._1, acc._2, acc._3, acc._4)
    }
    val parts =
      if (partials.getNumPartitions > mergers)
        partials.coalesce(mergers, shuffle = true)(null)
          .mapPartitions { it =>
            if (it.isEmpty) Iterator.empty else Iterator.single(
              it.reduce(mergeInto))
          }.collect()
      else partials.collect()
    if (parts.isEmpty) None
    else {
      val merged = parts.reduce(mergeInto)
      Some((merged._1, merged._3, merged._4))
    }
  }

  /** The driver-side trainer over exact raw moments: centered Gram by
    * algebra, then m components of power iteration with per-iteration
    * orthogonalization against the already-trained directions.
    * Component k initializes at 1e6·e_{j(k)} with j(k) the k-th
    * largest centered-Gram diagonal (ties → smaller index) — distinct
    * deterministic starts that the oracle reproduces with an
    * ORDER BY g DESC, j LIMIT 1 OFFSET k−1. All divisions truncate
    * toward zero (BigInt `/`), matching DuckDB `//` exactly. */
  private def trainComponents(n: Long, s: Array[BigInt],
                              t: Array[BigInt], m: Int,
                              iters: Int): IndexedSeq[IndexedSeq[Long]] = {
    val d = s.length
    val nB = BigInt(n)
    def floorDivB(a: BigInt, b: BigInt): BigInt = {
      val fm = ((a % b) + b) % b
      (a - fm) / b
    }
    val mean = s.map(x => floorDivB(x, nB))
    val g = Array.tabulate(d, d)((j, k) =>
      t(triIdx(d, j, k)) - mean(j) * s(k) - mean(k) * s(j) +
        nB * mean(j) * mean(k))
    val order = (0 until d).sortWith((a, b) =>
      g(a)(a) > g(b)(b) || (g(a)(a) == g(b)(b) && a < b))
    val M = BigInt(1000000)
    val us = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[BigInt]]
    (0 until m).foreach { k =>
      var v: IndexedSeq[BigInt] =
        if (k < d) IndexedSeq.tabulate(d)(j =>
          if (j == order(k)) M else BigInt(0))
        else IndexedSeq.fill(d)(BigInt(0))
      (0 until iters).foreach { _ =>
        var w = IndexedSeq.tabulate(d)(j =>
          (0 until d).map(c => g(j)(c) * v(c))
            .foldLeft(BigInt(0))(_ + _))
        us.foreach { u =>
          val uu = u.map(x => x * x).foldLeft(BigInt(0))(_ + _)
          if (uu != 0) {
            val nu = w.zip(u).map { case (a, b) => a * b }
              .foldLeft(BigInt(0))(_ + _)
            w = w.zip(u).map { case (a, b) => a - (nu * b) / uu }
          }
        }
        val ma = w.map(_.abs).max
        v = if (ma == 0) IndexedSeq.fill(d)(BigInt(0))
            else w.map(x => (x * M) / ma)
      }
      us += v
    }
    us.map(_.map(_.toLong)).toIndexedSeq
  }

  /** Top-m principal components — the PCA head of "all-but-the-top"
    * post-processing when one direction isn't enough. Same single
    * Gram pass and driver-side loop as [[topPrincipalComponent]]
    * (which is exactly its m = 1 case, so component 1 agrees between
    * the two trainers by construction); deflation is per-iteration
    * orthogonalization against components 1..k−1 in truncating
    * integer arithmetic, replayed by the oracle on the same d²-row
    * Gram CTE. A fully degenerate corpus (G = 0) yields all-zero
    * components on both engines.
    *
    * Scale: ONE corpus job regardless of m and iters (was
    * m × iters × 2 jobs + m materialized deflation passes);
    * driver flops are O(m·iters·d²) on 64-ish dims — microseconds.
    * Output: (comp, j, v) in micro-units, comp/j 1-based. */
  def topPrincipalComponents(corpus: DataFrame, id: Column, vec: Column,
                             m: Int, iters: Int = 2): DataFrame = {
    require(m >= 1 && m <= 16,
      s"topPrincipalComponents: m $m outside 1..16")
    val spark = corpus.sparkSession
    import spark.implicits._
    val comps = gramStats(corpus, vec) match {
      case None => Seq.empty[(Int, Int, Long)]
      case Some((n, s, t)) =>
        val vs = trainComponents(n, s, t, m, iters)
        for (k <- 0 until m; j <- s.indices)
          yield (k + 1, j + 1, vs(k)(j))
    }
    comps.toDF("comp", "j", "v")
  }

  /** Common-direction removal ("all-but-the-top"): subtract each
    * vector's projection onto the top principal component, x' = x -
    * (x·u)u with u the L2-normalized direction from
    * [[topPrincipalComponent]]. Plain double arithmetic (the OUTPUT is
    * float-typed embedding post-processing, not an oracle surface —
    * orthogonality and idempotence are spec-pinned instead); one
    * narrow pass, broadcast literal direction, no shuffle. A zero
    * direction (degenerate corpus) passes vectors through unchanged. */
  def removeTopComponent(df: DataFrame, id: Column, vec: Column,
                         pcMicro: Seq[(Int, Long)]): DataFrame = {
    val v = pcMicro.sortBy(_._1).map(_._2)
    // normalize against the EXACT integer sum of squares: u_j =
    // v_j / sqrt(Σ v_j²) — every float op here (int→double, sqrt,
    // divide) is IEEE correctly-rounded, so an oracle replaying
    // HUGEINT sums reproduces u bit-for-bit (a double fold over
    // v_j²/1e12 would be summation-order-dependent instead)
    val ss = v.map(x => x * x).sum
    val u =
      if (ss == 0L) v.map(_ => 0.0)
      else v.map(_.toDouble / math.sqrt(ss.toDouble))
    val uLit = typedlit(u)
    // the projection scalar is BOUND to a column before the subtraction
    // lambda — a derived expression inside a HOF lambda re-evaluates
    // per element (O(d^2) per row, measured on bigramNll)
    val proj = aggregate(zip_with(col("__v"), uLit, (x, y) => x * y),
      lit(0.0), (a, x) => a + x)
    df.select(id.as("id"), toDouble(vec).as("__v"))
      .withColumn("__p", proj)
      .select(col("id"),
        zip_with(col("__v"), uLit,
          (x, y) => x - col("__p") * y).as("v"))
  }

  /** Sequential multi-direction removal — "all-but-the-top" with the
    * [[topPrincipalComponents]] head: fold [[removeTopComponent]]
    * over the components in comp order (remove u₁ from x, then u₂
    * from the residual, …). Sequential projection is the exact
    * semantics the deflated trainer implies and is what the oracle
    * replays; for perfectly orthogonal directions it equals joint
    * projection. `comps` is the trainer's (comp, j, v_micro) rows. */
  def removeTopComponents(df: DataFrame, id: Column, vec: Column,
                          comps: Seq[(Int, Int, Long)]): DataFrame = {
    val byComp = comps.groupBy(_._1).toSeq.sortBy(_._1)
    byComp.foldLeft(df.select(id.as("id"), toDouble(vec).as("v"))) {
      case (cur, (_, rows)) =>
        // lineage CUT between removals: CollapseProject otherwise
        // re-inlines removal k−1's whole zip_with array expression
        // into EVERY element lambda of removal k — O(d²) interpreted
        // work per row (the q106 element_at lesson; measured 77 s vs
        // 8 s at sf0.1 on q489). Materializing the projected corpus
        // between components is also what a real pipeline does with
        // its post-processed embeddings.
        removeTopComponent(cur, col("id"), col("v"),
          rows.map(r => (r._2, r._3))).cut()
    }
  }

  /** SSL-prototypes diversity pruning (the curation step AFTER dedup in
    * embedding-based pipelines): every vector is assigned to its
    * nearest trained centroid, scored by cosine to that centroid
    * ("prototypicality"), and the TOP `pruneFrac` most prototypical of
    * each cluster are flagged keep=false — pruning each cluster's
    * redundant core keeps the diverse shell, which preserves model
    * quality better than random pruning at large scale.
    *
    * Scale shape: assignment + scoring is one narrow pass against a
    * k×dim broadcast centroid literal; the per-cluster rank runs on
    * the range-partitioned distributed prefix sum over
    * (cid, -score, id) — never a per-cluster window, which would
    * serialize billion-row clusters through single tasks. Cluster
    * offsets/sizes are a k-row broadcast join back.
    *
    * Determinism: scores are rounded to 6 BEFORE ranking and ties
    * break on id — the [[ivfTopK]]/[[semDedupPairs]] discipline, so an
    * oracle replaying the fixed-point Lloyd chain (q51's CTEs) ranks
    * identically. Null vectors are excluded (no cluster, no signal —
    * the [[cosinePairsLsh]] convention). Output:
    * (vec_id, cid, proto_score, keep). */
  def prototypicality(df: DataFrame, id: Column, vec: Column,
                      centroids: Seq[Seq[Double]], pruneFrac: Double,
                      partitions: Int = 32): DataFrame = {
    require(pruneFrac >= 0.0 && pruneFrac <= 1.0,
      s"pruneFrac must be in [0,1], got $pruneFrac")
    require(centroids.nonEmpty, "prototypicality: need >= 1 centroid")
    val cents = typedlit(centroids)
    val assigned = Dedup.fanOut(df)
      .select(id.as("vec_id"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("cid",
        element_at(nearestCentroids(centroids, col("v"), 1), 1))
      .withColumn("proto_score",
        round(cosine(col("v"), element_at(cents, col("cid") + 1)), 6))
      .drop("v")
    val pos = Packing.orderedCumsum(assigned,
      struct(col("cid"), -col("proto_score"), col("vec_id")), lit(1L),
      partitions, offsetName = "__pos")
    val sizes = pos.groupBy(col("cid").as("__c"))
      .agg(min(col("__pos")).as("__g0"), count(lit(1)).as("__n"))
    pos.join(broadcast(sizes), col("cid") === col("__c"))
      .withColumn("keep", col("__pos") - col("__g0") >=
        floor(col("__n") * pruneFrac).cast("long"))
      .select("vec_id", "cid", "proto_score", "keep")
  }

  /** murmur3's 32-bit finalizer — the seeded sign source for
    * [[jlProject]], replayable bit-for-bit in SQL (xor / floor-div /
    * 128-bit multiply mod 2^32). A linear-congruential parity (the
    * MINSTD family used for id hashing) is NOT usable here: its
    * multiplier is even mod 2^31, so consecutive inputs produce long
    * constant-parity runs and the "random" sign rows come out ~0.8
    * correlated — measured 2x the ideal JL distortion. fmix32's
    * avalanche restores true-random quality (row |corr| ~0.1, the
    * random-matrix baseline). */
  private def fmix32(x: Long): Long = {
    val M = 0xFFFFFFFFL
    var h = x & M
    h ^= h >>> 16; h = (h * 0x85ebca6bL) & M
    h ^= h >>> 13; h = (h * 0xc2b2ae35L) & M
    h ^= h >>> 16
    h
  }

  /** Johnson–Lindenstrauss sign projection: dim-d embeddings shrink to
    * k dims against a seeded ±1 matrix derived from [[fmix32]] —
    * identical on the driver, in every task, and in the oracle's
    * integer SQL replay, so no RNG state ships anywhere. Pairwise
    * geometry survives within (1 ± eps) w.h.p. at
    * k ~ O(log n / eps²) — the standard scan-budget shrink BEFORE
    * ANN when wide embeddings dominate IO (a 64→16 cut is 4× less
    * scan/broadcast per stage downstream; linear maps preserve exact
    * duplicates' collinearity outright). One narrow per-row pass of k
    * codegen'd [[graft.functions.ArrayDot]]s — no lambda, no shuffle.
    * Null vectors are excluded (the [[cosinePairsLsh]] convention).
    * Output: (vec_id, j, p) rows, p rounded to 6. */
  private def jlArray(vec: Column, dim: Int, k: Int,
                      seed: Long): Column = {
    require(dim >= 1 && k >= 1, s"need dim, k >= 1, got dim=$dim k=$k")
    val signs: Seq[Seq[Double]] = (0 until k).map(j =>
      (0 until dim).map(i =>
        if ((fmix32(i.toLong * k + j + seed) & 1L) == 0L) 1.0 else -1.0))
    // multiply by the reciprocal (NOT divide): the oracle mirrors the
    // same op sequence so the IEEE results are bit-identical pre-round
    val scale = 1.0 / math.sqrt(k.toDouble)
    val v = toDouble(vec)
    array((0 until k).map(j =>
      round(dot(v, typedlit(signs(j))) * scale, 6)): _*)
  }

  def jlProject(df: DataFrame, id: Column, vec: Column,
                dim: Int, k: Int, seed: Long = 0L): DataFrame = {
    val v = toDouble(vec)
    Dedup.fanOut(df).filter(v.isNotNull)
      .select(id.as("vec_id"), posexplode(jlArray(vec, dim, k, seed)))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "p")
  }

  /** Column form of [[jlProject]] (same matrix, same rounding):
    * (vec_id, proj) with proj an array<double> of length k — the
    * composable shape the ANN ops consume; q114 runs exact top-k in
    * the projected space end to end against a replayed oracle. */
  def jlProjectVec(df: DataFrame, id: Column, vec: Column,
                   dim: Int, k: Int, seed: Long = 0L): DataFrame = {
    val v = toDouble(vec)
    Dedup.fanOut(df).filter(v.isNotNull)
      .select(id.as("vec_id"), jlArray(vec, dim, k, seed).as("proj"))
  }

  /** Approximate cosine-similar pair discovery via sign-pattern LSH:
    * bucket on an nPlanes-bit signature, compare only within buckets,
    * verify exactly. Multi-table (`tables`) boosts recall; emitted pairs
    * are exact-verified so precision is 1 at the threshold.
    *
    * Tuning (the q22-style recall analysis, for cosine instead of
    * jaccard): a pair at cosine c agrees with one hyperplane with
    * p = 1 - arccos(c)/pi, shares a table's bucket with p^nPlanes, and
    * is missed entirely with (1 - p^nPlanes)^tables. For high
    * thresholds (tau >= ~0.7, p >= 0.75) nPlanes can be large and each
    * table prunes ~2^-nPlanes of the random pairs — the regime LSH is
    * for. At LOW thresholds (tau ~ 0.4, p ~ 0.63) nPlanes must stay
    * small (2) and tables many for recall, so candidate volume
    * approaches all-pairs — unavoidable (pairs at 3-sigma background
    * similarity carry almost no locality) — but the plan is still a
    * bucketed shuffle join that distributes across executors, never a
    * single-stream BroadcastNestedLoopJoin like the exact baseline.
    * q49 pins nPlanes=2/tables=24 at tau=0.4 against the exact oracle
    * (recall 1 verified at sf0.001/0.01/0.1 — deterministic, seeded
    * planes; per-pair miss bound 0.6^24 < 5e-6 at c=0.401). */
  def cosinePairsLsh(df: DataFrame, id: Column, vec: Column, tau: Double,
                     nPlanes: Int = 12, tables: Int = 4,
                     dim: Int = 64): DataFrame = {
    // `dim` must equal the data's vector length: ArrayDot truncates to
    // the shorter array, so a mismatch would silently bucket on a
    // PREFIX of each embedding and drop similar pairs. Verified per row
    // (the check is a codegen'd comparison, effectively free). Null
    // vectors are excluded BEFORE the check — Dedup.embeddingPairs
    // silently drops them (null cosine fails the threshold), and the
    // "LSH is a subset of the exact baseline" invariant must hold for
    // null rows too, not abort the job via a null-condition raise_error.
    val vchecked = when(size(toDouble(vec)) === dim, toDouble(vec))
      .otherwise(raise_error(concat(
        lit(s"cosinePairsLsh: expected $dim-dim vectors, got "),
        size(vec).cast("string"))))
    val e = Dedup.fanOut(df).filter(vec.isNotNull)
      .select(id.as("id"), vchecked.as("v"))
    // ONE pass emits every table's bucket id per row (explode over an
    // inline struct array) — the union-of-branches form re-scanned the
    // corpus once per table (26 reads at tables=24), which is exactly
    // the cost this operator exists to avoid at scale
    val bucketed = e.select(col("id"), col("v"),
        explode(array((0 until tables).map { t =>
          val planes = Hyperplanes.generate(nPlanes, dim, seed = 42L + t)
          struct(lit(t).as("table"), lshBucket(col("v"), planes).as("bucket"))
        }: _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.table").as("table"),
              col("tb.bucket").as("bucket"))
    // The vectors RIDE THROUGH the bucket join so the exact verify is
    // inline in the join's output stage: candidates stream join →
    // cosine → threshold inside one codegen pipeline, and only the few
    // PASSING pairs reach the dedup shuffle. The previous shape
    // (distinct on raw candidates, then two joins to re-attach vectors)
    // shuffled the full candidate volume — at low tau that approaches
    // all-pairs (75M rows at 5k docs × 24 tables) and the distinct was
    // the whole query's cost. Duplicate candidates (one per colliding
    // table) recompute an identical cosine, which is cheap codegen'd
    // arithmetic; shuffling them is not.
    val cos0 = {
      // threshold on the RAW score, round only for output — same rule as
      // Dedup.embeddingPairs, so the LSH path stays a subset of the
      // exact baseline at the threshold
      bucketed.as("a").join(bucketed.as("b"),
          col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .withColumn("__c", cosine(col("a.v"), col("b.v")))
        .filter(col("__c") >= tau)
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
                round(col("__c"), 6).as("cos"))
    }
    cos0.distinct()
  }

  /** SemDeDup-style cluster-routed embedding near-dup pairs (Abbas et
    * al. 2023, "SemDeDup"): k-means the corpus ([[kmeansCentroids]] —
    * the same fixed-point trainer the IVF path uses), route every
    * vector to its nearest centroid, and compare pairs ONLY within a
    * cluster. Cross-cluster pairs are pruned *by design* — semantic
    * duplicates land in the same cluster, and the k-way partition
    * turns the n² pair space into k independent (n/k)² spaces.
    *
    * Scale design: one narrow assignment pass over the corpus
    * (broadcast literal centroids), then a self-equi-join on the
    * cluster id — a bucketed shuffle join that spreads across
    * executors, never a BroadcastNestedLoopJoin. At 100 TB, k grows
    * with the corpus (SemDeDup uses ~√n clusters) so per-cluster pair
    * counts stay bounded; a pathologically hot cluster can be
    * sub-bucketed by composing [[cosinePairsLsh]] *within* the
    * cluster key. Every arithmetic step (micro-unit centroids,
    * round-6 ranking with index tie-break, raw-score thresholding) is
    * bit-reproducible, so q88's DuckDB oracle replays the whole
    * train→route→pair pipeline exactly.
    *
    * Returns (id1, id2, cos) with id1 < id2 — the same pair schema as
    * [[Dedup.embeddingPairs]] (exact baseline) and [[cosinePairsLsh]],
    * so all three feed the same connected-components keep-one stage. */
  def semDedupPairs(df: DataFrame, id: Column, vec: Column, tau: Double,
                    k: Int = 8, iters: Int = 2): DataFrame = {
    val nonNull = df.filter(vec.isNotNull)
    val base = Dedup.fanOut(nonNull)
      .select(id.as("id"), toDouble(vec).as("v"))
    clusterRoutedPairs(base, kmeansCentroids(nonNull, id, vec, k, iters),
      tau)
  }

  /** Corpus-ADAPTIVE SemDeDup — the 100 TB cost lever for
    * [[semDedupPairs]]. A fixed k makes the within-cluster pair cost
    * Σ n_c² ≈ n²/k grow quadratically once the corpus outgrows k (the
    * 500k decade probe measured 317 s at k=256), and full-corpus
    * Lloyd training costs O(n·k·d·iters) on top. Two levers, both
    * deterministic and oracle-replayable:
    *
    *  - k scales as ⌈√n⌉ clamped to [kMin, kMax] (the SemDeDup
    *    paper's own regime) so pair cost tracks n^1.5, not n²;
    *  - the trainer sees a DETERMINISTIC ARITHMETIC SAMPLE — rows
    *    whose MINSTD residue `((id+1)·48271 mod 2147483647) mod m`
    *    is 0, with m = max(1, n div targetTrain) — capping training
    *    at ~targetTrain rows regardless of corpus size (the same
    *    portable-hash idiom as the q73/q87/q90 split oracles; k-means
    *    quality needs a representative sample, not the corpus).
    *
    * Routing the FULL corpus is still one broadcast-centroid pass and
    * pairs still form within clusters only; every arithmetic step
    * stays bit-reproducible, so q450's DuckDB oracle replays
    * n → (k, m) → sample → train → route → pair exactly. Returns the
    * [[semDedupPairs]] schema. */
  def semDedupPairsAuto(df: DataFrame, id: Column, vec: Column,
                        tau: Double, targetTrain: Long = 65536L,
                        kMin: Int = 8, kMax: Int = 4096,
                        iters: Int = 2): DataFrame = {
    val nonNull = df.filter(vec.isNotNull)
    val base = Dedup.fanOut(nonNull)
      .select(id.as("id"), toDouble(vec).as("v"))
    val n = nonNull.count()
    if (n == 0L)
      return base.select(col("id").as("id1"), col("id").as("id2"),
        lit(0.0).as("cos")).limit(0)
    // ceil(sqrt) over double is exact for any realistic corpus
    // (n < 2^52); both clamps replay as greatest/least in SQL
    val k = math.min(kMax.toLong, math.max(kMin.toLong,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val m = math.max(1L, n / targetTrain)
    val train = nonNull.filter(
      (((id.cast("long") + 1L) * 48271L) % 2147483647L) % m === 0L)
    clusterRoutedPairs(base, kmeansCentroids(train, id, vec, k, iters),
      tau)
  }

  /** Shared route-then-pair tail of the SemDeDup family: assign every
    * vector to its nearest centroid, self-equi-join on the cluster id
    * (bucketed shuffle — never an all-pairs nested loop), exact-cosine
    * verify at `tau`. */
  private def clusterRoutedPairs(base: DataFrame,
                                 centroids: Seq[Seq[Double]],
                                 tau: Double): DataFrame = {
    if (centroids.isEmpty)
      return base.select(col("id").as("id1"), col("id").as("id2"),
        lit(0.0).as("cos")).limit(0)
    val assigned = base.withColumn("cl",
      element_at(nearestCentroids(centroids, col("v"), 1), 1))
    assigned.as("a").join(assigned.as("b"),
        col("a.cl") === col("b.cl") && col("a.id") < col("b.id"))
      .withColumn("__c", cosine(col("a.v"), col("b.v")))
      .filter(col("__c") >= tau)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
              round(col("__c"), 6).as("cos"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most-COSINE-similar corpus vectors carrying a
    * DIFFERENT label — the "looks like a positive, isn't one" examples
    * that make embedding models actually separate classes (the standard
    * in-batch-negatives upgrade: mine globally, not per batch).
    *
    * Plan shape = [[bruteForceTopK]] with the label anti-filter fused
    * into the candidate join (queries broadcast; corpus streams; only k
    * rows per (task, query) reach the shuffle via the mergeable partial
    * top-k). The filter must sit BEFORE ranking — post-filtering a
    * same-label-polluted top-k would under-fill it. At corpus scales
    * where brute force is too hot, route candidates through [[ivfTopK]]
    * with an over-fetch and the same label filter; ranking semantics
    * (round(6) scores, id tie-break) are identical.
    *
    * Null handling: null embeddings are excluded on both sides (the
    * bruteForceTopK contract); a null LABEL excludes its row too —
    * `nl =!= ql` is SQL-null when either side is null, and an
    * unlabeled example is not a usable negative.
    *
    * Returns (qid, nbr, nbr_label, score, rank), rank 1..k. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    id: Column, vec: Column, label: Column,
                    qid: Column, qvec: Column, qlabel: Column,
                    k: Int): DataFrame = {
    val c = Dedup.fanOut(corpus)
      .select(id.as("nbr"), toDouble(vec).as("v"), label.as("nl"))
      .filter(col("v").isNotNull)
      .withColumn("nrm", l2norm(col("v")))
    val q = queries
      .select(qid.as("qid"), toDouble(qvec).as("qv"), qlabel.as("ql"))
      .filter(col("qv").isNotNull)
      .withColumn("qnrm", l2norm(col("qv")))
    val d = col("qnrm") * col("nrm")
    val cos = when(d === 0.0, 0.0).otherwise(dot(col("qv"), col("v")) / d)
    val scored = c.join(broadcast(q),
        col("nbr") =!= col("qid") && col("nl") =!= col("ql"))
      .select(col("qid"), col("nbr"), round(cos, 6).as("score"))
    // rank first (partial top-k keeps only k rows per task per query),
    // then decorate the k·|queries| survivors with their label — a
    // result-sized join AQE broadcasts, never a corpus shuffle
    Relational.topKScored(scored, col("qid"), col("score"), col("nbr"),
        k, idName = "nbr")
      .join(c.select(col("nbr"), col("nl").as("nbr_label")), "nbr")
      .select(col("qid"), col("nbr"), col("nbr_label"),
              col("score"), col("rank"))
  }

  /** Distributional outliers in embedding space: per-vector diagonal
    * standardized distance Σ_d ((x_d − μ_d)/σ_d)² — the cheap
    * Mahalanobis (diagonal covariance) that flags encoder glitches,
    * off-manifold junk, and mislabeled modalities before they poison
    * ANN buckets or k-means training. Everything is fixed-point
    * integer: coordinates quantize at 1e6 (the corpus-wide convention
    * here — see [[kmeansCentroids]]), per-dim terms are the exact
    * rational (n·x_d − s_d)²/(n·ss_d − s_d²) floor-quantized to ppm,
    * and the score is their integer sum — bit-portable, no float
    * accumulation order anywhere. Constant dims (zero variance)
    * contribute 0 rather than dividing by zero.
    *
    * Shape at 100 TB: per-dim moment frame is dims-sized (one shuffle
    * with map-side partials over the exploded coordinates), broadcast
    * back; the per-vector re-sum has map-side combine on vec id. The
    * top-k is a TakeOrdered, never a global sort. */
  def embeddingOutliers(df: DataFrame, id: Column, vec: Column,
                        topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val coords = df
      .select(id.as("vec_id"), transform(toDouble(vec),
        x => floor(x * 1e6 + lit(0.5)).cast("long")).as("q"))
      .filter(col("q").isNotNull)
      .select(col("vec_id"), posexplode(col("q")).as(Seq("d", "x")))
    val stats = coords.groupBy(col("d"))
      .agg(count(lit(1)).cast(dec).as("n"),
           sum(col("x").cast(dec)).as("s"),
           sum((col("x") * col("x")).cast(dec)).as("ss"))
    coords.join(broadcast(stats), "d")
      .withColumn("__num", (col("n") * col("x") - col("s")) *
                           (col("n") * col("x") - col("s")) * lit(1000000))
      .withColumn("__den", col("n") * col("ss") - col("s") * col("s"))
      // IntegralDivide on decimals yields an exact long; num >= 0 and
      // den > 0 so truncation == floor (matches the oracle's //)
      .select(col("vec_id"),
        when(col("__den") === lit(0), lit(0L))
          .otherwise(expr("__num div __den")).as("__term"))
      .groupBy(col("vec_id"))
      .agg(sum(col("__term")).as("score_ppm"))
      .orderBy(desc("score_ppm"), col("vec_id"))
      .limit(topK)
  }

  /** Micro-unit quantization shared by the PQ path: the corpus-wide
    * 1e6 fixed-point convention (see [[kmeansCentroids]]). */
  private def microQ(v: Column): Column =
    transform(v, x => floor(x * 1e6 + lit(0.5)).cast("long"))

  /** Squared-L2 distance between the j-th subvector of micro-quantized
    * `q` and codebook row `cb[cidx]` (both in micro-units) — EXACT
    * integer: coords are ≤ ~1e6 in magnitude, diffs² ≤ 4e12, summed
    * over ≤ 64 dims ≤ 2.6e14, far inside long range. */
  private def pqSubDist(q: Column, cb: Column, j: Int, sub: Int,
                        cidx: Column): Column =
    aggregate(sequence(lit(0), lit(sub - 1)), lit(0L).cast("long"),
      (acc, d) => {
        val diff = element_at(q, lit(j * sub) + d + 1) -
          element_at(element_at(cb, cidx + 1), d + 1)
        acc + diff * diff
      })

  /** Argmin centroid index for subspace j (distance asc, index asc on
    * ties — array_sort's struct order), as a Column. */
  private def pqAssign(q: Column, cb: Column, j: Int, sub: Int,
                       kk: Int): Column = {
    val ranked = transform(sequence(lit(0), lit(kk - 1)), i =>
      struct(pqSubDist(q, cb, j, sub, i).as("d"), i.as("idx")))
    element_at(transform(array_sort(ranked), s => s.getField("idx")), 1)
  }

  /** Exact integer dot of the j-th subvector of micro-quantized `q`
    * with codebook row `cb[cidx]` — products ≤ 1e12, subspace sums
    * ≤ 8e12, full-vector sums ≤ 6.4e13: exact in long AND in double
    * (< 2^53), which is what lets the ADC cosine divide once. */
  private def pqSubDot(q: Column, cb: Column, j: Int, sub: Int,
                       cidx: Column): Column =
    aggregate(sequence(lit(0), lit(sub - 1)), lit(0L).cast("long"),
      (acc, d) => acc + element_at(q, lit(j * sub) + d + 1) *
        element_at(element_at(cb, cidx + 1), d + 1))

  /** Product-quantization codebook trainer (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search"): the d-dim
    * space splits into `m` orthogonal subspaces of d/m dims; each gets
    * its own `ksub`-centroid Lloyd k-means under squared-L2. A corpus
    * vector then compresses to m small codes (m bytes at ksub ≤ 256)
    * — a 32–64× memory cut over float32, which is what lets a 100 TB
    * embedding corpus live in executor memory as codes.
    *
    * Everything is INTEGER: vectors quantize to 1e6 micro-units, all
    * distances are exact long sums of squared diffs, centroid updates
    * are floorDiv(coordinate sum, count), ties break on the smaller
    * index — the whole training loop is bit-reproducible in a SQL
    * oracle with no float accumulation anywhere (simpler even than
    * [[kmeansCentroids]]'s round-6 cosine ranking).
    *
    * Scale shape: init is a ksub-row driver collect; each iteration is
    * ONE distributed pass — a narrow all-m-subspaces assignment, an
    * explode to (subspace, code) keys, and a single groupBy whose
    * result (m·ksub·(d/m) = d·ksub longs) is the only driver state.
    *
    * Returns codebooks(j)(c) = micro-unit centroid of code c in
    * subspace j; fewer than ksub rows yield that many codes, an empty
    * corpus yields Nil. */
  def pqCodebooks(corpus: DataFrame, id: Column, vec: Column,
                  m: Int, ksub: Int, iters: Int): Seq[Seq[Seq[Long]]] =
    pqCodebooksFromQ(
      Dedup.fanOut(corpus)
        .select(id.as("id"), toDouble(vec).as("v"))
        .filter(col("v").isNotNull)
        .withColumn("q", microQ(col("v")))
        .select(col("id"), col("q")),
      m, ksub, iters)

  /** [[pqCodebooks]] over an ALREADY micro-quantized frame
    * (id, q: array<long>) — the entry point the IVF-PQ residual path
    * uses (residuals are integer differences, not floats). */
  private[graft] def pqCodebooksFromQ(c: DataFrame, m: Int, ksub: Int,
                                      iters: Int): Seq[Seq[Seq[Long]]] = {
    require(m >= 1 && ksub >= 1 && iters >= 0,
      s"pqCodebooks: m=$m ksub=$ksub iters=$iters must be positive")
    val seeds: Seq[Seq[Long]] = c.orderBy(col("id")).limit(ksub)
      .collect().map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    if (seeds.isEmpty) return Nil
    val dim = seeds.head.size
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m=$m")
    val sub = dim / m
    var books: IndexedSeq[IndexedSeq[Seq[Long]]] =
      IndexedSeq.tabulate(m)(j =>
        seeds.map(_.slice(j * sub, (j + 1) * sub)).toIndexedSeq)
    val kk = seeds.size
    for (_ <- 0 until iters) {
      val lits = books.map(b => typedlit(b))
      // one pass: every row emits (subspace, assigned code) for all m
      // subspaces, one shuffle keyed on (j, code) updates every
      // codebook together
      val codes = array((0 until m).map(j =>
        struct(lit(j).as("j"),
               pqAssign(col("q"), lits(j), j, sub, kk).as("code"))): _*)
      val aggs = count(lit(1)).as("n") +:
        (0 until sub).map(d =>
          sum(element_at(col("q"), col("j") * sub + d + 1)).as(s"s$d"))
      val updated = c.select(col("q"), explode(codes).as("jc"))
        .select(col("q"), col("jc.j").as("j"), col("jc.code").as("code"))
        .groupBy("j", "code")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val n = r.getLong(2)
          (r.getInt(0), r.getAs[Number](1).intValue) ->
            (0 until sub).map(d => Math.floorDiv(r.getLong(d + 3), n))
        }
        .toMap
      // empty codes keep their previous centroid (kmeansCentroids rule)
      books = IndexedSeq.tabulate(m)(j =>
        books(j).indices.map(cc =>
          updated.getOrElse((j, cc), books(j)(cc)): Seq[Long]))
    }
    books
  }

  /** PQ/ADC top-k (asymmetric distance computation): corpus vectors
    * are stored as m PQ codes; each query precomputes one m×ksub
    * lookup table of exact integer subvector DOTS with every codebook
    * entry, and a candidate's approximate cosine is m table lookups
    * summed over the reconstruction, divided once by the (exact
    * integer) query and reconstruction norms — no per-pair vector
    * math at all. A deterministic shortlist of `shortlistFactor·k`
    * per query is then rescored with EXACT double cosine (the
    * [[quantizedTopK]] contract: compression costs recall only,
    * never precision).
    *
    * Codebooks minimize L2 reconstruction error (the PQ objective);
    * the ADC RANKING is approximate cosine — q·recon(c) /
    * (|q|·|recon(c)|) — so the shortlist agrees with the brute-force
    * cosine ordering even on unnormalized corpora (ranking raw ADC L2
    * against a cosine ground truth collapses recall when vector norms
    * vary).
    *
    * Scale shape: encode is one narrow corpus pass against broadcast
    * literal codebooks (production stores the codes column at ingest
    * and the shortlist scan reads ONLY it — 32–64× fewer bytes than
    * the float vectors, the actual ANN bottleneck at corpus scale);
    * queries broadcast with their lookup tables; only shortlist rows
    * fetch float vectors for rescore. Compose with [[ivfTopK]]'s list
    * routing for IVF-PQ when even the full code scan is too hot.
    *
    * Determinism: dots and norms are exact integers (< 2^53, so the
    * one double division + round(6) is bit-portable); both rankings
    * tie-break id asc — the oracle replays train → encode → table →
    * shortlist → rescore bit-for-bit.
    * Returns (qid, nbr, score, rank). */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             id: Column, vec: Column, qid: Column, qvec: Column,
             k: Int, m: Int = 8, ksub: Int = 8, iters: Int = 1,
             shortlistFactor: Int = 4,
             trained: Option[Seq[Seq[Seq[Long]]]] = None): DataFrame = {
    require(k >= 1 && shortlistFactor >= 1,
      s"pqTopK: k=$k shortlistFactor=$shortlistFactor must be >= 1")
    val books = trained.getOrElse(pqCodebooks(corpus, id, vec, m, ksub, iters))
    val c = Dedup.fanOut(corpus)
      .select(id.as("nbr"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull) // null embeddings excluded (see bruteForceTopK)
    if (books.isEmpty)
      return queries.select(qid.as("qid")).limit(0)
        .crossJoin(c.select(col("nbr")).limit(0))
        .withColumn("score", lit(0.0)).withColumn("rank", lit(0))
    val sub = books.head.head.size
    val kk = books.head.size
    val lits = books.map(b => typedlit(b))
    // squared norms of every codebook entry, computed driver-side —
    // a candidate's reconstruction norm is m literal lookups
    val norm2s: Seq[Seq[Long]] = books.map(_.map(cb =>
      cb.map(x => x * x).sum))
    val n2lits = norm2s.map(n => typedlit(n))
    def qNorm2(q: Column): Column =
      aggregate(q, lit(0L).cast("long"), (acc, x) => acc + x * x)
    // corpus side: m codes per row — the compressed representation —
    // plus the reconstruction's squared norm (a code-table lookup)
    val enc = c.withColumn("q", microQ(col("v")))
      .withColumn("codes", array((0 until m).map(j =>
        pqAssign(col("q"), lits(j), j, sub, kk)): _*))
      .withColumn("cn2", (0 until m).map(j =>
        element_at(n2lits(j), element_at(col("codes"), j + 1) + 1))
        .reduce(_ + _))
      .select(col("nbr"), col("v"), col("codes"), col("cn2"))
    // query side: the ADC lookup table — ltab(j)(c) = exact integer
    // dot of the query's j-th subvector with codebook entry c
    val q = queries.select(qid.as("qid"), toDouble(qvec).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qq", microQ(col("qv")))
      .withColumn("ltab", array((0 until m).map(j =>
        transform(sequence(lit(0), lit(kk - 1)), i =>
          pqSubDot(col("qq"), lits(j), j, sub, i))): _*))
      .withColumn("qn2", qNorm2(col("qq")))
      .select(col("qid"), col("qv"), col("ltab"), col("qn2"))
    // ADC cosine: m lookups per (query, candidate), ONE division —
    // all integer inputs are < 2^53, exact in double
    val adot = (0 until m).map(j =>
        element_at(element_at(col("ltab"), j + 1),
                   element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val aden = sqrt(col("qn2").cast("double")) *
               sqrt(col("cn2").cast("double"))
    val cand = enc.join(
        broadcast(q.select(col("qid"), col("ltab"), col("qn2"))),
        col("nbr") =!= col("qid"))
      .select(col("qid"), col("nbr"),
        when(col("qn2") === 0L || col("cn2") === 0L, 0.0)
          .otherwise(round(adot.cast("double") / aden, 6)).as("s8"))
    val short = Relational.topKScored(cand, col("qid"), col("s8"),
        col("nbr"), k * shortlistFactor, idName = "nbr",
        scoreName = "s8")
      .select("qid", "nbr")
    // rescore fetch: shortlist is |queries|·(k·sf) rows — broadcast
    // both joins, the corpus streams (quantizedTopK's shape)
    val rescored = c.select(col("nbr"), col("v"))
      .join(broadcast(short), "nbr")
      .join(broadcast(q.select(col("qid"), col("qv"))), "qid")
    val dn = l2norm(col("qv")) * l2norm(col("v"))
    val cos = when(dn === 0.0, 0.0).otherwise(dot(col("qv"), col("v")) / dn)
    Relational.topKScored(
      rescored.select(col("qid"), col("nbr"), round(cos, 6).as("score")),
      col("qid"), col("score"), col("nbr"), k, idName = "nbr")
  }

  /** IVF-PQ with RESIDUAL encoding — the FAISS index architecture
    * (Jégou et al. 2011 §IV): coarse k-means routes every vector to a
    * Voronoi list ([[kmeansCentroids]], the IVF trainer), and PQ
    * codebooks are trained on the RESIDUALS v − c(v) (residuals
    * concentrate near zero, so the same ksub codes quantize far more
    * finely than raw-vector PQ). A query probes its `nProbe` nearest
    * lists and ranks candidates by approximate cosine computed
    * ENTIRELY from integer lookups:
    *
    *   dot(q, c + r)  = qc(list)            [per probed list]
    *                  + Σⱼ dtab(j)(codeⱼ)    [query dot-table, list-free]
    *   ‖c + r‖²       = Σⱼ ( cN2(list)(j) + 2·cross(list)(j)(codeⱼ)
    *                         + n2(j)(codeⱼ) )
    *
    * — subspaces are disjoint coordinates, so the reconstruction norm
    * decomposes exactly per subspace; cross/cN2/n2 are tiny driver
    * literals (nLists·m·ksub longs). One rounded division produces
    * the shortlist score; a deterministic shortlist is rescored with
    * exact double cosine ([[quantizedTopK]]'s contract).
    *
    * Scale shape: the scored fraction is ~nProbe/nLists of the corpus
    * AND each comparison is m lookups — the two multiplicative wins
    * composed; the corpus scan reads list + m codes (32–64× fewer
    * bytes), floats only for the shortlist rows. All arithmetic is
    * exact integer until two float steps (the score division, the
    * rescore), so the oracle replays coarse-train → route → residual
    * → PQ-train → encode → tables → shortlist → rescore bit-for-bit.
    * Above `trainTarget` corpus rows BOTH trainers see only a
    * deterministic arithmetic sample (see the encode-side comment):
    * cold-build cost stops scaling with the corpus while route and
    * encode still cover every row; below it the sample IS the corpus,
    * so small-scale results (and the q423/q425 oracles) are
    * unchanged. Returns (qid, nbr, score, rank). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                id: Column, vec: Column, qid: Column, qvec: Column,
                k: Int, nLists: Int = 8, nProbe: Int = 2, m: Int = 8,
                ksub: Int = 8, iters: Int = 1,
                shortlistFactor: Int = 4,
                trainedCoarse: Option[Seq[Seq[Double]]] = None,
                trainTarget: Long = 65536L)
      : DataFrame = {
    require(k >= 1 && nProbe >= 1 && shortlistFactor >= 1,
      s"ivfPqTopK: k=$k nProbe=$nProbe sf=$shortlistFactor must be >= 1")
    ivfPqEncode(corpus, id, vec, nLists, m, ksub, iters,
        trainedCoarse, trainTarget) match {
      case None =>
        queries.select(qid.as("qid")).limit(0)
          .crossJoin(corpus.select(id.as("nbr")).limit(0))
          .withColumn("score", lit(0.0)).withColumn("rank", lit(0))
      case Some((cents, books, enc)) =>
        val q = pqQuerySide(queries, qid, qvec, cents, books, nProbe)
        val adot = col("qc") + (0 until m).map(j =>
            element_at(element_at(col("dtab"), j + 1),
                       element_at(col("codes"), j + 1) + 1))
          .reduce(_ + _)
        val aden = sqrt(col("qn2").cast("double")) *
                   sqrt(col("cn2").cast("double"))
        val cand = enc.join(
            broadcast(q.select(col("qid"), col("dtab"), col("qn2"),
              col("list"), col("qc"))),
            Seq("list"))
          .filter(col("nbr") =!= col("qid"))
          .select(col("qid"), col("nbr"),
            when(col("qn2") === 0L || col("cn2") <= 0L, 0.0)
              .otherwise(round(adot.cast("double") / aden, 6)).as("s8"))
        val short = Relational.topKScored(cand, col("qid"), col("s8"),
            col("nbr"), k * shortlistFactor, idName = "nbr",
            scoreName = "s8")
          .select("qid", "nbr")
        val rescored = enc.select(col("nbr"), col("v"))
          .join(broadcast(short), "nbr")
          .join(broadcast(q.select(col("qid"), col("qv")).distinct()),
            "qid")
        val dn = l2norm(col("qv")) * l2norm(col("v"))
        val cos = when(dn === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("v")) / dn)
        Relational.topKScored(
          rescored.select(col("qid"), col("nbr"),
            round(cos, 6).as("score")),
          col("qid"), col("score"), col("nbr"), k, idName = "nbr")
    }
  }

  /** Shared IVF-PQ index build: coarse train (unless supplied), route,
    * residual-codebook train, encode. Returns (coarse centroids,
    * residual codebooks, encoded corpus (nbr, v, list, codes, cn2))
    * — None on a degenerate (empty) corpus. The routed corpus is
    * localCheckpointed ONCE: the coarse assignment is nLists cosines
    * per row (the expensive pass at a real list count) and it feeds
    * the residual-seed collect, the Lloyd update pass AND the encode
    * — recomputing it per consumer was a 5x blowup at the
    * 500k/256-list decade probe (250 s → 88 s). */
  private def ivfPqEncode(corpus: DataFrame, id: Column, vec: Column,
                          nLists: Int, m: Int, ksub: Int, iters: Int,
                          trainedCoarse: Option[Seq[Seq[Double]]],
                          trainTarget: Long = 65536L)
      : Option[(Seq[Seq[Double]], Seq[Seq[Seq[Long]]], DataFrame)] = {
    val base = Dedup.fanOut(corpus)
      .select(id.as("nbr"), toDouble(vec).as("v"))
      .filter(col("v").isNotNull)
    // TRAINING SAMPLE (the 100 TB cold-build lever): k-means cost is
    // O(rows·k·d·iters) for the coarse trainer and O(rows·ksub·d·iters)
    // for the PQ books — at the 500k/256-list decade probe, training
    // dominated the 88 s cold build. Both trainers therefore see only
    // the deterministic MINSTD-residue sample (the q450/q73/q87
    // arithmetic-hash idiom): rows whose ((id+1)·48271 mod 2^31−1)
    // mod sm == 0, sm = max(1, n div trainTarget) — ~trainTarget
    // training rows at ANY corpus size. ROUTE + ENCODE still cover the
    // full corpus (they are the index). Below trainTarget rows sm = 1:
    // the sample IS the corpus, so small-scale results and the
    // q423/q425 exact-replay oracles are unchanged; `OpsSpec` pins
    // >=90% brute-force agreement for a genuinely sampled build.
    // Sampling needs a long-castable id — a corpus of string ids must
    // pass trainedCoarse or raise trainTarget (fail-fast below).
    val n = base.count()
    val sm = math.max(1L, n / trainTarget)
    def sampled(df: DataFrame, idc: Column): DataFrame =
      if (sm == 1L) df
      else df.filter(
        (((idc.cast("long") + 1L) * 48271L) % 2147483647L) % sm === 0L)
    val cents = trainedCoarse.getOrElse(
      kmeansCentroids(sampled(corpus, id), id, vec, nLists, iters))
    if (cents.isEmpty && n > 0L && trainedCoarse.isEmpty && sm > 1L)
      throw new IllegalArgumentException(
        "ivfPq: training sample is empty — sampling requires a " +
        "long-castable id; pass trainedCoarse or raise trainTarget")
    if (cents.isEmpty) return None
    // the trainer's centroids ARE integer micro-units divided by 1e6;
    // multiply back (exact) for the residual arithmetic
    val cq: Seq[Seq[Long]] =
      cents.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))
    val cqLit = typedlit(cq)
    val assigned = base
      .withColumn("q", microQ(col("v")))
      .withColumn("list",
        element_at(nearestCentroids(cents, col("v"), 1), 1))
      .withColumn("rq", zip_with(col("q"),
        element_at(cqLit, col("list") + 1), (a, b) => a - b))
      .cut()
    val books = pqCodebooksFromQ(
      sampled(assigned, col("nbr"))
        .select(col("nbr").as("id"), col("rq").as("q")),
      m, ksub, iters)
    if (books.isEmpty) return None
    val sub = books.head.head.size
    val kk = books.head.size
    val lits = books.map(b => typedlit(b))
    // driver-side integer tables (all magnitudes < 2^53):
    //   n2(j)(c)          = ‖codebook entry‖²
    //   cN2(list)(j)      = ‖centroid subvector‖²
    //   cross(list)(j)(c) = centroid_j · codebook entry
    val n2s = books.map(_.map(cb => cb.map(x => x * x).sum))
    val cN2 = cq.map(cv => (0 until m).map(j =>
      (0 until sub).map(d => { val x = cv(j * sub + d); x * x }).sum))
    val cross = cq.map(cv => (0 until m).map(j => books(j).map(cb =>
      (0 until sub).map(d => cv(j * sub + d) * cb(d)).sum)))
    val n2Lit = n2s.map(typedlit(_))
    val cN2Lit = typedlit(cN2.map(_.toIndexedSeq))
    val crossLit = typedlit(cross.map(_.map(_.toIndexedSeq).toIndexedSeq))
    val enc = assigned
      .withColumn("codes", array((0 until m).map(j =>
        pqAssign(col("rq"), lits(j), j, sub, kk)): _*))
      .withColumn("cn2", (0 until m).map(j =>
          element_at(element_at(cN2Lit, col("list") + 1), j + 1) +
          lit(2L) * element_at(element_at(element_at(crossLit,
            col("list") + 1), j + 1),
            element_at(col("codes"), j + 1) + 1) +
          element_at(n2Lit(j), element_at(col("codes"), j + 1) + 1))
        .reduce(_ + _))
      .select(col("nbr"), col("v"), col("list"), col("codes"), col("cn2"))
    Some((cents, books, enc))
  }

  /** Query-side IVF-PQ frame: micro-quantized query, residual-codebook
    * dot tables (list-independent), exact norm², probed lists with
    * their centroid dots. Shared by [[ivfPqTopK]] and the packed/
    * streaming probe. */
  private def pqQuerySide(queries: DataFrame, qid: Column, qvec: Column,
                          cents: Seq[Seq[Double]],
                          books: Seq[Seq[Seq[Long]]],
                          nProbe: Int): DataFrame = {
    val m = books.size
    val sub = books.head.head.size
    val kk = books.head.size
    val lits = books.map(b => typedlit(b))
    val cq: Seq[Seq[Long]] =
      cents.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))
    val cqLit = typedlit(cq)
    queries.select(qid.as("qid"), toDouble(qvec).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qq", microQ(col("qv")))
      .withColumn("dtab", array((0 until m).map(j =>
        transform(sequence(lit(0), lit(kk - 1)), i =>
          pqSubDot(col("qq"), lits(j), j, sub, i))): _*))
      .withColumn("qn2",
        aggregate(col("qq"), lit(0L).cast("long"), (acc, x) => acc + x * x))
      .withColumn("list",
        explode(nearestCentroids(cents, col("qv"), nProbe)))
      .withColumn("qc", aggregate(
        zip_with(col("qq"), element_at(cqLit, col("list") + 1),
          (a, b) => a * b),
        lit(0L).cast("long"), (acc, x) => acc + x))
      .select(col("qid"), col("qv"), col("qq"), col("dtab"),
              col("qn2"), col("list"), col("qc"))
  }

  /** IVF-PQ index packed for stream-static ANN ([[ivfPack]]'s shape
    * with PQ payloads): one row per list,
    * `(list, postings: array<struct<nbr, codes, cn2, v>>)`. The float
    * vectors ride along ONLY for the in-row exact rescore; a
    * rescore-free deployment drops `v` for the full 32-64x byte cut.
    * Returns (centroids, codebooks, packed). */
  def ivfPqPack(corpus: DataFrame, id: Column, vec: Column,
                nLists: Int = 8, m: Int = 8, ksub: Int = 8,
                iters: Int = 1,
                trainedCoarse: Option[Seq[Seq[Double]]] = None,
                trainTarget: Long = 65536L)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Long]]], DataFrame) =
    ivfPqEncode(corpus, id, vec, nLists, m, ksub, iters,
        trainedCoarse, trainTarget) match {
      case None => (Nil, Nil, corpus.sparkSession.emptyDataFrame)
      case Some((cents, books, enc)) =>
        (cents, books, enc
          .groupBy("list")
          .agg(collect_list(struct(col("nbr"), col("codes"),
            col("cn2"), col("v"))).as("postings")))
    }

  /** Probe side of [[ivfPqPack]]: route each query to its nearest
    * list (nProbe = 1), equi-join the packed index, ADC-rank the
    * postings INSIDE the row, rescore the in-row shortlist with exact
    * cosine — no aggregation anywhere, so the whole plan is stateless
    * and runs unchanged on a Structured Streaming query frame in
    * append mode (the [[ivfTopKPacked]] contract, with PQ scoring).
    * Ranking is bit-identical to [[ivfPqTopK]] at nProbe = 1 given
    * the same centroids (`StreamingSpec` pins it).
    * Returns (qid, nbr, score, rank). */
  def ivfPqTopKPacked(queries: DataFrame, cents: Seq[Seq[Double]],
                      books: Seq[Seq[Seq[Long]]], packed: DataFrame,
                      qid: Column, qvec: Column, k: Int,
                      shortlistFactor: Int = 4): DataFrame = {
    require(k >= 1 && shortlistFactor >= 1,
      s"ivfPqTopKPacked: k=$k sf=$shortlistFactor must be >= 1")
    require(cents.nonEmpty && books.nonEmpty,
      "ivfPqTopKPacked: empty index")
    val m = books.size
    val q = pqQuerySide(queries, qid, qvec, cents, books, nProbe = 1)
    def adotOf(p: Column): Column =
      col("qc") + (0 until m).map(j =>
        element_at(element_at(col("dtab"), j + 1),
                   element_at(p.getField("codes"), j + 1) + 1))
        .reduce(_ + _)
    def s8Of(p: Column): Column =
      when(col("qn2") === 0L || p.getField("cn2") <= 0L, 0.0)
        .otherwise(round(adotOf(p).cast("double") /
          (sqrt(col("qn2").cast("double")) *
           sqrt(p.getField("cn2").cast("double"))), 6))
    q.join(packed, Seq("list"))
      .withColumn("short", slice(array_sort(transform(
          filter(col("postings"), p => p.getField("nbr") =!= col("qid")),
          p => struct((-s8Of(p)).as("neg"),
                      p.getField("nbr").as("nbr"),
                      p.getField("v").as("v")))),
        1, k * shortlistFactor))
      .withColumn("top", slice(array_sort(transform(col("short"), s =>
          struct((-round(cosine(col("qv"), s.getField("v")), 6))
                   .as("neg"),
                 s.getField("nbr").as("nbr")))), 1, k))
      .select(col("qid"), posexplode(col("top")).as(Seq("__pos", "__e")))
      .select(col("qid"), col("__e.nbr").as("nbr"),
              (-col("__e.neg")).as("score"),
              (col("__pos") + 1).cast("int").as("rank"))
  }
}
