package graft.tools

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only stage-by-stage profiler for the dedup pipelines. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")

    if (args.contains("q428")) { // BFS closeness cold/warm
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      def run(): Long = {
        val pairs = graft.ops.Graph.coOccurrencePairs(
          li.filter(col("l_quantity") >= 25),
          col("l_orderkey"), col("l_partkey"))
        val seeds = pairs.select(col("u").as("id"))
          .union(pairs.select(col("v").as("id")))
          .distinct().orderBy("id").limit(8)
        graft.ops.Graph.sampledCloseness(pairs, col("u"), col("v"),
          seeds, maxHops = 3).count()
      }
      time("q428 cold")(run())
      time("q428 warm")(run())
      time("q428 warm2")(run())
      spark.stop(); return
    }

    if (args.contains("r6")) { // round-6 ops: plan + timing audit
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val pq = graft.ops.Similarity.pqTopK(
        e, e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        col("vec_id"), col("embedding"), k = 5)
      println("==== q419 pqTopK plan ====")
      pq.explain("formatted")
      time("q419 pq cold")(pq.count())
      val ivfpq = graft.ops.Similarity.ivfPqTopK(
        e, e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
        col("vec_id"), col("embedding"), k = 5)
      println("==== q423 ivfPqTopK plan ====")
      ivfpq.explain("formatted")
      time("q423 ivfpq cold")(ivfpq.count())
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val pairs = graft.ops.Graph.coOccurrencePairs(
        li.filter(col("l_quantity") >= 25),
        col("l_orderkey"), col("l_partkey"))
      val lp = graft.ops.Graph.linkPrediction(pairs, col("u"), col("v"),
        topK = 40, maxDegree = 64, inputCanonical = true)
      time("q421 linkpred cold")(lp.count())
      println("==== q421 linkPrediction plan ====")
      lp.explain("formatted")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val sa = graft.ops.Sketches.kmvSketch(
        o.filter(col("o_orderdate") < lit("1998-01-01")),
        Seq(col("o_orderpriority")), col("o_custkey"), 64)
      val sb = graft.ops.Sketches.kmvSketch(
        o.filter(col("o_orderdate") >= lit("1998-01-01")),
        Seq(col("o_orderpriority")), col("o_custkey"), 64)
      val so = graft.ops.Sketches.kmvSetOps(sa, sb,
        Seq("o_orderpriority"), 64)
      time("q420 kmv cold")(so.count())
      println("==== q420 kmvSetOps plan ====")
      so.explain("formatted")
      val docs = d
      val g = graft.ops.Gif.decodeGifStatsDf(
        graft.ops.Gif.synthGif(docs.select(col("doc_id")), "doc_id"),
        "asset_id", "media")
      time("q422 gif cold")(g.count())
      spark.stop(); return
    }

    if (args.contains("q242")) { // prefix-filter stage profile
      import org.apache.spark.sql.expressions.Window
      val (tauNum, tauDen) = (6, 10)
      val id = col("doc_id"); val text = col("text")
      val toks = d
        .select(id.as("id"),
          sort_array(array_distinct(
            filter(tokens(text), t => t =!= ""))).as("ts"))
        .withColumn("n", size(col("ts")))
        .filter(col("n") > 0)
      time("toks count")(toks.count())
      val toksC = time("toks cut")(toks.cut())
      val sets = toksC.groupBy("ts")
        .agg(min(col("id")).as("sid"), first(col("n")).as("n"))
        .select(col("sid"), col("ts"), col("n"))
      val setsC = time("sets cut")(sets.cut())
      val docsMap = toksC.join(setsC.select(col("ts"), col("sid")), "ts")
        .select(col("sid"), col("id"))
      time("docsMap count")(docsMap.count())
      val ex = setsC.select(col("sid"), col("n"),
        explode(col("ts")).as("tk"))
      val freq = ex.groupBy("tk").agg(count(lit(1)).as("tf"))
      time("freq count")(freq.count())
      val w = Window.partitionBy("sid").orderBy(col("tf"), col("tk"))
      val prefix = ex.join(freq, "tk")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <=
          expr(s"n - (($tauNum * n + ${tauDen - 1}) div $tauDen) + 1"))
        .select("sid", "tk", "rn", "n")
      val prefixC = time("prefix cut")(prefix.cut())
      val alpha = expr(
        s"($tauNum * (na + nb) + $tauNum + $tauDen - 1) div " +
        s"${tauNum + tauDen}")
      val cand = prefixC.as("a")
        .join(prefixC.as("b"),
          col("a.tk") === col("b.tk") && col("a.sid") < col("b.sid") &&
          col("a.n") * tauDen >= col("b.n") * tauNum &&
          col("b.n") * tauDen >= col("a.n") * tauNum)
        .select(col("a.sid").as("sid1"), col("b.sid").as("sid2"),
          col("a.rn").as("ra"), col("b.rn").as("rb"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .groupBy("sid1", "sid2", "na", "nb")
        .agg(count(lit(1)).as("pm"),
          max(col("ra")).as("mra"), max(col("rb")).as("mrb"))
        .filter(col("pm") +
          least(col("na") - col("mra"), col("nb") - col("mrb"))
          >= alpha)
        .select("sid1", "sid2", "na", "nb")
      time("cand count")(cand.count())
      val candC = cand.cut()
      val cross = candC
        .join(setsC.select(col("sid").as("sid1"), col("ts").as("t1")),
          "sid1")
        .join(setsC.select(col("sid").as("sid2"), col("ts").as("t2")),
          "sid2")
        .withColumn("co", size(array_intersect(col("t1"), col("t2"))))
        .filter(col("co") * tauDen >=
          (col("na") + col("nb") - col("co")) * tauNum)
      time("cross count")(cross.count())
      time("full q242")(graft.ops.Dedup.prefixFilterPairs(
        d, col("doc_id"), col("text"), 6, 10).count())
      time("full q242 again")(graft.ops.Dedup.prefixFilterPairs(
        d, col("doc_id"), col("text"), 6, 10).count())
      spark.stop(); return
    }

    if (args.contains("cc")) {  // connected-components phase profile
      val pairs = time("lsh pairs materialize")(
        graft.ops.Dedup.minhashLshPairs(d, col("doc_id"), col("text"), 0.6)
          .cut())
      println(s"[profile] n pairs = ${pairs.count()}")
      val cc = time("components total")(
        graft.ops.Dedup.connectedComponents(pairs, col("id1"), col("id2")))
      println(s"[profile] n labeled = ${cc.count()}")
      val cc2 = time("components warm")(
        graft.ops.Dedup.connectedComponents(pairs, col("id1"), col("id2")))
      val drop = cc2.filter(col("id") =!= col("comp"))
      time("anti-join survivors")(
        d.join(drop.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
          .write.mode("overwrite").format("noop").save())
      spark.stop(); return
    }

    val sh = d.repartition(32)
      .select(col("doc_id").as("id"), shingles(col("text"), 3).as("sh"))
    time("shingles count")(sh.count())
    val sig = sh.filter(size(col("sh")) > 0)
      .select(col("id"), minhashSignature(col("sh"), 128).as("sig"))
    time("signatures")(sig.count())
    val banded = sig
      .withColumn("band", explode(minhashBands(col("sig"), 32, 4)))
      .select(col("id"), col("band.band").as("band"), col("band.key").as("key"))
    banded.explain("formatted")
    time("banded")(banded.count())
    val bandedNoSig = sig
      .withColumn("band", explode(minhashBands(col("sig"), 32, 4)))
      .select(col("id"), col("band.band").as("band"))
    time("banded keep no sig-deps")(bandedNoSig.count())
    val justExplode = sig
      .withColumn("b", explode(sequence(lit(0), lit(31))))
      .select(col("id"), col("b"))
    time("plain explode 32x")(justExplode.count())
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val nc = time("candidates")(cand.count())
    println(s"[profile] n candidates = $nc")
    val verified = cand
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= 0.6)
    time("verified")(verified.count())
    time("full q22")(graft.ops.Dedup.minhashLshPairs(
      d, col("doc_id"), col("text"), tau = 0.6).count())
    time("q23 cold")(graft.ops.Dedup.simhashPairs(
      d, col("doc_id"), col("text"), tau = 0.6).count())
    time("q23 warm")(graft.ops.Dedup.simhashPairs(
      d, col("doc_id"), col("text"), tau = 0.6).count())
    time("q21 warm")(graft.ops.Dedup.jaccardPairs(
      d, col("doc_id"), col("text"), tau = 0.6).count())
    spark.stop()
  }
}
