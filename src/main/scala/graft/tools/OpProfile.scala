package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-JOB profiler for a named SparkEntry query: runs the
  * query under a listener that records every Spark job's wall time and
  * call site, then prints the jobs sorted by cost plus the gaps (time
  * between jobs = driver-side work: planning, codegen, listing,
  * commit). The constant-factor hunt for the table-op chains needs to
  * know whether the seconds are task time, scheduling, or driver gaps
  * — this answers that without the UI. Usage:
  *   sbt "runMain graft.tools.OpProfile q578_tfuzz3 [q5xx ...]"
  */
object OpProfile {
  private final case class JobRec(id: Int, desc: String, site: String,
                                  start: Long, var end: Long = 0L,
                                  var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        val r = JobRec(js.jobId, desc, site, js.time)
        r.tasks = nTasks
        jobs.put(js.jobId, r)
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup identical to Bench
    try graft.SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    args.filter(graft.SparkEntry.queries.contains).foreach { name =>
      jobs.clear(); order.clear()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the last JobEnd land
      val recs = {
        import scala.jdk.CollectionConverters._
        order.asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      }
      val jobSecs = recs.map(r =>
        math.max(0L, r.end - r.start) / 1e3).sum
      println(f"[opprofile] ===== $name%s wall=$wall%.2f s " +
        f"jobs=${recs.size}%d jobTime=$jobSecs%.2f s " +
        f"gaps=${wall - jobSecs}%.2f s =====")
      // timeline with gaps
      var prevEnd = 0L
      recs.sortBy(_.start).foreach { r =>
        val gap = if (prevEnd == 0L) 0.0
          else math.max(0L, r.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, r.end)
        val dur = math.max(0L, r.end - r.start) / 1e3
        println(f"[opprofile]  job ${r.id}%4d dur=$dur%6.3f s " +
          f"gapBefore=$gap%6.3f s tasks=${r.tasks}%4d " +
          f"site=${r.site.take(48)}%s desc=${r.desc.take(60)}%s")
      }
      // aggregate by call site
      println(s"[opprofile] ----- $name by site -----")
      recs.groupBy(_.site).map { case (s, rs) =>
        (s, rs.size, rs.map(r => math.max(0L, r.end - r.start)).sum / 1e3)
      }.toSeq.sortBy(-_._3).foreach { case (s, nn, secs) =>
        println(f"[opprofile]  $secs%7.3f s  n=$nn%3d  $s%s")
      }
    }
    spark.stop()
  }
}
