package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-parity pins: the r4 failure class where the bench artifact and
  * the correctness suite silently diverged (BENCH covered queries the
  * oracle never checked, and vice versa) must stay closed.
  *
  *  - every `SparkEntry.queries` entry has an `oracleSql` twin (the
  *    driver's hash gate covers the WHOLE registry, no rows-only
  *    stragglers);
  *  - the committed `BENCH_FULL.json` names exactly the registry (an
  *    unfiltered `graft.Bench` run regenerates it; `Bench` refuses to
  *    overwrite it from a SPARK_GRAFT_ONLY-filtered run).
  */
class ArtifactParitySpec extends AnyFunSuite {

  test("every query has an oracle (hash-gated, not rows-only)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val noOracle = q -- o
    val orphaned = o -- q
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("BENCH_FULL.json names exactly SparkEntry.queries") {
    val f = new java.io.File("BENCH_FULL.json")
    assert(f.exists(), "BENCH_FULL.json missing — run graft.Bench unfiltered")
    val content = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // the artifact is one JSON line; query names are the qNN_-prefixed
    // keys (top-level keys are metric/unit/sf/queries/value — "queries"
    // itself must not match, hence the digit anchor)
    val benched = "\"(q[0-9]+_[A-Za-z0-9_]*)\":".r
      .findAllMatchIn(content).map(_.group(1)).toSet
    val q = SparkEntry.queries.keySet
    assert(benched == q,
      s"unbenched: ${q -- benched}; stale in artifact: ${benched -- q}")
  }
}
