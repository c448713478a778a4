package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's history-file readers — load-bearing since r14:
  * [[Bench.baselineTotal]] feeds the gate-aware extra-pass trigger (a
  * mis-parsed baseline silently disables the 2× protection, or worse,
  * triggers passes on every run), and the medians/same-code-mins
  * parsers drive the outlier-rerun and artifact-merge machinery. Pins:
  * first-line selection, sf filtering with the pre-"sf"-field default,
  * same-code fingerprint filtering, and the -1 (failed query) skip.
  */
class BenchHistorySpec extends AnyFunSuite {
  private def histFile(lines: String*): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("bench-hist", ".jsonl")
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p
  }

  private val sf01 = "/root/testdata/sf0.1"
  private val sf001 = "/root/testdata/sf0.01"

  test("baselineTotal: FIRST same-sf line wins; missing sf field means sf0.1") {
    val p = histFile(
      """{"metric":"total","value":51.99,"unit":"sec","queries":{"q1":1.0}}""",
      s"""{"metric":"total","value":80.0,"unit":"sec","queries":{"q1":2.0},"sf":"$sf01"}""",
      s"""{"metric":"total","value":9.5,"unit":"sec","queries":{"q1":0.5},"sf":"$sf001"}""")
    // line 1 has no "sf" field -> treated as sf0.1 (the r1/r2 format)
    assert(Bench.baselineTotal(p, sf01) == 51.99)
    // a different sf finds ITS first line, not the global first
    assert(Bench.baselineTotal(p, sf001) == 9.5)
    // no matching line / missing file -> -1 disables the gate trigger
    assert(Bench.baselineTotal(p, "/root/testdata/sf9") == -1.0)
    assert(Bench.baselineTotal(
      java.nio.file.Paths.get("/tmp/bench-hist-nope.jsonl"), sf01) == -1.0)
  }

  test("historyMedians: per-query median over same-sf lines, -1 runs skipped") {
    val p = histFile(
      s"""{"value":1,"queries":{"q1":1.0,"q2":-1},"sf":"$sf01"}""",
      s"""{"value":1,"queries":{"q1":3.0,"q2":0.4},"sf":"$sf01"}""",
      s"""{"value":1,"queries":{"q1":2.0},"sf":"$sf01"}""",
      s"""{"value":1,"queries":{"q1":99.0},"sf":"$sf001"}""") // other sf: excluded
    val m = Bench.historyMedians(p, sf01)
    assert(m("q1") == 2.0) // median of 1,3,2
    assert(m("q2") == 0.4) // the -1 failed run is not a sample
  }

  test("passTotalsJson: fixed 3-decimal array, one entry per pass (r15 artifact field)") {
    assert(Bench.passTotalsJson(Seq(106.5004, 92.1)) == "[106.500,92.100]")
    assert(Bench.passTotalsJson(Seq(51.99)) == "[51.990]")
  }

  test("extraPassReason: the r16 noise shape triggers the margin pass; " +
    "genuine slowness never earns passes") {
    // clean run — no extra pass
    assert(Bench.extraPassReason(50.0, 49.0, 51.99, Nil).isEmpty)
    // blown total vs best_known (the classic r6 trigger)
    assert(Bench.extraPassReason(80.0, 60.0, -1.0, Nil).nonEmpty)
    // inflated canaries
    assert(Bench.extraPassReason(50.0, 49.0, 51.99, Seq("p15_truncate")).nonEmpty)
    // THE r16 artifact shape (VERDICT r16 ask #3): 89.35 s recorded vs
    // ~79 s denoised on a 51.99 s baseline — 1.72x raw, under the 1.2x
    // best_known trigger (94.8) and the 2x gate (103.98), so a noisy
    // window became the number of record; the 1.7x margin now fires
    assert(Bench.extraPassReason(89.35, 79.0, 51.99, Nil).nonEmpty)
    // the r13 shape (2x gate breached, denoised under) still fires
    assert(Bench.extraPassReason(112.66, 94.1, 51.99, Nil).nonEmpty)
    // genuinely slow code — best_known ALSO over every line: reruns
    // cannot fix real cost, no passes are spent
    assert(Bench.extraPassReason(120.0, 115.0, 51.99, Nil).isEmpty)
    // no best_known (all queries failed / first ever run): no trigger
    assert(Bench.extraPassReason(80.0, -1.0, 51.99, Nil).isEmpty)
    // no baseline recorded: margin/gate triggers disabled, best_known
    // trigger still live
    assert(Bench.extraPassReason(89.35, 79.0, -1.0, Nil).isEmpty)
  }

  test("historySameCodeMins: only byte-identical-source same-sf runs merge") {
    val p = histFile(
      s"""{"value":1,"src":"aaaa","queries":{"q1":1.5,"q2":0.2},"sf":"$sf01"}""",
      s"""{"value":1,"src":"aaaa","queries":{"q1":0.9,"q2":-1},"sf":"$sf01"}""",
      s"""{"value":1,"src":"bbbb","queries":{"q1":0.1},"sf":"$sf01"}""", // other code
      s"""{"value":1,"src":"aaaa","queries":{"q1":0.2},"sf":"$sf001"}""") // other sf
    val m = Bench.historySameCodeMins(p, sf01, "aaaa")
    assert(m("q1") == 0.9) // min over the two aaaa@sf0.1 lines only
    assert(m("q2") == 0.2) // -1 skipped
    // unknown fingerprint -> empty (no cross-code merging, ever)
    assert(Bench.historySameCodeMins(p, sf01, "none").isEmpty)
  }
}
