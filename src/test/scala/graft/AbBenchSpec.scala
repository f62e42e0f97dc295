package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the interleaved two-tree A/B bench (VERDICT r18 item 8). The
  * statistical claim (a real regression reads as a stable min ratio) is
  * exercised by actual adjudications recorded in BASELINE.md; this spec
  * pins the MECHANICS — child spawning from a compiled tree, JSON
  * plumbing, per-probe floor extraction — with an A/A run (both sides the
  * SAME tree) so any structural rot fails fast without depending on the
  * host's noise profile for a verdict assertion.
  */
class AbBenchSpec extends AnyFunSuite {

  test("probeSeconds reads the queries median — anchored past watch_mins — and rejects a missing probe") {
    // the real artifact emits watch_mins BEFORE queries and the A/B's
    // usual subjects ARE watch probes (review r19): the fixture plants a
    // DIFFERENT value there to prove the parser is anchored inside the
    // queries object, not first-match over the line
    val line = """{"metric":"total","watch_mins":{"q31_math_funcs":0.11},""" +
      """"queries":{"q31_math_funcs":0.42,"q01_pricing_summary":1.5},""" +
      """"queries_min":{"q31_math_funcs":0.40,"q01_pricing_summary":1.4}}"""
    assert(AbBench.probeSeconds(line, "q31_math_funcs") == 0.42)
    assert(AbBench.probeSeconds(line, "q01_pricing_summary") == 1.5)
    intercept[IllegalArgumentException](AbBench.probeSeconds(line, "q99_absent"))
    intercept[IllegalArgumentException](AbBench.probeSeconds("{}", "q31_math_funcs"))
  }

  test("A/A smoke: the same compiled tree on both sides produces a structurally-complete verdict line") {
    // this repo IS a compiled tree when the suite runs; two child bench
    // JVMs (one per side, sf0.001, one interleave) keep the smoke ~1 min
    val out = new java.io.ByteArrayOutputStream()
    val probes = Seq("q01_pricing_summary", "q31_math_funcs")
    Console.withOut(new java.io.PrintStream(out)) {
      AbBench.main(Array("/root/repo", "/root/repo", probes.mkString(","),
        "1", "/root/testdata/sf0.001"))
    }
    val line = out.toString("UTF-8").linesIterator
      .find(_.contains("\"metric\":\"ab_bench\"")).getOrElse("")
    assert(line.nonEmpty, s"no ab_bench JSON line in: ${out.toString.take(500)}")
    for (p <- probes)
      assert(line.contains(s""""$p":{"a_min":"""), s"probe $p missing: $line")
    // both floors measured (positive) on both sides; verdict is one of
    // the three defined values (NOT asserted ambient — single-rep ratios
    // on sub-second probes can cross the threshold on host noise, and a
    // flaky smoke would erode trust in the real adjudications)
    val mins = """"[ab]_min":([0-9.Ee+-]+)""".r.findAllMatchIn(line)
      .map(_.group(1).toDouble).toSeq
    assert(mins.size == 4 && mins.forall(_ > 0), s"bad floors in: $line")
    assert(List("ambient", "a_slower", "b_slower")
      .exists(v => line.endsWith(s""""verdict":"$v"}""")), line)
  }
}
