package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's previous-record parse — the input to the
  * regression re-run rule. The r15 lesson made this parse
  * load-bearing: a phantom minimum inherited from a contended sweep
  * masks real regressions, so the contended-drop behavior is a
  * correctness property of the HARNESS and gets the same spec
  * treatment as an operator. */
class BenchSpec extends AnyFunSuite {

  test("family partition: subtotals cover the registry exactly, sum " +
    "to the total, and failed queries count in neither family") {
    val names = SparkEntry.queries.keySet.toSeq.sorted
    // the partition is real on the actual gate surface — both
    // families are non-empty, and stream means exactly q_stream_*
    assert(names.exists(Bench.isStream))
    assert(names.exists(n => !Bench.isStream(n)))
    names.foreach(n =>
      assert(Bench.isStream(n) == n.startsWith("q_stream_"), n))
    val results = names.map(n => (n, 1.0))
    val (s, ns, cs, cns) = Bench.familyTotals(results)
    assert(cs + cns == names.size)
    assert(math.abs(s + ns - names.size) < 1e-9)
    assert(math.abs(s - cs) < 1e-9 && math.abs(ns - cns) < 1e-9)
    // a failed query (-1 sentinel) is absent from the total, so it
    // must be absent from both subtotals too
    val withFailed = (names.head, -1.0) +: results.tail
    val (s2, ns2, cs2, cns2) = Bench.familyTotals(withFailed)
    assert(cs2 + cns2 == names.size - 1)
    assert(math.abs(s2 + ns2 - (names.size - 1)) < 1e-9)
  }

  test("plain record parses into per-query minima") {
    val txt = """{"metric":"total","value":9.99,"unit":"sec",""" +
      """"queries":{"q_a":1.25,"q_b":0.5,"q_c":-1},"sf":"sf0.1"}"""
    assert(Bench.parsePrevMinima(txt) ==
      Map("q_a" -> 1.25, "q_b" -> 0.5, "q_c" -> -1.0))
  }

  test("a record in the r20 families format round-trips through both " +
    "parsers (the reader must keep up with what the writer emits)") {
    // the exact field ORDER Bench.main writes, families included —
    // a future writer reordering that puts another object before
    // `queries` would break the substring parse, and this is the test
    // that must catch it
    val txt = """{"metric":"total","value":160.58,"unit":"sec",""" +
      """"queries":{"q_a":1.25,"q_stream_b":0.5},""" +
      """"queries_median":{"q_a":1.3,"q_stream_b":0.6},""" +
      """"families":{"stream_sec":0.5,"non_stream_sec":1.25,""" +
      """"n_stream":1,"n_non_stream":1},""" +
      """"contended":[],""" +
      """"calibration":{"baseline_sec":0.42,"prev_baseline_sec":0.41,""" +
      """"suspect_vs_prev":false,"worst_probe_sec":0.67,"factor":2,""" +
      """"n_marked":0,"n_recovered":0,"probes":[0.42]},"sf":"sf0.1"}"""
    assert(Bench.parsePrevMinima(txt) ==
      Map("q_a" -> 1.25, "q_stream_b" -> 0.5))
    assert(Bench.parsePrevBaseline(txt).contains(0.42))
  }

  test("contended-flagged entries are DROPPED, not inherited") {
    val txt = """{"metric":"total","value":9.99,"unit":"sec",""" +
      """"queries":{"q_a":10.53,"q_b":0.5},""" +
      """"queries_median":{"q_a":26.88,"q_b":0.6},""" +
      """"contended":["q_a"],""" +
      """"calibration":{"baseline_sec":0.4},"sf":"sf0.1"}"""
    val prev = Bench.parsePrevMinima(txt)
    assert(!prev.contains("q_a"),
      "a contended phantom minimum survived as a regression reference")
    assert(prev == Map("q_b" -> 0.5))
  }

  test("empty contended list drops nothing") {
    val txt = """{"queries":{"q_a":1},"contended":[],"sf":"x"}"""
    assert(Bench.parsePrevMinima(txt) == Map("q_a" -> 1.0))
  }

  test("malformed text throws (caller maps it to 'no previous record')") {
    intercept[Exception] { Bench.parsePrevMinima("not json at all") }
    intercept[Exception] { Bench.parsePrevMinima("""{"queries":""") }
  }

  test("previous baseline parses from the calibration field") {
    val txt = """{"queries":{"q_a":1},"contended":[],""" +
      """"calibration":{"baseline_sec":0.41,"worst_probe_sec":1.1,""" +
      """"probes":[0.41,0.45]},"sf":"sf0.1"}"""
    assert(Bench.parsePrevBaseline(txt) == Some(0.41))
  }

  test("pre-guard record (no calibration) yields no baseline") {
    assert(Bench.parsePrevBaseline("""{"queries":{"q_a":1},"sf":"x"}""").isEmpty)
  }

  test("prev_baseline_sec in a record does not shadow baseline_sec") {
    // r17 records carry both; the opening-quote in the search key must
    // keep matching the calibration's own baseline, whatever the order
    val txt = """{"calibration":{"prev_baseline_sec":0.99,""" +
      """"baseline_sec":0.41}}"""
    assert(Bench.parsePrevBaseline(txt) == Some(0.41))
  }

  // The probe-normalized regression reference: prevMin re-expressed in
  // the current box's seconds. The judge-set acceptance pair — a
  // slower box with unchanged code must trigger ZERO regression
  // re-runs, a genuinely 3×-regressed query must still trigger.
  test("a 1.3×-slower box with unchanged code trips no regression re-run") {
    val prevMin = 2.0; val prevBase = Some(0.40); val curBase = 0.52 // 1.3×
    val ref = Bench.regressionReference(prevMin, prevBase, curBase)
    assert(math.abs(ref - 2.6) < 1e-9)
    // unchanged code on the slower box measures ~1.3× prev, plus the
    // documented ±35% ambient band — even the band's top edge stays
    // under RegressionFactor × the normalized reference
    val measured = prevMin * 1.3 * 1.35
    assert(measured <= ref * Bench.RegressionFactor,
      "environment (box speed × ambient band) read as a code regression")
    // while the same measurement vs the UN-normalized reference shows
    // why the raw rule was wrong once ambient noise stacks on box speed
    val atBandEdge = prevMin * 1.3 * 2.4 // a tail-case contended window
    assert(atBandEdge > prevMin * Bench.RegressionFactor &&
      atBandEdge <= ref * Bench.RegressionFactor * 1.6)
  }

  test("a genuine 3× regression on an unchanged box still trips") {
    val prevMin = 2.0; val prevBase = Some(0.40); val curBase = 0.40
    val ref = Bench.regressionReference(prevMin, prevBase, curBase)
    assert(ref == prevMin) // same box → same reference
    assert(prevMin * 3.1 > ref * Bench.RegressionFactor)
  }

  test("missing or non-positive baselines fall back to the raw minimum") {
    assert(Bench.regressionReference(2.0, None, 0.5) == 2.0)
    assert(Bench.regressionReference(2.0, Some(0.0), 0.5) == 2.0)
    assert(Bench.regressionReference(2.0, Some(-1.0), 0.5) == 2.0)
    assert(Bench.regressionReference(2.0, Some(0.4), 0.0) == 2.0)
  }

  // ---- recoverOne: the multi-attempt contended-recovery bracket ----

  private def cleanUnder(thr: Double): Double => Boolean = _ <= thr

  test("a planted-contended query recovers on the SECOND bracket after " +
    "a settle (the r18 nine-still-flagged failure mode)") {
    // probe samples: first bracket dirty (1.2 then 1.1), second clean
    val probes = Iterator(1.2, 1.1, 0.4, 0.45)
    var measured = 0
    var settled = 0
    val (outcome, samples) = Bench.recoverOne(
      firstPassMin = 5.0,
      attempts = 2,
      measure = () => { measured += 1; Seq(3.0 + measured, 2.0 + measured) },
      probe = () => probes.next(),
      clean = cleanUnder(0.5),
      settle = () => settled += 1)
    assert(measured == 2 && settled == 1, "retry must settle exactly once")
    assert(samples == Seq(1.2, 1.1, 0.4, 0.45),
      "every bracket probe joins the environment trace")
    outcome match {
      case Bench.RecoveryOutcome.Recovered(timings, overallMin) =>
        assert(timings == Seq(5.0, 4.0)) // the CLEAN rerun's evidence
        // overall min spans first pass AND both reruns (additive
        // noise: the dirty first rerun's 3.0 is still a valid minimum)
        assert(overallMin == 3.0)
      case other => fail(s"expected Recovered, got $other")
    }
  }

  test("first bracket already clean: one attempt, no settle") {
    var settled = 0
    val (outcome, samples) = Bench.recoverOne(
      firstPassMin = 9.0,
      attempts = 2,
      measure = () => Seq(2.0, 2.5),
      probe = () => 0.3,
      clean = cleanUnder(0.5),
      settle = () => settled += 1)
    assert(settled == 0)
    assert(samples.length == 2)
    assert(outcome == Bench.RecoveryOutcome.Recovered(Seq(2.0, 2.5), 2.0))
  }

  test("never-clean brackets ship StillDirty with the best min seen " +
    "(publish the evidence, keep the flag)") {
    val (outcome, samples) = Bench.recoverOne(
      firstPassMin = 6.0,
      attempts = 2,
      measure = () => Seq(4.0),
      probe = () => 2.0,
      clean = cleanUnder(0.5),
      settle = () => ())
    assert(samples.length == 4)
    assert(outcome == Bench.RecoveryOutcome.StillDirty(4.0))
  }

  test("a crash during ANY recovery attempt fails the query outright — " +
    "no honest timing, whatever the bracket said") {
    var calls = 0
    val (outcome, _) = Bench.recoverOne(
      firstPassMin = 6.0,
      attempts = 2,
      measure = () => { calls += 1; if (calls == 2) Seq.empty else Seq(4.0) },
      probe = () => 2.0, // dirty → forces the second attempt
      clean = cleanUnder(0.5),
      settle = () => ())
    assert(calls == 2)
    assert(outcome == Bench.RecoveryOutcome.Crashed)
  }
}
