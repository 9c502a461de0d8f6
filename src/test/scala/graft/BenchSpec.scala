package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's previous-record parse — the input to the
  * regression re-run rule. The r15 lesson made this parse
  * load-bearing: a phantom minimum inherited from a contended sweep
  * masks real regressions, so the contended-drop behavior is a
  * correctness property of the HARNESS and gets the same spec
  * treatment as an operator. */
class BenchSpec extends AnyFunSuite {

  test("plain record parses into per-query minima") {
    val txt = """{"metric":"total","value":9.99,"unit":"sec",""" +
      """"queries":{"q_a":1.25,"q_b":0.5,"q_c":-1},"sf":"sf0.1"}"""
    assert(Bench.parsePrevMinima(txt) ==
      Map("q_a" -> 1.25, "q_b" -> 0.5, "q_c" -> -1.0))
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
}
