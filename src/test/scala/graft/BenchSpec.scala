package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function coverage of Bench's previous-artifact parsing — the
  * regression-gate input path that has to survive the driver's
  * escaped-and-head-truncated BENCH_r*.json artifacts.
  */
class BenchSpec extends AnyFunSuite {

  test("parsePrevQueries reads an intact queries map") {
    val line =
      """{"metric":"total","value":3.5,"unit":"sec","queries":{"q1":1.5,"q2":2.0},"errors":{},"sf":"x"}"""
    assert(Bench.parsePrevQueries(line) == Map("q1" -> 1.5, "q2" -> 2.0))
  }

  test("parsePrevQueries unescapes driver-wrapped artifacts") {
    val wrapped =
      """{"parsed":"{\"metric\":\"total\",\"queries\":{\"q1\":0.25}}"}"""
    assert(Bench.parsePrevQueries(wrapped)("q1") == 0.25)
  }

  test("head-truncated artifact recovers every query from the trailing t map") {
    // simulate the r5 failure: the head of the line (metric, value and
    // the alphabetically-first queries entries) is cut off; the
    // reversed trailing "t" map preserves them at the line's end
    val full =
      """{"metric":"total","value":9.9,"unit":"sec","queries":{"a1":1.0,"b2":2.0,"z9":3.0},"errors":{},"sf":"x","t":{"z9":3.0,"b2":2.0,"a1":1.0}}"""
    val truncated = full.substring(full.indexOf(""""z9":3.0}"""))
    val got = Bench.parsePrevQueries(truncated)
    assert(got("a1") == 1.0 && got("b2") == 2.0 && got("z9") == 3.0)
  }

  test("negative and exponent-formatted numbers parse; string errors don't") {
    val line =
      """{"queries":{"fast":4.5E-4,"failed":-1.0},"errors":{"failed":"boom"}}"""
    val got = Bench.parsePrevQueries(line)
    assert(got("fast") == 4.5e-4 && got("failed") == -1.0)
  }
}
