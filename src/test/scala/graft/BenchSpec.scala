package graft

import org.scalatest.funsuite.AnyFunSuite

/** The prev-round parser must accept every framing a BENCH_r{N}.json has
  * actually shipped in: our own raw stdout line (bare quotes) and the
  * driver's wrapper, which embeds that line as an ESCAPED string under
  * "tail" (`\"qNN\":sec`). Round 4 shipped a parser that silently read
  * zero prevs from the escaped form — this spec keeps that from
  * recurring. */
class BenchSpec extends AnyFunSuite {

  test("parses the raw stdout framing") {
    val txt = """{"metric":"total","value":3.2,"unit":"sec","queries":{"q01_pricing_summary":1.175,"q30_top_orders":0.0846},"sf":"x"}"""
    val m = Bench.parseQueryTimes(txt)
    assert(m === Map("q01_pricing_summary" -> 1.175, "q30_top_orders" -> 0.0846))
  }

  test("parses the driver's escaped-tail framing") {
    val txt = """{"n":3,"rc":0,"tail":"\"queries\":{\"q01_pricing_summary\":2.316650583,\"q02_filter_project\":0.902911882}"}"""
    val m = Bench.parseQueryTimes(txt)
    assert(m === Map("q01_pricing_summary" -> 2.316650583,
                     "q02_filter_project" -> 0.902911882))
  }

  test("failed (-1) entries are dropped, detail objects don't double-count") {
    val txt = """{"queries":{"q01_a":-1,"q02_b":0.5},"queries_detail":{"q01_a":{"min":-1,"mean":-1,"prev":null},"q02_b":{"min":0.5,"mean":0.7,"prev":0.9}}}"""
    val m = Bench.parseQueryTimes(txt)
    // q01_a failed → no baseline; q02_b's flat 0.5 wins (the detail's
    // value starts with '{' and never matches the number pattern)
    assert(m === Map("q02_b" -> 0.5))
  }

  test("garbage degrades to empty, not an exception") {
    assert(Bench.parseQueryTimes("not json at all { : ") === Map.empty)
  }
}
