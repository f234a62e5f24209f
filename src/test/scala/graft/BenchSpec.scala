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
    val txt = """{"queries":{"q01_a":-1,"q02_b":0.5},"queries_detail":{"q01_a":{"min":-1,"mean":-1,"prev":null},"q02_b":{"min":0.4,"mean":0.7,"prev":0.9}}}"""
    val m = Bench.parseQueryTimes(txt)
    // q01_a failed → no baseline; q02_b's FLAT 0.5 wins over the detail's
    // min when both framings are present
    assert(m === Map("q02_b" -> 0.5))
  }

  test("front-truncated tail falls back to the detail {\"min\":…} framing") {
    // the driver's wrapper truncates the embedded stdout line from the
    // FRONT — BENCH_r07 shipped with the whole flat section cut off, and
    // round 8's prev-baseline silently parsed empty from it
    val txt = """{"n":7,"rc":0,"tail":"469,\"prev\":null},\"q24_ivf_topk\":{\"min\":0.2700,\"mean\":0.3264,\"prev\":null},\"q35_cosine_neardup\":{\"min\":0.6707,\"mean\":0.8391,\"prev\":null}"}"""
    val m = Bench.parseQueryTimes(txt)
    assert(m === Map("q24_ivf_topk" -> 0.27, "q35_cosine_neardup" -> 0.6707))
  }

  test("garbage degrades to empty, not an exception") {
    assert(Bench.parseQueryTimes("not json at all { : ") === Map.empty)
  }

  test("loadavg reads a non-negative 1-min load on this box") {
    // /proc/loadavg exists on every Linux the bench runs on; the method
    // must never throw and must parse the first field
    assert(Bench.loadavg() >= 0.0)
  }

  test("detail entries with load/reruns fields still don't double-count") {
    val txt = """{"queries":{"q02_b":0.5},"queries_detail":{"q02_b":{"min":0.5,"mean":0.7,"prev":0.9,"load":3.2,"reruns":1}},"loadavg_start":2.1}"""
    assert(Bench.parseQueryTimes(txt) === Map("q02_b" -> 0.5))
  }

  test("container calibration probes return plausible positive times " +
       "and are repeatable to the min-wins contract") {
    val cpu = Bench.probeMin(() => Bench.cpuProbeSec(), 3)
    val codec = Bench.probeMin(() => Bench.codecProbeSec(), 2)
    // 10^7 ALU iterations: microseconds would mean the loop was DCE'd,
    // >5 s would mean the probe itself is unusable as a yardstick
    assert(cpu > 0.0005 && cpu < 5.0, s"cpu probe out of range: $cpu")
    assert(codec > 0.001 && codec < 30.0, s"codec probe out of range: $codec")
  }
}
