package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSv2 frontier source: partition planning (one split per page), the
  * skip-not-fail contract, and both pagination modes. */
class FrontierSourceSpec extends SparkSpec {

  private def read(mode: String, pages: Int = 3) =
    spark.read.format("graft.sources.FrontierSource")
      .option("mode", mode).option("pages", pages.toString).load()

  test("letters mode plans 26 input partitions") {
    assert(read("letters").rdd.getNumPartitions === 26)
  }

  test("pages mode plans N numbered partitions") {
    assert(read("pages", 5).rdd.getNumPartitions === 5)
    assert(read("pages", 5).select("page").distinct().count() === 4)
    // (page index 3 simulates retry exhaustion → no rows, job still green)
  }

  test("failed fetches skip pages without failing the scan") {
    val pages = read("letters").select("page").distinct().count()
    assert(pages === 22) // 26 letters minus indices 3,10,17,24
  }

  test("detail links and chaff both emitted; F1 filter separates them") {
    val df = read("letters")
    val total = df.count()
    val details = df.filter(col("url").contains("fighter-details")).count()
    assert(details * 2 === total, "expected 1:1 detail/chaff mix")
  }

  test("column pruning: url-only scan never materializes page/ord") {
    // goes through SupportsPushDownRequiredColumns; correctness of the
    // pruned read is the observable contract
    val urls = read("letters").select("url").distinct().count()
    assert(urls > 0)
    val schema = read("letters").select("url").queryExecution
      .executedPlan.toString
    assert(!schema.contains("ord"), s"ord survived pruning:\n$schema")
  }
}
