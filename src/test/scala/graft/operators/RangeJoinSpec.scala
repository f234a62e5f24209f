package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic contract of [[Relational.rangeJoinBinned]]: the binned rewrite
  * must be row-identical to the naive theta join (`date BETWEEN win_start
  * AND win_end`) on every window shape — the plan changes (PlanSpec pins
  * the hash-join shape), the answer never may. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // windows deliberately cover the edge shapes: narrower than a bin,
  // EXACTLY a bin, spanning 3+ bins (wider than binDays), zero-width,
  // inverted (start > end — matches nothing), and overlapping each other
  // (a fact row matching two windows must appear twice, once per window)
  private val windows = Seq(
    (1L, d("2020-01-05"), d("2020-01-10")),   // inside one bin
    (2L, d("2020-01-01"), d("2020-01-30")),   // exactly bin-aligned
    (3L, d("2020-02-10"), d("2020-05-20")),   // spans 4 bins
    (4L, d("2020-03-03"), d("2020-03-03")),   // zero-width (single day)
    (5L, d("2020-04-20"), d("2020-04-01")),   // inverted → empty
    (6L, d("2020-01-08"), d("2020-02-12")))   // overlaps windows 1-3
    .toDF("win_id", "win_start", "win_end")

  // facts on and around every boundary above, plus far-away non-matches
  private val facts = (0 until 200).map { i =>
    (i.toLong, d(f"2020-${1 + i % 6}%02d-${1 + (i * 7) % 28}%02d"))
  }.toDF("fact_id", "od")

  test("binned range join == naive BETWEEN join on every window shape") {
    val binned = Relational.rangeJoinBinned(facts, "od", windows, binDays = 30)
      .select(col("fact_id"), col("win_id"))
    val naive = facts.join(windows,
        col("od").between(col("win_start"), col("win_end")))
      .select(col("fact_id"), col("win_id"))
    assert(binned.count() > 0, "fixture produced no matches")
    assert(binned.exceptAll(naive).count() === 0
        && naive.exceptAll(binned).count() === 0,
      "binned rewrite diverged from the naive theta join")
    // no duplicate (fact, window) pairs: a fact row carries exactly one
    // bin, so multi-bin windows must not multiply matches
    assert(binned.count() === binned.distinct().count(),
      "multi-bin window produced duplicate matches")
    // the overlap case really exercises multi-window matches
    val multi = naive.groupBy("fact_id").count().filter(col("count") > 1)
    assert(multi.count() > 0, "fixture has no overlapping-window matches")
  }

  test("inverted and empty windows match nothing, wide windows match across bins") {
    val binned = Relational.rangeJoinBinned(facts, "od", windows, binDays = 30)
    assert(binned.filter(col("win_id") === 5L).count() === 0,
      "inverted window matched rows")
    val wide = binned.filter(col("win_id") === 3L)
      .select(month(col("od"))).distinct().as[Int].collect().sorted
    assert(wide.length >= 3, s"4-bin window matched only months ${wide.toSeq}")
  }
}
