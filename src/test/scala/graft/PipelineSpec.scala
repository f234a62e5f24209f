package graft

import org.apache.spark.sql.functions._

/** End-to-end lifecycle: first pass fills the sink, a second pass over the
  * same frontier adds NOTHING (E3, the reference's resume-safe invariant),
  * parsers type every well-formed field, and the downstream analytics run
  * off the merged sink. */
class PipelineSpec extends SparkSpec {

  test("full pass: frontier → extract → merge; rerun is a no-op") {
    val sink0 = Pipeline.emptySink(spark)
    val sink1 = Pipeline.runIncrementalPass(spark, sink0).cache()
    val n1 = sink1.count()
    // 22 fetchable pages × (2 + i%5) detail links
    assert(n1 > 0)
    assert(sink1.select("url").distinct().count() === n1, "duplicate keys")
    // typed extraction: record parses everywhere, weight nulls only on the
    // injected '--' rows
    assert(sink1.filter(col("wins").isNull).count() === 0)
    assert(sink1.filter(col("last_fight_date").isNull).count() === 0)

    val sink2 = Pipeline.runIncrementalPass(spark, sink1)
    assert(sink2.count() === n1, "second pass changed the sink (E3 broken)")

    val summary = Pipeline.activeSummary(sink1, "1999-01-01")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.values.sum === n1)
    sink1.unpersist()
    ()
  }

  test("partial frontier: only missing keys are fetched and merged") {
    val full = Pipeline.runIncrementalPass(spark, Pipeline.emptySink(spark))
    val half = full.filter(col("url") < lit("site/fighter-details/m"))
    val refilled = Pipeline.runIncrementalPass(spark, half)
    assert(refilled.count() === full.count())
    // rows that were already in the half-sink are preserved untouched
    val kept = refilled.join(half, Seq("url"), "left_semi").count()
    assert(kept === half.count())
  }
}
