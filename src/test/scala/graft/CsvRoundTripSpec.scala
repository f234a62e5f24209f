package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Merge

/** CSV parity with the reference's sink format: schema-explicit write →
  * read round-trip, and the full S7 merge-then-overwrite cycle over CSV. */
class CsvRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("name", StringType),
    StructField("bal", DoubleType)))

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft-csv").toString + "/t"

  test("csv write → schema-explicit read round-trips") {
    val path = tmp()
    val rows = Seq((1L, "a", 1.5), (2L, "with,comma", -2.25),
      (3L, "with \"quote\"", 0.0))
    Tables.writeCsv(rows.toDF("k", "name", "bal"), path)
    val back = Tables.loadCsv(spark, path, schema)
      .as[(Long, String, Double)].collect().sorted
    assert(back === rows.sorted.toArray)
  }

  test("S7 over CSV: merge + overwrite is idempotent") {
    val path = tmp()
    Tables.writeCsv(Seq((1L, "a", 1.0)).toDF("k", "name", "bal"), path)
    val incoming = Seq((1L, "NEW", 9.0), (2L, "b", 2.0)).toDF("k", "name", "bal")
    def pass(): Unit = {
      val merged = Merge.firstWinsMerge(
        Tables.loadCsv(spark, path, schema), incoming, "k").cache()
      merged.count()
      Tables.writeCsv(merged, path)
      merged.unpersist()
    }
    pass(); pass()
    val out = Tables.loadCsv(spark, path, schema)
      .as[(Long, String, Double)].collect().sorted
    assert(out === Array((1L, "a", 1.0), (2L, "b", 2.0)))
  }
}
