package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The partitioned-sink layout contract: writing with directory partition
  * keys must (a) round-trip rows exactly, (b) lay out one directory per
  * key value, and (c) make partition-key filters prune at PLANNING time —
  * visible as a populated `PartitionFilters` on the scan and a file count
  * smaller than the table's. Row-group pushdown (PushedFilters) is tested
  * in PlanSpec; this is the strictly stronger directory-level pruning only
  * a partitioned LAYOUT can give, the difference between scanning one day
  * and scanning 100 TB. */
class SinkLayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val sink: String = {
    val dir = Files.createTempDirectory("graft-partsink").toString + "/orders"
    val orders = Tables.orders(spark, sfDir)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    Tables.writePartitioned(orders, dir, Seq("month"))
    dir
  }

  test("partitioned write round-trips rows and lays out month directories") {
    val back = Tables.loadPartitioned(spark, sink)
    val orig = Tables.orders(spark, sfDir)
    assert(back.count() === orig.count())
    assert(back.select("o_orderkey").exceptAll(orig.select("o_orderkey"))
      .count() === 0)
    val dirs = new java.io.File(sink).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("month=\\d{4}-\\d{2}")),
      s"unexpected layout: ${dirs.toSeq}")
  }

  test("partition-key filter prunes directories at planning time") {
    val all = Tables.loadPartitioned(spark, sink)
    val one = all.filter(col("month") === "1996-03")
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s", "").contains("(month"),
      s"month predicate did not reach PartitionFilters:\n$p")
    // the pruned scan must plan strictly fewer files than the full scan
    def filesPlanned(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().foldLeft(0L) {
        case (acc, f: org.apache.spark.sql.execution.FileSourceScanExec) =>
          acc + f.selectedPartitions.totalNumberOfFiles
        case (acc, _) => acc
      }
    val prunedFiles = filesPlanned(one)
    val allFiles = filesPlanned(all)
    assert(prunedFiles > 0, "pruned scan planned no files")
    assert(prunedFiles < allFiles,
      s"no directory pruning: $prunedFiles of $allFiles files planned")
    // and the answer is still right
    assert(one.count() ===
      Tables.orders(spark, sfDir)
        .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1996-03")
        .count())
  }
}
