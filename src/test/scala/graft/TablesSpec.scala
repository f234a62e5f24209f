package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import scala.jdk.CollectionConverters._

/** Loader-level oracle: the r9 postmortem. The testdata regenerated with
  * `events.ts` as TIMESTAMP(MICROS) while the loader hard-assumed NANOS and
  * kept dividing by 1000 — every one of 167 tests passed because they all
  * consume `Tables.events` and inherit its (compressed) view of time; only
  * the DuckDB oracle at round end caught it. This spec closes that hole
  * with ground truth that does NOT flow through the loader: the parquet
  * footer's column statistics are raw int64 min/max written by the file's
  * producer, so `Tables.*` must reproduce them exactly, converted per the
  * footer's own declared unit. A future unit flip (either direction) now
  * fails here, loudly, at `sbt test` time.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** (minMicros, maxMicros, rowCount) for a timestamp column, straight from
    * the parquet footers — all files, all row groups. Unit conversion uses
    * the footer's logical-type annotation, never an assumption. */
  private def footerStatsMicros(path: String, column: String): (Long, Long, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(root)
    assert(files.nonEmpty, s"no parquet files at $path")
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var n = 0L
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val toMicros: Long => Long =
          r.getFooter.getFileMetaData.getSchema
            .getType(Array(column): _*).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case TimeUnit.MICROS => identity
                case TimeUnit.NANOS  => Math.floorDiv(_, 1000L)
                case TimeUnit.MILLIS => Math.multiplyExact(_, 1000L)
              }
            case other => fail(s"$column at $f is not a timestamp column: $other")
          }
        r.getFooter.getBlocks.asScala.foreach { block =>
          n += block.getRowCount
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(fail(s"no column chunk for $column in $f"))
          val st = chunk.getStatistics
          assert(st != null && st.hasNonNullValue,
            s"footer statistics missing for $column in $f — oracle impossible")
          mn = math.min(mn, toMicros(st.genericGetMin.asInstanceOf[java.lang.Long].longValue))
          mx = math.max(mx, toMicros(st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
        }
      } finally r.close()
    }
    (mn, mx, n)
  }

  private def loaderAgg(df: DataFrame, column: String): (Long, Long, Long) = {
    val row = df.agg(
      unix_micros(min(col(column))), unix_micros(max(col(column))),
      count(lit(1))).head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  private def assertLoaderMatchesFooter(df: DataFrame, table: String,
                                        column: String): Unit = {
    val (fMin, fMax, fN) = footerStatsMicros(s"$sfDir/$table.parquet", column)
    val (sMin, sMax, sN) = loaderAgg(df, column)
    assert(sN === fN, s"$table row count: loader $sN vs footer $fN")
    assert(sMin === fMin,
      s"$table.$column min: loader $sMin µs vs footer $fMin µs — unit drift?")
    assert(sMax === fMax,
      s"$table.$column max: loader $sMax µs vs footer $fMax µs — unit drift?")
  }

  test("events loader reproduces the footer's ts statistics exactly") {
    assertLoaderMatchesFooter(Tables.events(spark, sfDir), "events", "ts")
  }

  test("orders loader reproduces the footer's o_orderdate statistics exactly") {
    assertLoaderMatchesFooter(Tables.orders(spark, sfDir), "orders", "o_orderdate")
  }

  test("lineitem loader reproduces the footer's l_shipdate statistics exactly") {
    assertLoaderMatchesFooter(Tables.lineitem(spark, sfDir), "lineitem", "l_shipdate")
  }

  test("events.ts loads as TimestampType whatever the physical unit") {
    val f = Tables.events(spark, sfDir).schema("ts")
    assert(f.dataType === TimestampType)
  }

  test("unit probe refuses to guess on a non-timestamp ts column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-badts").toString
    spark.range(3).select(col("id").as("ts"))
      .write.mode("overwrite").parquet(dir)
    val e = intercept[RuntimeException](Tables.tsIsNanosAt(spark, dir))
    assert(e.getMessage.contains("refuse to guess"))
  }

  test("unit probe agrees with the current testdata generation (MICROS)") {
    // If the driver flips the testdata unit again this pins the expectation
    // loudly to THIS generation; update alongside the regenerated files.
    assert(!Tables.eventsTsIsNanos(spark, sfDir))
  }
}
