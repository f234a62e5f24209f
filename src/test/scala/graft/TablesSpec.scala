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

  test("unit probe reports None on an empty or absent directory (stream bootstrap)") {
    val empty = java.nio.file.Files.createTempDirectory("graft-emptydir").toString
    assert(Tables.tsIsNanosAtOpt(spark, empty).isEmpty)
    assert(Tables.tsIsNanosAtOpt(spark, s"$empty/never-created").isEmpty)
    // the hard-erroring form still errors — batch loads must not guess
    val e = intercept[RuntimeException](Tables.tsIsNanosAt(spark, empty))
    assert(e.getMessage.contains("no parquet files"))
  }

  test("unit probe finds data files under a partitioned/nested layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nested").toString
    Tables.events(spark, sfDir).limit(10)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    // data files sit in day=…/ subdirectories; a non-recursive listing
    // sees only directories and would mis-report "no parquet files"
    assert(Tables.tsIsNanosAtOpt(spark, dir) === Some(false))
  }

  /** Write a minimal single-column TIMESTAMP(NANOS) parquet file — the
    * legacy testdata generation's physical shape, which Spark itself
    * cannot produce (outputTimestampType caps at MICROS). */
  private def writeNanosFile(file: String, tsNanos: Long*): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{PrimitiveType, Types}
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val w = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          new Path(file), spark.sparkContext.hadoopConfiguration))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try tsNanos.foreach(n => w.write(gf.newGroup().append("ts", n)))
    finally w.close()
  }

  test("MICROS file under the legacy NANOS(long) schema reads SILENTLY — " +
       "the measured hazard the probe's full-footer sweep exists for") {
    // Asymmetry measured, not assumed: NANOS-under-MICROS fails loudly at
    // scan time, but the reverse direction hands back raw int64 micros as
    // longs with no error — `div 1000` would then compress time 1000×
    // silently (the r9 bug class). This is WHY tsIsNanosAtOpt verifies
    // every footer before choosing the legacy path.
    val raw = spark.read.schema(Tables.eventsSchemaNanos)
      .parquet(s"$sfDir/events.parquet")
      .agg(min(col("ts"))).head().getLong(0)
    val proper = Tables.events(spark, sfDir)
      .agg(unix_micros(min(col("ts")))).head().getLong(0)
    assert(raw === proper,
      "raw long read no longer equals micros — silent-read hazard changed; " +
      "re-evaluate the probe's sweep design")
  }

  test("probe detects a pure TIMESTAMP(NANOS) directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    writeNanosFile(s"$dir/a.parquet", 1700000000000000000L)
    writeNanosFile(s"$dir/b.parquet", 1700000001000000000L)
    assert(Tables.tsIsNanosAtOpt(spark, dir) === Some(true))
  }

  test("mixed-unit directory never reaches the silent legacy path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mixed").toString
    writeNanosFile(s"$dir/nanos.parquet", 1700000000000000000L)
    Tables.events(spark, sfDir).limit(5)
      .write.mode("append").parquet(dir) // adds MICROS part-files
    // Listing order decides which file is probed first; BOTH orders must
    // end safely — MICROS-first returns Some(false) (the odd NANOS file
    // then fails loudly at scan), NANOS-first trips the sweep's
    // mixed-units error. The one forbidden outcome is Some(true): that
    // would route the MICROS files through the silent 1000× mis-scale.
    val outcome =
      try Tables.tsIsNanosAtOpt(spark, dir)
      catch {
        case e: RuntimeException if e.getMessage.contains("mixed ts units") =>
          None
      }
    assert(outcome !== Some(true))
  }

  test("datasetTag changes when the source bytes change, even at equal length") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tag").toString
    val t = "tbl"
    spark.range(100).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val tag1 = Tables.datasetTag(spark, dir, t)
    Thread.sleep(5) // mtime resolution
    spark.range(100).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val tag2 = Tables.datasetTag(spark, dir, t)
    // identical content and byte length — the mtime term still separates
    // the two generations (ADVICE r10 residual collision window)
    assert(tag1 !== tag2)
  }
}
