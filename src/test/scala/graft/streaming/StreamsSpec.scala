package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSpec, Tables}

/** Batch/stream parity specs: the streaming operators must produce the
  * same results as their batch twins over the same (finite) input, driven
  * with Trigger.AvailableNow so the stream drains deterministically. */
class StreamsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** FileStreamSource tails a DIRECTORY; the harness table is one file —
    * stage a directory with a symlink to it. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-events-dir")
    Files.createSymbolicLink(
      dir.resolve("part-0.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    dir.toString
  }

  test("streaming tumbling counts == batch tumbling counts") {
    val out = tmp("graft-stream-out")
    val q = Streams.tumblingCounts(Streams.readEvents(spark, eventsDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-stream-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Append mode only emits windows the watermark has passed; compare on
    // the emitted set — every emitted row must match batch exactly.
    val streamed = spark.read.parquet(out)
      .select("window_start", "event_type", "n_events")
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
                .as("window_start"),
              col("event_type"), col("n_events"))
    assert(streamed.count() > 0, "stream emitted nothing")
    assert(streamed.exceptAll(batch).count() === 0,
      "stream emitted a row batch would not")
  }

  test("foreachBatch merge sink is idempotent (S6/E3 invariant)") {
    val sink = tmp("graft-merge-sink") + "/data"
    def runOnce(ckpt: String): Unit = {
      val q = Streams.mergeSink(
        Streams.readEvents(spark, eventsDir).select("event_id", "event_type"),
        "event_id", sink, ckpt)
      q.awaitTermination(120000)
    }
    runOnce(tmp("graft-merge-ckpt1"))
    val after1 = spark.read.parquet(sink).count()
    // fresh checkpoint => full replay => merge must add nothing
    runOnce(tmp("graft-merge-ckpt2"))
    val after2 = spark.read.parquet(sink).count()
    assert(after1 === Tables.events(spark, sfDir).count())
    assert(after2 === after1, "replaying the stream changed the sink")
  }

  test("streaming dedup emits each key exactly once") {
    val out = tmp("graft-dedup-out")
    // duplicate the stream by reading the same file twice via two symlinks
    val dupDir = Files.createTempDirectory("graft-dup-dir")
    for (n <- Seq("a", "b"))
      Files.createSymbolicLink(
        dupDir.resolve(s"part-$n.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val q = Streams.dedupStream(
        Streams.readEvents(spark, dupDir.toString), "event_id")
      .select("event_id", "event_type")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-dedup-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val emitted = spark.read.parquet(out)
    val expected = Tables.events(spark, sfDir).count()
    assert(emitted.count() === expected,
      "doubled input should dedup back to the original row count")
    assert(emitted.select("event_id").distinct().count() === expected)
  }

  test("stream-static join enriches every matching event") {
    import spark.implicits._
    val out = tmp("graft-enrich-out")
    val profile = (0L until 100L).map(u => (u, s"tier${u % 3}"))
      .toDF("user_id", "tier")
    val q = Streams.enrichEvents(
        Streams.readEvents(spark, eventsDir), profile, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-enrich-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(out)
    val expected = Tables.events(spark, sfDir)
      .filter(col("user_id") < 100).count()
    assert(got.count() === expected)
    assert(got.filter(col("tier").isNull).count() === 0)
  }

  test("stateful sessionizer matches session_window on closed sessions") {
    val out = tmp("graft-sess-out")
    val q = Streams.statefulSessions(Streams.readEvents(spark, eventsDir), 30)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-sess-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val streamed = spark.read.parquet(out)
      .select(col("user_id"), col("session_start"), col("n_events"))
    val batch = Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("session_start"),
              col("n_events"))
    assert(streamed.count() > 0, "no sessions emitted")
    assert(streamed.exceptAll(batch).count() === 0,
      "stateful sessionizer emitted a session batch disagrees with")
  }
}
