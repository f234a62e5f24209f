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
    assert(q.awaitTermination(120000), "stream did not drain")

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
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    runOnce(tmp("graft-merge-ckpt1"))
    val after1 = spark.read.parquet(sink).count()
    // fresh checkpoint => full replay => merge must add nothing
    runOnce(tmp("graft-merge-ckpt2"))
    val after2 = spark.read.parquet(sink).count()
    assert(after1 === Tables.events(spark, sfDir).count())
    assert(after2 === after1, "replaying the stream changed the sink")
  }

  test("upsertSink: a correction stream replaces sink rows; replay is a no-op") {
    // seed the sink with first-wins rows, then stream a correction batch
    // through the upsert sink: re-stated keys must carry the NEW values
    val sink = tmp("graft-upsert-sink") + "/data"
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), lit("orig").as("src"))
    graft.etl.Merge.mergeWrite(base, "event_id", sink)
    val corrDir = Files.createTempDirectory("graft-upsert-corr")
    val corrections = Tables.events(spark, sfDir)
      .filter(col("event_id") % 3 === 0)
      .select(col("event_id"), lit("fixed").as("src"))
    corrections.coalesce(1).write.mode("overwrite")
      .parquet(corrDir.resolve("batch").toString)
    def runOnce(ckpt: String): Unit = {
      val q = Streams.upsertSink(
        spark.readStream.schema(corrections.schema)
          .parquet(corrDir.resolve("batch").toString),
        "event_id", sink, ckpt)
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    runOnce(tmp("graft-upsert-ckpt1"))
    def counts() = spark.read.parquet(sink).groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = base.count()
    val fixed = corrections.count()
    assert(counts() === Map("orig" -> (total - fixed), "fixed" -> fixed))
    // full replay on a fresh checkpoint: absorbing, nothing changes
    runOnce(tmp("graft-upsert-ckpt2"))
    assert(counts() === Map("orig" -> (total - fixed), "fixed" -> fixed))
  }

  test("dqSplitSink: violations quarantine instead of dropping; clean " +
       "rows merge; replay is a no-op on both sinks") {
    import spark.implicits._
    // value NULL (not_null check) or negative (in_range check) → quarantine
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), when(col("event_id") % 7 === 0, lit(null))
        .otherwise(when(col("event_id") % 5 === 0, -col("value"))
          .otherwise(col("value"))).as("value"))
    val checks = Seq(
      graft.etl.Quality.notNullCheck("value"),
      graft.etl.Quality.inRangeCheck("value", lit(0.0), lit(1e9)))
    val sink = tmp("graft-dq-sink") + "/clean"
    val quarantine = tmp("graft-dq-sink") + "/quarantine"
    val dir = Files.createTempDirectory("graft-dq-dir")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("batch").toString)
    def runOnce(ck: String): Unit = {
      val q = Streams.dqSplitSink(
        spark.readStream.schema(rows.schema)
          .parquet(dir.resolve("batch").toString),
        "event_id", checks, sink, quarantine, tmp(s"graft-dq-ck-$ck"))
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    runOnce("1")
    runOnce("2") // full replay on a fresh checkpoint: absorbing
    val clean = spark.read.parquet(sink)
    val bad = spark.read.parquet(quarantine)
    val nViol = rows.filter(col("value").isNull || col("value") < 0).count()
    assert(bad.count() === nViol, "quarantine row count wrong")
    assert(clean.count() === rows.count() - nViol, "clean row count wrong")
    // exact partition of the input: clean ∪ quarantine == input, disjoint
    assert(clean.join(bad, Seq("event_id"), "inner").count() === 0)
    assert(clean.unionByName(bad).exceptAll(rows).count() === 0)
  }

  test("cdcSink: out-of-order batches + replay land the one-shot net table") {
    import spark.implicits._
    // a CDC log on events: each event row is an update to its user's row,
    // error events are deletes; net = last-wins by event_id (the seq)
    val log = Tables.events(spark, sfDir)
      .select(col("user_id").as("k"), col("event_id").as("seq"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type").as("v"))
    val mid = log.agg(org.apache.spark.sql.functions.avg("seq"))
      .head.getDouble(0).toLong
    val sink = tmp("graft-cdc-sink") + "/data"
    def runOnce(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val dir = Files.createTempDirectory(s"graft-cdc-$name")
      log.filter(cond).coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("batch").toString)
      val q = Streams.cdcSink(
        spark.readStream.schema(log.schema)
          .parquet(dir.resolve("batch").toString),
        "k", "seq", sink, tmp(s"graft-cdc-ckpt-$name"))
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    runOnce("newer", col("seq") >= mid) // NEWER half lands first
    runOnce("older", col("seq") < mid)
    runOnce("older2", col("seq") < mid) // replay
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "seq", "op", "v")
        .as[(Long, Long, String, String)].collect().sorted
    assert(rows(spark.read.parquet(sink)) ===
      rows(graft.etl.Merge.cdcNet(log, "k", "seq")))
  }

  test("gatedCdcSink: violating changes quarantine whole, never touch the " +
       "net table; replay absorbs; the fixed quarantine re-applies " +
       "through the same gate") {
    import spark.implicits._
    // CDC log with corruption: every 7th change carries a NULL value —
    // the gate must hold the CHANGE back, not apply-then-flag the state
    val log = Tables.events(spark, sfDir)
      .select(col("user_id").as("k"), col("event_id").as("seq"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        when(col("event_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")).as("v"))
    val checks = Seq(graft.etl.Quality.notNullCheck("v"))
    val net = tmp("graft-gated") + "/net"
    val quar = tmp("graft-gated") + "/quarantine"
    def runOnce(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val dir = Files.createTempDirectory(s"graft-gated-$name")
      df.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("batch").toString)
      val q = Streams.gatedCdcSink(
        spark.readStream.schema(df.schema)
          .parquet(dir.resolve("batch").toString),
        "k", "seq", checks, net, quar, tmp(s"graft-gated-ck-$name"))
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    val mid = log.agg(org.apache.spark.sql.functions.avg("seq"))
      .head.getDouble(0).toLong
    runOnce("newer", log.filter(col("seq") >= mid)) // out of order
    runOnce("older", log.filter(col("seq") < mid))
    runOnce("older2", log.filter(col("seq") < mid)) // replay: absorbing
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "seq", "op", "v")
        .as[(Long, Long, String, Option[String])].collect().sorted
    val clean = log.filter(col("v").isNotNull)
    // net table == one-shot CDC net of the CLEAN changes only
    assert(rows(spark.read.parquet(net)) ===
      rows(graft.etl.Merge.cdcNet(clean, "k", "seq")))
    // quarantine holds EVERY violating change (keyed by change identity,
    // so the replay collapsed to one copy each)
    val bad = spark.read.parquet(quar)
    assert(bad.count() === log.filter(col("v").isNull).count())
    // upstream fix: repair the quarantined changes and feed them through
    // the SAME gate — they apply, and the net table becomes the full log's
    val fixed = bad.drop("__change_id")
      .withColumn("v", coalesce(col("v"), lit("fixed")))
      .localCheckpoint() // the gate's own swap replaces the files below
    runOnce("fixed", fixed)
    assert(rows(spark.read.parquet(net)) ===
      rows(graft.etl.Merge.cdcNet(
        clean.unionByName(fixed), "k", "seq")))
  }

  test("searchPublishSink: corpus + postings publish as one manifest " +
       "generation per batch — snapshots never tear, replay absorbs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val mid = docs.agg(org.apache.spark.sql.functions.avg("doc_id"))
      .head.getDouble(0).toLong
    val root = tmp("graft-searchpub") + "/root"
    def runOnce(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val dir = Files.createTempDirectory(s"graft-searchpub-$name")
      df.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("batch").toString)
      val q = Streams.searchPublishSink(
        spark.readStream.schema(df.schema)
          .parquet(dir.resolve("batch").toString),
        root, tmp(s"graft-searchpub-ck-$name"))
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    runOnce("b1", docs.filter(col("doc_id") < mid))
    // consistency invariant a torn pair would break: the resolved
    // snapshot's postings cover EXACTLY the resolved corpus's documents
    def check(expectDocs: Long): Unit = {
      val snap = graft.etl.Manifest.resolve(spark, root)
      val corpus = spark.read.parquet(snap("corpus"))
      val post = spark.read.parquet(snap("postings"))
      assert(corpus.count() === expectDocs)
      assert(post.select("doc_id").distinct().count() ===
        corpus.filter(org.apache.spark.sql.functions
          .length(col("text")) > 0).count())
      // the snapshot serves the same search the batch index would
      val got = graft.operators.Documents.searchIndex(
        post, Seq("hash", "join", "scan"), 20).collect().toSeq
      val want = graft.operators.Documents.searchIndex(
        graft.operators.Documents.postings(corpus),
        Seq("hash", "join", "scan"), 20).collect().toSeq
      assert(got === want, "snapshot search != corpus-derived search")
    }
    check(docs.filter(col("doc_id") < mid).count())
    runOnce("b2", docs) // second batch: the rest (plus replayed rows)
    check(docs.count())
    val genAfter2 = graft.etl.Manifest.current(spark, root)
    runOnce("b2r", docs) // full replay on a fresh checkpoint
    check(docs.count()) // content-absorbing
    assert(graft.etl.Manifest.current(spark, root)("corpus") ===
      genAfter2("corpus") + 1, "replay did not publish a new generation")
  }

  test("searchPublishSink extends q122's BM25 members when present (r15): " +
       "one generation pairs corpus + postings + bm25 + stats ledger, " +
       "and the ledger stays exact across batches and replay") {
    import graft.operators.Documents
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val mid = docs.agg(org.apache.spark.sql.functions.avg("doc_id"))
      .head.getDouble(0).toLong
    val root = tmp("graft-searchpub-bm25") + "/root"
    def runOnce(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val dir = Files.createTempDirectory(s"graft-spb-$name")
      df.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("batch").toString)
      val q = Streams.searchPublishSink(
        spark.readStream.schema(df.schema)
          .parquet(dir.resolve("batch").toString),
        root, tmp(s"graft-spb-ck-$name"))
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    val terms = Seq("hash", "join", "scan")
    def checkBm25(): Unit = {
      val snap = graft.etl.Manifest.resolve(spark, root)
      val corpus = spark.read.parquet(snap("corpus"))
      val got = Documents.bm25Probe(spark.read.parquet(snap("bm25")),
        Documents.bm25StatsTotal(spark.read.parquet(snap("bm25stats"))),
        terms, 20).collect().toSeq
      val want = Documents.bm25Probe(Documents.bm25Postings(corpus),
        Documents.bm25StatsTotal(Documents.bm25StatsLedger(corpus, "x")),
        terms, 20).collect().toSeq
      assert(got === want, "snapshot BM25 != corpus-derived BM25")
    }
    runOnce("b1", docs.filter(col("doc_id") < mid))
    // q122 widens the stream's root with its BM25 members (ensureMembers
    // — whichever of the stream/q122 touched the root first)
    val corpus0 = spark.read.parquet(
      graft.etl.Manifest.resolve(spark, root)("corpus")).localCheckpoint()
    graft.etl.Manifest.ensureMembers(spark, root, Map(
      "bm25" -> (() => Documents.bm25Postings(corpus0)),
      "bm25stats" -> (() => Documents.bm25StatsLedger(corpus0, "build"))))
    checkBm25()
    runOnce("b2", docs) // second half + replayed rows
    checkBm25()
    val genAfter2 = graft.etl.Manifest.current(spark, root)
    runOnce("b2r", docs) // full replay on a fresh checkpoint
    checkBm25() // the ledger did not double-count the replayed batch
    assert(graft.etl.Manifest.current(spark, root)("bm25") ===
      genAfter2("bm25") + 1, "replay did not publish a new generation")
  }

  test("mergeSink survives a kill between delete and rename (orphan recovery)") {
    import java.nio.file.{Paths, StandardCopyOption}
    // two disjoint slices of events, staged as separate files so the
    // stream sees them in two different runs against ONE checkpoint
    val all = Tables.events(spark, sfDir).select("event_id", "event_type")
    val streamDir = Files.createTempDirectory("graft-crash-dir")
    def stage(name: String, cond: org.apache.spark.sql.Column): Long = {
      val scratch = tmp(s"graft-crash-$name")
      val slice = all.filter(cond)
      slice.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, streamDir.resolve(s"$name.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      slice.count()
    }
    val sink = tmp("graft-crash-sink") + "/data"
    val ckpt = tmp("graft-crash-ckpt")
    val schema = all.schema
    def runOnce(): Unit = {
      val q = Streams.mergeSink(
        spark.readStream.schema(schema).parquet(streamDir.toString),
        "event_id", sink, ckpt)
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    val nA = stage("a", col("event_id") % 2 === 0)
    runOnce()
    assert(spark.read.parquet(sink).count() === nA)

    // simulate the ADVICE r3 crash: the process died AFTER fs.delete(target)
    // but BEFORE rename(tmp, target) — target gone, a complete merge result
    // orphaned under the tmp naming scheme
    Files.move(Paths.get(sink), Paths.get(s"$sink.tmp-7"),
      StandardCopyOption.ATOMIC_MOVE)

    // resume with NEW data on the SAME checkpoint: slice A is never
    // replayed, so without orphan recovery it would be permanently lost
    val nB = stage("b", col("event_id") % 2 =!= 0)
    runOnce()
    val recovered = spark.read.parquet(sink)
    assert(recovered.count() === nA + nB,
      "orphaned slice-A merges were lost on resume")
    assert(recovered.select("event_id").distinct().count() === nA + nB)
  }

  test("stream-stream interval join == batch interval join (view→click attribution)") {
    val out = tmp("graft-ssjoin-out")
    val events = Streams.readEvents(spark, eventsDir)
    val q = Streams.viewClickAttribution(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "click"),
        horizonMinutes = 30)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-ssjoin-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")

    val streamed = spark.read.parquet(out)
      .select("user_id", "click_id", "view_id")
    val b = Tables.events(spark, sfDir)
    val bv = b.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
    val bc = b.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("click_id"))
    val batch = bc.join(bv,
        col("c_user") === col("v_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"))
    // single-file dir => one micro-batch => the inner join must emit the
    // complete batch-equal match set (no eviction can precede arrival)
    assert(streamed.count() > 0, "stream emitted no attributions")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0
        && batch.exceptAll(streamed).count() === 0,
      "stream-stream interval join diverged from the batch join")
  }

  test("left-outer stream-stream join: matches == batch; unmatched views " +
       "emit after watermark eviction") {
    val out = tmp("graft-ssouter-out")
    val events = Streams.readEvents(spark, eventsDir)
    val q = Streams.viewClickAttributionOuter(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "click"),
        horizonMinutes = 30)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-ssouter-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")

    val streamed = spark.read.parquet(out)
    val b = Tables.events(spark, sfDir)
    val bv = b.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
    val bc = b.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("click_id"))
    val batchInner = bv.join(bc,
        col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("view_id"), col("click_id"))

    // matched rows must equal the batch inner join exactly
    val streamedMatched = streamed.filter(col("click_id").isNotNull)
      .select(col("view_id"), col("click_id"))
    assert(streamedMatched.exceptAll(batchInner).count() === 0
        && batchInner.exceptAll(streamedMatched).count() === 0,
      "outer join's matched part diverged from the batch inner join")

    // null-padded rows must be genuinely unmatched in batch terms...
    val streamedUnmatched = streamed.filter(col("click_id").isNull)
      .select(col("view_id"))
    assert(streamedUnmatched.count() > 0,
      "no unmatched views emitted — watermark eviction never fired")
    assert(streamedUnmatched
      .join(batchInner.select(col("view_id")), Seq("view_id"), "left_semi")
      .count() === 0,
      "a view emitted as unmatched despite having a batch match")
    // ...and no view may appear both matched and unmatched
    assert(streamed.select(col("view_id")).distinct().count()
      === streamed.count()
      - streamedMatched.count() + streamedMatched.select("view_id").distinct().count(),
      "a view appeared both matched and null-padded")
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
    assert(q.awaitTermination(120000), "stream did not drain")
    val emitted = spark.read.parquet(out)
    val expected = Tables.events(spark, sfDir).count()
    assert(emitted.count() === expected,
      "doubled input should dedup back to the original row count")
    assert(emitted.select("event_id").distinct().count() === expected)
  }

  test("streaming chunk dedup keeps one copy per fingerprint — batch parity") {
    // the ingest-time twin of q77: a doubled document stream (two symlinks
    // to the same corpus file = every chunk arrives at least twice) must
    // drain to exactly one row per distinct chunk fingerprint, and the
    // surviving fingerprint SET must equal the batch chunk frame's (q76) —
    // same window geometry, same portable hash, both surfaces.
    val out = tmp("graft-cdedup-out")
    val dupDir = Files.createTempDirectory("graft-cdup-dir")
    for (n <- Seq("a", "b"))
      Files.createSymbolicLink(
        dupDir.resolve(s"part-$n.parquet"),
        java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val docs = spark.readStream
      .schema(Tables.documentsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dupDir.toString)
      // deterministic per-doc event time: both copies of a doc carry the
      // same ts, so the duplicate is always inside the watermark window.
      // Offset a day off the epoch — a ts of EXACTLY 1970-01-01 00:00:00
      // ties the initial watermark (0) and the state store expires the
      // row on arrival, silently dropping doc 0's first chunk
      .withColumn("ts",
        timestamp_micros((col("doc_id") + 86400L) * 1000000L))
    val q = Streams.chunkDedupStream(docs)
      .select("doc_id", "chunk_idx", "fp")
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-cdedup-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    val emitted = spark.read.parquet(out)
    val batchChunks = graft.SparkEntry.queries("q76_doc_chunks")(spark, sfDir)
    val batchFps = batchChunks.select("fp").distinct()
    assert(emitted.count() === batchFps.count(),
      "doubled chunk stream should dedup to one row per distinct fingerprint")
    assert(emitted.select("fp").distinct().count() === batchFps.count())
    assert(emitted.select("fp").exceptAll(batchFps).count() === 0
        && batchFps.exceptAll(emitted.select("fp")).count() === 0,
      "streamed fingerprint set diverged from the batch chunk frame's")
  }

  test("per-batch incremental near-dup == batch R-S join (q79's streaming " +
       "twin), replay-absorbing by pair key") {
    // stream the q42 hash split's >= 90 bucket in TWO micro-batches
    // against the static < 90 corpus; the sink's pair set must equal the
    // one-shot batch q79 result — exactness makes the answer independent
    // of batching (each batch computes its own rarest-first order, and
    // completeness holds under any consistent order).
    import graft.functions.Text
    val docs = Tables.documents(spark, sfDir)
    val bucket = pmod(Text.portableHash(col("doc_id").cast("string")), lit(100L))
    val inDir = tmp("graft-ndup-in")
    docs.filter(bucket >= 90).repartition(2)
      .write.mode("overwrite").parquet(inDir)
    val sink = tmp("graft-ndup-out") + "/pairs"
    val q = Streams.nearDupStream(
      spark.readStream
        .schema(Tables.documentsSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir),
      docs.filter(bucket < 90),
      sink, tmp("graft-ndup-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = spark.read.parquet(sink)
      .select("in_id", "corpus_id", "jaccard_bp")
    val want = graft.SparkEntry.queries("q79_incremental_neardup")(spark, sfDir)
    assert(got.count() > 0, "fixture lost its cross-side near-dups")
    assert(got.exceptAll(want).count() === 0
        && want.exceptAll(got).count() === 0,
      "streamed pair set diverged from the batch R-S join's")
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
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = spark.read.parquet(out)
    val expected = Tables.events(spark, sfDir)
      .filter(col("user_id") < 100).count()
    assert(got.count() === expected)
    assert(got.filter(col("tier").isNull).count() === 0)
  }

  test("stateful sessionizer == session_window over the full sf0.01 events") {
    // the q27-oracle-verified session_window aggregation is the ground
    // truth; the hand-rolled flatMapGroupsWithState sessionizer must agree
    // on the FULL harness table, both directions, pinning the gap-boundary
    // semantics (an event at exactly lastTs+gap starts a NEW session —
    // `<` to extend, on both surfaces). Judge r3 item 7.
    val sf01 = "/root/testdata/sf0.01"
    val dir = Files.createTempDirectory("graft-sess01-dir")
    Files.createSymbolicLink(
      dir.resolve("part-0.parquet"),
      java.nio.file.Paths.get(s"$sf01/events.parquet"))
    val out = tmp("graft-sess-out")
    val q = Streams.statefulSessions(Streams.readEvents(spark, dir.toString), 30)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-sess-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val streamed = spark.read.parquet(out)
      .select(col("user_id"), col("session_start"), col("n_events"))
    // session_end comes from an AGGREGATE (max(ts) + gap), NOT from the
    // session_window group key: a post-agg filter on a grouping-derived
    // column gets pushed BELOW the session aggregate, where it drops
    // individual events by their pre-merge per-event windows and emits
    // phantom split sessions (reproduced on this exact data — see the
    // sessionWindows scaladoc in operators/Events.scala). Aggregate
    // outputs cannot be pushed, so this form is safe to filter on.
    val gapUs = 30L * 60L * 1000000L
    val batch = Tables.events(spark, sf01)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           (max(unix_micros(col("ts"))) + gapUs).as("session_end"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("session_start"),
              col("session_end"),
              col("n_events"))
    assert(streamed.count() > 0, "no sessions emitted")
    // every emitted session must exist in batch (no phantom sessions)
    assert(streamed.exceptAll(batch.drop("session_end")).count() === 0,
      "stateful sessionizer emitted a session batch disagrees with")
    // every batch session whose event-time timeout the final watermark
    // passed must have been emitted (no lost sessions). Final watermark =
    // max(ts) - 2h; timeout fires at lastTs + gap = session_window.end;
    // 1-minute margin keeps the assertion off the firing boundary.
    val maxTsUs = Tables.events(spark, sf01)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val mustEmit = batch
      .filter(col("session_end") + 60L * 1000000L <
        lit(maxTsUs) - 2L * 3600L * 1000000L)
      .drop("session_end")
    assert(mustEmit.exceptAll(streamed).count() === 0,
      "a closed (timed-out) session was never emitted")
  }

  test("stateful session paths == batch sessionPathFrame over the full " +
       "sf0.01 events (q98's streaming twin)") {
    val sf01 = "/root/testdata/sf0.01"
    val dir = Files.createTempDirectory("graft-paths-dir")
    Files.createSymbolicLink(
      dir.resolve("part-0.parquet"),
      java.nio.file.Paths.get(s"$sf01/events.parquet"))
    val out = tmp("graft-paths-out")
    val q = Streams.statefulSessionPaths(
        Streams.readEvents(spark, dir.toString), 30)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-paths-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val streamed = spark.read.parquet(out)
      .select(col("user_id"), col("session_start"), col("path"))
    assert(streamed.count() > 0, "no session paths emitted")
    val batch = graft.operators.Events.sessionPathFrame(
      Tables.events(spark, sf01))
    // every emitted path must be a batch session's exact string
    assert(streamed.exceptAll(batch.select(col("user_id"),
        col("session_start"), col("path"))).count() === 0,
      "stateful paths emitted a session the batch frame disagrees with")
    // every batch session whose timeout the final watermark passed must
    // have been emitted (the statefulSessions mustEmit contract)
    val maxTsUs = Tables.events(spark, sf01)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val mustEmit = batch
      .filter(col("session_end") + 60L * 1000000L <
        lit(maxTsUs) - 2L * 3600L * 1000000L)
      .select(col("user_id"), col("session_start"), col("path"))
    assert(mustEmit.exceptAll(streamed).count() === 0,
      "a closed (timed-out) session path was never emitted")
  }

  test("retention sketch: folding in-order day-split batches == one-shot " +
       "q93, and replay is absorbing") {
    val state = tmp("graft-ret-state")
    val e = Tables.events(spark, sfDir)
    // three in-order event-time batches (the sink's documented contract)
    val batches = Seq(
      e.filter(col("ts") < lit("2024-01-11").cast("timestamp")),
      e.filter(col("ts") >= lit("2024-01-11").cast("timestamp") &&
               col("ts") < lit("2024-01-21").cast("timestamp")),
      e.filter(col("ts") >= lit("2024-01-21").cast("timestamp")))
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.applyRetentionBatch(b, state, 64, s"b$i")
    }
    val cols = Seq("cohort_day", "day_offset", "n_kept", "kth_min", "est")
    val streamed = Streams.retentionSketchState(spark, state)
      .select(cols.map(col): _*)
    val oneShot = graft.operators.Events.retentionSketch(spark, sfDir)
      .select(cols.map(col): _*)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).count() === 0 &&
           oneShot.exceptAll(streamed).count() === 0,
      "incremental sketch table != one-shot q93")
    // checkpoint-replay of the last batch must be a no-op
    Streams.applyRetentionBatch(batches.last, state, 64, "replay")
    val replayed = Streams.retentionSketchState(spark, state)
      .select(cols.map(col): _*)
    assert(replayed.exceptAll(oneShot).count() === 0 &&
           oneShot.exceptAll(replayed).count() === 0,
      "replaying a batch changed the sketch state")
  }

  test("retention sketch sink wires end-to-end through foreachBatch") {
    val state = tmp("graft-ret-sink-state")
    val q = Streams.retentionSketchSink(
      Streams.readEvents(spark, eventsDir), state, tmp("graft-ret-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val cols = Seq("cohort_day", "day_offset", "n_kept", "kth_min", "est")
    val streamed = Streams.retentionSketchState(spark, state)
      .select(cols.map(col): _*)
    val oneShot = graft.operators.Events.retentionSketch(spark, sfDir)
      .select(cols.map(col): _*)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).count() === 0 &&
           oneShot.exceptAll(streamed).count() === 0)
  }

  test("bm25RetractSink: takedown events streamed in two micro-batches " +
       "retract through the index triple — the net probe equals the " +
       "one-shot on the reduced corpus (q144's streaming twin)") {
    import graft.operators.Documents
    val docs = Tables.documents(spark, sfDir)
    val removed = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
    val reduced = docs.filter(col("doc_id") % 7 =!= 0)
    val dir = tmp("graft-bm25r-sink")
    val (idx, stats, dfLed, del) =
      (s"$dir/post", s"$dir/stats", s"$dir/df", s"$dir/del")
    Documents.appendBm25(idx, stats, dfLed, docs, "b0")
    // the takedown events arrive as a stream, drained one file per
    // micro-batch so the retraction really decomposes across batches
    val delDir = tmp("graft-bm25r-dels")
    removed.repartition(2).write.mode("overwrite").parquet(delDir)
    val q = Streams.bm25RetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      idx, stats, dfLed, del, tmp("graft-bm25r-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val terms = Seq("hash", "join", "scan")
    import spark.implicits._
    val got = Documents.bm25ProbeNet(spark.read.parquet(idx),
        Documents.readBm25Tombstones(spark, del),
        spark.read.parquet(dfLed),
        Documents.bm25StatsTotal(spark.read.parquet(stats)), terms, 1000)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val expect = Documents.bm25Probe(Documents.bm25Postings(reduced),
        Documents.bm25StatsTotal(
          Documents.bm25StatsLedger(reduced, "x")), terms, 1000)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(expect.nonEmpty && got === expect,
      "streamed takedown != one-shot probe on the reduced corpus")
  }

  test("gramRetractSink: streamed takedowns net the gram ledger to the " +
       "reduced corpus's counts exactly (q151's streaming twin)") {
    import graft.operators.Documents
    val K = 20
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val led = tmp("graft-gramr-sink")
    Documents.appendGramLedger(led, docs, K, "b0")
    val delDir = tmp("graft-gramr-dels")
    removed.repartition(2).write.mode("overwrite").parquet(delDir)
    val q = Streams.gramRetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      led, K, tmp("graft-gramr-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Documents.gramLedgerCounts(spark, led)
      .filter(col("n_idx") =!= 0L)
    val want = Documents.gramCounts(
      docs.filter(col("doc_id") % 7 =!= 0), K)
    assert(want.count() > 0 &&
           got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0,
      "streamed gram retraction != reduced corpus counts")
  }

  test("nbRetractSink: streamed takedowns net the NB count ledger to a " +
       "model trained on the reduced corpus (q145's streaming twin)") {
    import graft.operators.Documents
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        (col("lang") === "en").cast("long").as("y"))
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val led = tmp("graft-nbr-sink")
    Documents.appendNbLedger(led, docs, "b0")
    val delDir = tmp("graft-nbr-dels")
    removed.repartition(2).write.mode("overwrite").parquet(delDir)
    val q = Streams.nbRetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      led, tmp("graft-nbr-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Documents.nbLedgerModel(spark, led)
    val want = Documents.nbTrainModel(
      docs.filter(col("doc_id") % 7 =!= 0))
    assert(want.count() > 0 &&
           got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0,
      "streamed NB retraction != model trained on the reduced corpus")
  }

  test("ivfRetractSink: streamed takedowns tombstone the postings — the " +
       "net read serves exactly the surviving vectors (q149's streaming " +
       "twin), and a replayed delete file absorbs") {
    import graft.operators.Similarity
    val e = Similarity.withNorm(Tables.embeddings(spark, sfDir))
    val post = tmp("graft-ivfr-sink") + "/post"
    val del = tmp("graft-ivfr-sink") + "/del"
    Similarity.appendIvfBatch(post, e, "b0")
    val removed = e.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val delDir = tmp("graft-ivfr-dels")
    removed.repartition(2).write.mode("overwrite").parquet(delDir)
    val q = Streams.ivfRetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      post, del, tmp("graft-ivfr-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    import spark.implicits._
    val served = Similarity.readPostingsNet(spark, post, del)
      .select(col("vec_id")).as[Long].collect().toSet
    val all = e.select(col("vec_id")).as[Long].collect().toSet
    val gone = removed.as[Long].collect().toSet
    assert(served === (all -- gone),
      "net postings read != surviving vectors after the streamed takedown")
    // replay: drain a fresh stream over the SAME delete files into the
    // same del path — tombstones are distinct-absorbed, nothing changes
    val q2 = Streams.ivfRetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      post, del, tmp("graft-ivfr-ckpt2"))
    assert(q2.awaitTermination(120000), "stream did not drain")
    val served2 = Similarity.readPostingsNet(spark, post, del)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(served2 === served, "replayed takedown stream changed the net")
  }

  test("phashRetractSink: streamed takedowns tombstone the phash ledger — " +
       "the election over the net ledger equals the one-shot on the " +
       "reduced corpus (q150's streaming twin)") {
    import graft.multimodal.Media
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val led = tmp("graft-phr-sink") + "/led"
    val del = tmp("graft-phr-sink") + "/del"
    Media.appendPhashLedger(led, docs, "b0")
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val delDir = tmp("graft-phr-dels")
    removed.repartition(2).write.mode("overwrite").parquet(delDir)
    val q = Streams.phashRetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      led, del, tmp("graft-phr-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Media.electPhashClusters(
      Media.readPhashLedgerNet(spark, led, del))
    val want = Media.electPhashClusters(
      Media.phashPerDoc(docs.filter(col("doc_id") % 7 =!= 0)))
    assert(want.count() > 0 &&
           got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0,
      "streamed phash takedown != one-shot election on the reduced corpus")
  }

  test("audioRetractSink: streamed takedowns tombstone the audio-fp " +
       "ledger — the net election equals the one-shot on the reduced " +
       "corpus, with zero decodes in the retraction path (q153's " +
       "streaming twin)") {
    import graft.multimodal.Media
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val led = tmp("graft-audr-sink") + "/led"
    val del = tmp("graft-audr-sink") + "/del"
    Media.appendAudioFpLedger(led, docs, "b0")
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val delDir = tmp("graft-audr-dels")
    removed.repartition(2).write.mode("overwrite").parquet(delDir)
    val q = Streams.audioRetractSink(
      spark.readStream.schema(removed.schema)
        .option("maxFilesPerTrigger", "1").parquet(delDir),
      led, del, tmp("graft-audr-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Media.electAudioClusters(
      Media.readAudioFpLedgerNet(spark, led, del))
    val want = Media.electAudioClusters(
      Media.audioFpPerDoc(docs.filter(col("doc_id") % 7 =!= 0)))
    assert(want.count() > 0 &&
           got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0,
      "streamed audio takedown != one-shot election on the reduced corpus")
  }

  test("two takedown streams with FRESH checkpoints against one gram " +
       "ledger keep distinct batch tokens (checkpoint-salted — ADVICE " +
       "r19), and stream-fed batches carry commit markers so the net " +
       "compaction physically folds them") {
    import graft.operators.Documents
    val K = 20
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val led = tmp("graft-gramr2-sink")
    Documents.appendGramLedger(led, docs, K, "b0")
    // wave 1 and wave 2: DIFFERENT doc sets, each drained by its own
    // stream with its own fresh checkpoint — before the salt both waves'
    // first batches shared token "rm0" and the (gram, batch_id)
    // first-wins absorption silently dropped one wave's negatives
    val w1 = docs.filter(col("doc_id") % 7 === 0)
    val w2 = docs.filter(col("doc_id") % 7 === 1)
    Seq(w1 -> "graft-gramr2-a", w2 -> "graft-gramr2-b").foreach {
      case (wave, ck) =>
        val dels = tmp(ck + "-dels")
        wave.write.mode("overwrite").parquet(dels)
        val q = Streams.gramRetractSink(
          spark.readStream.schema(wave.schema).parquet(dels),
          led, K, tmp(ck + "-ckpt"))
        assert(q.awaitTermination(120000), "stream did not drain")
    }
    val want = Documents.gramCounts(
      docs.filter(col("doc_id") % 7 > 1), K)
    def served() = Documents.gramLedgerCounts(spark, led)
      .filter(col("n_idx") =!= 0L)
    assert(want.count() > 0 &&
           served().exceptAll(want).count() === 0 &&
           want.exceptAll(served()).count() === 0,
      "two-wave streamed retraction != reduced corpus counts " +
      "(token collision?)")
    // the sinks wrote .batches markers, so the net compaction folds the
    // streamed batches: net-zero grams physically vanish and the served
    // counts are unchanged
    Documents.compactGramLedgerNet(spark, led)
    import spark.implicits._
    val batchIds = spark.read.parquet(led).select(col("batch_id"))
      .distinct().as[String].collect().toSet
    assert(!batchIds.exists(_.startsWith("rm-")),
      s"streamed retract batches not folded by net compaction: $batchIds")
    assert(served().exceptAll(want).count() === 0 &&
           want.exceptAll(served()).count() === 0,
      "net compaction changed the served gram counts")
  }

  test("grid maintenance == batch q119 bit-for-bit after day-split " +
       "batches, an OUT-OF-ORDER late batch, and a replay (the resample " +
       "ring's streaming face, r15)") {
    import graft.operators.Events
    val state = tmp("graft-grid-state")
    val e = Tables.events(spark, sfDir)
    // deliberately out of order: the third decade lands before the
    // middle one — late data must re-fill its users' spans exactly
    val batches = Seq(
      e.filter(col("ts") < lit("2024-01-11").cast("timestamp")),
      e.filter(col("ts") >= lit("2024-01-21").cast("timestamp")),
      e.filter(col("ts") >= lit("2024-01-11").cast("timestamp") &&
               col("ts") < lit("2024-01-21").cast("timestamp")))
    batches.zipWithIndex.foreach { case (b, i) =>
      Streams.applyGridBatch(b, state, s"b$i")
    }
    // checkpoint replay reuses the original token: must be a no-op
    Streams.applyGridBatch(batches(1), state, "b1")
    val got = Streams.gridState(spark, state)
    val want = Events.resampleGrid(Events.gridEventProjection(e))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0,
      "maintained grid != one-shot q119 grid")
    // ledger lifecycle (r16): the per-batch appended files (4 batches'
    // worth, incl. the replay's duplicates) compact into user-clustered
    // files, GC-ing the replay rows; the ledger CONTENT is preserved, so
    // a batch applied AFTER compaction still splices to the one-shot
    // grid — the same probe-equality closure the search indexes have
    val (filesBefore, filesAfter) = Streams.compactGridLedger(spark, state)
    assert(filesBefore > filesAfter,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    Streams.applyGridBatch(batches(2), state, "b2")
    val gotC = Streams.gridState(spark, state)
    assert(gotC.exceptAll(want).count() === 0 &&
           want.exceptAll(gotC).count() === 0,
      "post-compaction batch broke grid parity")
  }

  test("grid maintenance sink wires end-to-end through foreachBatch") {
    import graft.operators.Events
    val state = tmp("graft-grid-sink-state")
    val q = Streams.gridMaintSink(
      Streams.readEvents(spark, eventsDir), state,
      tmp("graft-grid-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Streams.gridState(spark, state)
    val want = Events.resampleGrid(Events.gridEventProjection(
      Tables.events(spark, sfDir)))
    assert(got.count() === want.count() && got.count() > 0)
    assert(got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0)
  }

  test("dup-span stream: ingest-time flagging over two batches, replay " +
       "absorption, and the exact relation to the batch finder") {
    import graft.operators.Documents
    import spark.implicits._
    val state = tmp("graft-dspan-state") + "/ledger"
    val out = tmp("graft-dspan-out") + "/feed"
    val K = 4
    val corpus = Seq((1L, "a b c d p1 p2")).toDF("doc_id", "text")
    val b1 = Seq(
      (10L, "q1 a b c d"),    // dup vs corpus -> flags at b1
      (11L, "e f g h r1"),    // FIRST occurrence -> silent at b1
      (12L, "j k l m t1"), (13L, "t2 j k l m")) // within-batch pair
      .toDF("doc_id", "text")
    val b2 = Seq(
      (20L, "r2 e f g h"),    // second occurrence -> flags at b2
      (21L, "u v w x y"))     // unique -> silent
      .toDF("doc_id", "text")
    Documents.appendGramLedger(state, corpus, K, "seed")
    Streams.applyDupSpanBatch(b1, state, out, K, "t1")
    Streams.applyDupSpanBatch(b2, state, out, K, "t2")
    val feed = Streams.dupSpanFeed(spark, out)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(feed === Seq(
      (10L, 2L, 5L, 4L, "t1"), (12L, 1L, 4L, 4L, "t1"),
      (13L, 2L, 5L, 4L, "t1"), (20L, 2L, 5L, 4L, "t2")))
    // checkpoint replay of b2 under its original token: the probe
    // excludes the batch's own ledger rows (appended by the first
    // attempt), so it re-derives byte-identical spans -> feed AND
    // ledger both absorb the replay
    val countsBefore = Documents.gramLedgerCounts(spark, state)
      .as[(String, Long)].collect().toSet
    Streams.applyDupSpanBatch(b2, state, out, K, "t2")
    assert(Streams.dupSpanFeed(spark, out)
      .as[(Long, Long, Long, Long, String)].collect().toSeq === feed,
      "replayed batch changed the published feed")
    assert(Documents.gramLedgerCounts(spark, state)
      .as[(String, Long)].collect().toSet === countsBefore,
      "replayed batch changed the ledger counts")
    // relation to the batch finder: the stream's spans are the batch
    // q128 spans MINUS exactly the first occurrences whose duplicate
    // arrived in a LATER batch (doc 11 here) — nothing else differs
    val batchAll = Documents.dupSpanProbe(
      b1.unionByName(b2), Documents.gramCounts(corpus, K), K)
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamSet = feed.map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(streamSet.subsetOf(batchAll))
    assert(batchAll -- streamSet === Set((11L, 1L, 4L, 4L)),
      "stream/batch difference must be exactly the late-duplicated " +
      "first occurrences")
    // compaction leaves the next batch's probe invariant
    val (nb, na) = Documents.compactGramLedger(spark, state)
    assert(nb > na, s"compaction must shrink files ($nb -> $na)")
    val b3 = Seq((30L, "z9 j k l m")).toDF("doc_id", "text") // dup vs b1
    Streams.applyDupSpanBatch(b3, state, out, K, "t3")
    assert(Streams.dupSpanFeed(spark, out)
      .filter(col("batch_id") === "t3")
      .as[(Long, Long, Long, Long, String)].collect().toSeq ===
      Seq((30L, 2L, 5L, 4L, "t3")),
      "post-compaction batch probe diverged")
    // FEED compaction (VERDICT r17 item 3): the replayed t2 left raw
    // duplicate rows in the published dir; compaction must GC them for
    // good (raw count drops to the distinct count), shrink the file
    // population, and leave the feed relation byte-identical
    val feedBefore = Streams.dupSpanFeed(spark, out)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val rawBefore = spark.read.parquet(out).count()
    assert(rawBefore > feedBefore.size.toLong,
      "expected raw replay duplicates in the feed dir before compaction")
    val (fb, fa) = Streams.compactDupSpanFeed(spark, out)
    assert(fb > fa, s"feed compaction must shrink files ($fb -> $fa)")
    assert(spark.read.parquet(out).count() === feedBefore.size.toLong,
      "feed compaction did not GC the replay duplicates")
    assert(Streams.dupSpanFeed(spark, out)
      .as[(Long, Long, Long, Long, String)].collect().toSeq === feedBefore,
      "feed compaction changed the published relation")
  }

  test("dup-span ingest under DOUBLE-crash interleavings (VERDICT r17 " +
       "item 2): any sequence of publish-only crashed attempts and full " +
       "replays under one token converges to the clean one-attempt state") {
    import graft.operators.Documents
    import spark.implicits._
    val K = 4
    val corpus = Seq((1L, "a b c d p1 p2")).toDF("doc_id", "text")
    val b2 = Seq((20L, "q7 a b c d"), (21L, "u v w x y"))
      .toDF("doc_id", "text")
    // applyDupSpanBatch's first half, run in isolation — the state a
    // crash between the span publish and the ledger append leaves
    def publishOnly(state: String, out: String, token: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      graft.etl.Merge.recoverSwap(fs, state)
      Documents.dupSpanProbe(b2,
        Documents.gramLedgerCounts(spark, state,
          excludeBatch = Some(token)), K)
        .withColumn("batch_id", lit(token))
        .write.mode("append").parquet(out)
    }
    def feedOf(out: String) = Streams.dupSpanFeed(spark, out)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    def ledgerOf(state: String) = Documents
      .gramLedgerCounts(spark, state).as[(String, Long)].collect().toSet
    // clean reference: one uncrashed attempt
    val cState = tmp("graft-dspan-dc-clean") + "/ledger"
    val cOut = tmp("graft-dspan-dc-clean-out") + "/feed"
    Documents.appendGramLedger(cState, corpus, K, "seed")
    Streams.applyDupSpanBatch(b2, cState, cOut, K, "t2")
    val wantFeed = feedOf(cOut)
    val wantLedger = ledgerOf(cState)
    assert(wantFeed.nonEmpty, "reference batch must flag a span")
    // crashed double-replay: publish-only (ledger has NO own rows —
    // exclude is a no-op), then a full attempt (appends the ledger),
    // then publish-only AGAIN (ledger now HAS own t2 rows — exclude
    // must hide them or every position self-flags), then the final
    // full replay
    val state = tmp("graft-dspan-dc") + "/ledger"
    val out = tmp("graft-dspan-dc-out") + "/feed"
    Documents.appendGramLedger(state, corpus, K, "seed")
    publishOnly(state, out, "t2")               // attempt 1: crash
    Streams.applyDupSpanBatch(b2, state, out, K, "t2") // attempt 2: crash
    publishOnly(state, out, "t2")               // attempt 3: crash
    Streams.applyDupSpanBatch(b2, state, out, K, "t2") // attempt 4: done
    assert(feedOf(out) === wantFeed,
      "interleaved crashed replays changed the published feed")
    assert(ledgerOf(state) === wantLedger,
      "interleaved crashed replays changed the ledger counts")
  }

  test("tokenizer-drift ledger: per-batch rows are q131's batch-side " +
       "stat under the frozen vocab, and replay is absorbing") {
    import graft.operators.Documents
    import spark.implicits._
    val base = tmp("graft-bpedrift")
    val (mp, tp, ledger) = (s"$base/merges", s"$base/types", s"$base/drift")
    Documents.bpeFreezeAt(spark, mp, tp,
      Seq("aaab", "aaab", "aaab").toDF("w"))
    // b1: aaab x3 (frozen, 1 token each) + zz unseen (char fallback, 2)
    val b1 = Seq((1L, "aaab aaab"), (2L, "aaab zz")).toDF("doc_id", "text")
    // b2: all-unseen — the drifted-batch signature
    val b2 = Seq((3L, "zz zz")).toDF("doc_id", "text")
    Streams.applyBpeDriftBatch(b1, tp, ledger, "b1")
    Streams.applyBpeDriftBatch(b2, tp, ledger, "b2")
    def feed() = Streams.bpeDriftFeed(spark, ledger)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val want = Seq(
      // 4 words, 1+1+1+2 tokens, 1 unseen, 14 chars -> cpt 28000, un 2500
      ("b1", 4L, 5L, 1L, 28000L, 2500L),
      // 2 words, 4 tokens, 2 unseen, 4 chars -> cpt 10000, un 10000
      ("b2", 2L, 4L, 2L, 10000L, 10000L))
    assert(feed() === want)
    // a checkpoint-replayed batch re-appends a byte-identical row under
    // the same id; the feed's first-wins collapse absorbs it
    Streams.applyBpeDriftBatch(b2, tp, ledger, "b2")
    assert(feed() === want, "replaying a batch changed the drift series")
  }

  test("classifier-drift ledger: per-batch rows are q135's statistic " +
       "under the frozen NB model, and replay is absorbing") {
    import graft.operators.Documents
    import spark.implicits._
    val base = tmp("graft-nbdrift")
    val (mp, ledger) = (s"$base/model", s"$base/drift")
    // good: 6666 bp, day: 5000, bad: 3333; prior = 5000
    graft.etl.Merge.materialize(spark, mp, Documents.nbTrainModel(
      Seq((1L, "good day", 1L), (2L, "bad day", 0L))
        .toDF("doc_id", "text", "y")))
    val b1 = Seq((10L, "good day")).toDF("doc_id", "text")
    val b2 = Seq((11L, "zzz qqq")).toDF("doc_id", "text")
    Streams.applyNbDriftBatch(b1, mp, ledger, "b1")
    Streams.applyNbDriftBatch(b2, mp, ledger, "b2")
    def feed() = Streams.nbDriftFeed(spark, ledger)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val want = Seq(
      // (6666+5000)//2 = 5833, in-vocab -> oov 0, shift +833
      ("b1", 2L, 0L, 0L, 5000L, 5833L, 833L),
      // all-OOV -> both occurrences score the prior, shift 0
      ("b2", 2L, 2L, 10000L, 5000L, 5000L, 0L))
    assert(feed() === want)
    Streams.applyNbDriftBatch(b2, mp, ledger, "b2") // replay
    assert(feed() === want, "replaying a batch changed the drift series")
  }

  test("drift/manifest feeds order numerically past 9 batches — " +
       "lexicographic batch_id ordering would scramble the time series " +
       "(code-review r18)") {
    import graft.operators.Documents
    import spark.implicits._
    val base = tmp("graft-nbdrift-order")
    val (mp, ledger) = (s"$base/model", s"$base/drift")
    graft.etl.Merge.materialize(spark, mp, Documents.nbTrainModel(
      Seq((1L, "good day", 1L), (2L, "bad day", 0L))
        .toDF("doc_id", "text", "y")))
    val b = Seq((10L, "good day")).toDF("doc_id", "text")
    // "10" < "2" lexicographically — the arrival order must win
    Streams.applyNbDriftBatch(b, mp, ledger, "2")
    Streams.applyNbDriftBatch(b, mp, ledger, "10")
    val order = Streams.nbDriftFeed(spark, ledger)
      .select("batch_id").as[String].collect().toSeq
    assert(order === Seq("2", "10"),
      s"feed is not in arrival order: $order")
  }

  test("classifier-drift sink wires end-to-end through foreachBatch") {
    import graft.operators.Documents
    import spark.implicits._
    val base = tmp("graft-nbdrift-sink")
    val (mp, ledger) = (s"$base/model", s"$base/drift")
    graft.etl.Merge.materialize(spark, mp, Documents.nbTrainModel(
      Seq((1L, "good day", 1L), (2L, "bad day", 0L))
        .toDF("doc_id", "text", "y")))
    val docs = Seq((10L, "good day")).toDF("doc_id", "text")
    val docsDir = tmp("graft-nbdrift-docs")
    docs.write.mode("overwrite").parquet(docsDir)
    val q = Streams.nbDriftSink(
      spark.readStream.schema(docs.schema).parquet(docsDir),
      mp, ledger, tmp("graft-nbdrift-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Streams.nbDriftFeed(spark, ledger)
      .select("n_occ", "n_oov", "oov_bp", "prior_bp", "batch_mean_bp",
        "shift_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 0L, 0L, 5000L, 5833L, 833L)))
  }

  test("tokenizer-drift sink wires end-to-end through foreachBatch") {
    import graft.operators.Documents
    import spark.implicits._
    val base = tmp("graft-bpedrift-sink")
    val (mp, tp, ledger) = (s"$base/merges", s"$base/types", s"$base/drift")
    Documents.bpeFreezeAt(spark, mp, tp,
      Seq("aaab", "aaab", "aaab").toDF("w"))
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab zz"))
      .toDF("doc_id", "text")
    val docsDir = tmp("graft-bpedrift-docs")
    docs.write.mode("overwrite").parquet(docsDir)
    val q = Streams.bpeDriftSink(
      spark.readStream.schema(docs.schema).parquet(docsDir),
      tp, ledger, tmp("graft-bpedrift-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Streams.bpeDriftFeed(spark, ledger)
      .select("n_words", "n_tokens", "n_unseen", "chars_per_token_bp",
        "unseen_bp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((4L, 5L, 1L, 28000L, 2500L)))
  }

  test("shard-manifest ledger: each batch packs on its own (published " +
       "shards are immutable), replay is absorbing") {
    import spark.implicits._
    val ledger = tmp("graft-shard-ledger") + "/manifest"
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    // b1: 3000 + 2000 tokens — both start inside shard 0 in EITHER hash
    // order (starts 0 and min(2000,3000) < 4096), so the row is
    // order-independent; b2: 4100 + 4100 — starts 0 and 4100 straddle
    // the budget in either order, two shards
    val b1 = Seq(doc(1L, 3000), doc(2L, 2000)).toDF("doc_id", "text")
    val b2 = Seq(doc(3L, 4100), doc(4L, 4100)).toDF("doc_id", "text")
    Streams.applyShardBatch(b1, ledger, "b1")
    Streams.applyShardBatch(b2, ledger, "b2")
    def feed() = Streams.shardManifestFeed(spark, ledger)
      .select("batch_id", "shard", "n_docs", "sum_tokens")
      .as[(String, Long, Long, Long)].collect().toSeq
    val want = Seq(
      ("b1", 0L, 2L, 5000L),
      ("b2", 0L, 1L, 4100L), ("b2", 1L, 1L, 4100L))
    assert(feed() === want)
    // b1's shards were published before b2 arrived — b2 appending must
    // not have renumbered them (the append-stability argument), and a
    // checkpoint-replayed batch re-packs byte-identically
    Streams.applyShardBatch(b1, ledger, "b1")
    assert(feed() === want, "replaying a batch changed the manifest")
    // compaction rewrites the file population (and GCs the replay
    // duplicates permanently) without changing what a reader sees
    val (before, after) = Streams.compactShardLedger(spark, ledger)
    assert(after < before,
      s"compaction did not reduce files: $before -> $after")
    assert(feed() === want, "compaction changed the manifest feed")
  }

  test("shard-manifest sink wires end-to-end through foreachBatch and " +
       "matches the batch-side shardManifest on the same docs") {
    import graft.operators.Documents
    import spark.implicits._
    val ledger = tmp("graft-shard-sink") + "/manifest"
    val docs = Seq((1L, Seq.fill(300)("w").mkString(" ")),
                   (2L, Seq.fill(200)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val docsDir = tmp("graft-shard-docs")
    docs.write.mode("overwrite").parquet(docsDir)
    val q = Streams.shardManifestSink(
      spark.readStream.schema(docs.schema).parquet(docsDir),
      ledger, tmp("graft-shard-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = Streams.shardManifestFeed(spark, ledger)
      .select("shard", "n_docs", "sum_tokens", "first_h", "last_h")
      .collect().toSeq
    val want = Documents.shardManifest(docs.select(col("doc_id"),
        graft.functions.Text.portableHash(col("doc_id").cast("string"))
          .as("h"),
        size(graft.functions.Text.toWords(col("text"))).cast("long")
          .as("n_tokens")))
      .select("shard", "n_docs", "sum_tokens", "first_h", "last_h")
      .collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("dup-span sink wires end-to-end through foreachBatch: one " +
       "AvailableNow batch over an empty ledger == the q126 finder") {
    import graft.operators.Documents
    val state = tmp("graft-dspan-sink-state") + "/ledger"
    val out = tmp("graft-dspan-sink-out") + "/feed"
    val docsDir = Files.createTempDirectory("graft-dspan-docs")
    Files.createSymbolicLink(
      docsDir.resolve("part-0.parquet"),
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    val docs = spark.readStream
      .schema(Tables.documentsSchema)
      .parquet(docsDir.toString)
    val q = Streams.dupSpanSink(docs, state, out,
      tmp("graft-dspan-ckpt"))
    assert(q.awaitTermination(120000), "stream did not drain")
    // a single batch against an empty ledger is the global >= 2 rule
    // over exactly that batch: the q126 finder on the same table
    val got = Streams.dupSpanFeed(spark, out)
      .select("doc_id", "start_pos", "end_pos", "n_tokens")
    val want = Documents.dupSpans(spark, sfDir)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0 &&
           want.exceptAll(got).count() === 0,
      "single-batch stream != q126 finder")
  }

  test("stateful funnel == independent per-user model, horizon ties " +
       "inclusive (q84's streaming twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val MinUs = 60L * 1000000L
    val clickHzUs = 30L * MinUs
    val purchHzUs = 120L * MinUs
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

    // crafted horizon-boundary users + a seeded random population. B > 0:
    // an event AT the initial watermark (epoch 0) is late-filtered before
    // the stateful operator ever sees it.
    val B = 10L * MinUs
    val crafted = Seq[(Long, Long, String)](
      (101L, B, "view"), (101L, B + 30L * MinUs, "click"),  // click AT horizon → clicked
      (102L, B, "view"), (102L, B + 31L * MinUs, "click"),  // past horizon → not clicked
      (103L, B, "view"), (103L, B + 10L * MinUs, "click"),
      (103L, B + 130L * MinUs, "purchase"),                 // purchase AT horizon → purchased
      (104L, B, "view"), (104L, B + 10L * MinUs, "click"),
      (104L, B + 131L * MinUs, "purchase"),                 // past → clicked only
      (105L, B + 5L * MinUs, "view"), (105L, B + 5L * MinUs, "click"),
      (105L, B + 5L * MinUs, "purchase"),                   // same-ts ties: full chain
      // purchase-less click must NOT let the view pair with an older chain
      (106L, B, "view"), (106L, B + 1L * MinUs, "click"))
    val rnd = new scala.util.Random(42)
    val types = Array("view", "click", "purchase")
    val random = (1L to 6L).flatMap { u =>
      var t = 0L
      (0 until 30).map { _ =>
        t += (rnd.nextInt(50) + 1) * MinUs
        (u, t, types(rnd.nextInt(3)))
      }
    }
    val all = crafted ++ random
    val maxUs = all.map(_._2).max
    // sentinels push the final watermark (maxUs+20h − 2h) past every
    // pending deadline so all real views resolve. TWO sentinel batches:
    // the first only RAISES the watermark (updated after its batch), the
    // second's processing actually fires the event-time timeouts.
    val sentinel1 = (999L, maxUs + 20L * 60L * MinUs, "view")
    val sentinel2 = (999L, maxUs + 21L * 60L * MinUs, "view")

    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Streams.statefulFunnel(
        ms.toDF().toDF("user_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // three event-time-ordered batches, then the flush sentinel
      val cut1 = maxUs / 3
      val cut2 = 2 * maxUs / 3
      val batches = Seq(
        all.filter(_._2 <= cut1), all.filter(e => e._2 > cut1 && e._2 <= cut2),
        all.filter(_._2 > cut2), Seq(sentinel1), Seq(sentinel2))
      batches.foreach { b =>
        ms.addData(b.map { case (u, t, tp) => (u, ts(t), tp) })
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("funnel_sink")
      .filter(col("user_id") =!= 999L)
      .select(col("user_id"), col("view_us"), col("clicked"), col("purchased"))
      .as[(Long, Long, Boolean, Boolean)].collect().sorted.toList

    // independent model of q84's semantics: per view the earliest click at
    // or after it (clicked iff within horizon), then that click's earliest
    // purchase at or after it (purchased iff within the click's horizon)
    val expect = all.groupBy(_._1).toList.flatMap { case (u, evs) =>
      val clicks = evs.filter(_._3 == "click").map(_._2).sorted
      val purchases = evs.filter(_._3 == "purchase").map(_._2).sorted
      evs.filter(_._3 == "view").map { case (_, v, _) =>
        val c = clicks.find(_ >= v)
        val clicked = c.exists(_ <= v + clickHzUs)
        val purchased = clicked &&
          purchases.find(_ >= c.get).exists(_ <= c.get + purchHzUs)
        (u, v, clicked, purchased)
      }
    }.sorted
    assert(got === expect)
    // the crafted boundary rows, by name
    def row(u: Long) = got.filter(_._1 == u)
    assert(row(101L) === List((101L, B, true, false)))
    assert(row(102L) === List((102L, B, false, false)))
    assert(row(103L) === List((103L, B, true, true)))
    assert(row(104L) === List((104L, B, true, false)))
    assert(row(105L) === List((105L, B + 5L * MinUs, true, true)))
    assert(row(106L) === List((106L, B, true, false)))
  }

  test("readEvents bootstraps on an empty directory a producer fills later") {
    // FileStreamSource's normal lifecycle: the stream is defined on an
    // empty (even not-yet-created) directory and a producer lands files
    // afterwards. ADVICE r10: the footer-probing reader must fall back to
    // the current-generation MICROS schema when there is no file to
    // probe, not refuse to start.
    val dir = tmp("graft-boot-dir")
    val stream = Streams.readEvents(spark, dir) // must not throw
    assert(stream.schema === Tables.eventsSchema)
    Tables.events(spark, sfDir).limit(7)
      .write.mode("append").parquet(dir) // producer arrives after definition
    val out = tmp("graft-boot-out")
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft-boot-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(spark.read.parquet(out).count() === 7)
  }
}
