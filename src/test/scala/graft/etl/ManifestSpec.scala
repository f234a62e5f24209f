package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-artifact snapshot contract (VERDICT r11 item 5): a reader
  * resolving through the manifest NEVER observes mixed generations across
  * a concurrent publish — the pair-atomicity that per-artifact swaps
  * can't give. Plus the crash window (generations written, manifest not
  * swapped → old snapshot everywhere), ensure-idempotence, and vacuum. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("graft_manifest").toString

  /** Two artifacts stamped with the same version — a mixed read shows
    * two different stamps. */
  private def pair(version: Long) = Map(
    "left"  -> Seq((version, "l")).toDF("ver", "side"),
    "right" -> Seq((version, "r")).toDF("ver", "side"))

  private def versionsOf(snap: Map[String, String]): Set[Long] =
    snap.values.map(p =>
      spark.read.parquet(p).select("ver").head.getLong(0)).toSet

  test("a snapshot resolved BEFORE a publish stays pair-consistent while " +
       "and after the new snapshot lands — no mixed generations") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    val oldSnap = Manifest.resolve(spark, root)
    assert(versionsOf(oldSnap) === Set(1L))
    // concurrent refresh: both artifacts republished
    Manifest.publish(spark, root, pair(2L))
    // the in-flight reader's pinned snapshot is UNTOUCHED and uniform…
    assert(versionsOf(oldSnap) === Set(1L),
      "published generations were rewritten under a live snapshot")
    // …and a fresh resolve is uniformly the new publish
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(2L))
  }

  test("partial-update publish pairs untouched members consistently") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    Manifest.publish(spark, root,
      Map("left" -> Seq((2L, "l")).toDF("ver", "side")))
    val snap = Manifest.resolve(spark, root)
    assert(snap("left").endsWith("gen-2") && snap("right").endsWith("gen-1"))
    assert(versionsOf(snap) === Set(2L, 1L)) // stale data, CONSISTENT refs
  }

  test("crash window: generations written but manifest not swapped → " +
       "readers keep the old snapshot for every member") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // simulate a death mid-publish: the would-be gen-2 dirs land, the
    // manifest swap never runs
    Seq((2L, "l")).toDF("ver", "side")
      .write.parquet(s"$root/left/gen-2")
    assert(Manifest.resolve(spark, root)("left").endsWith("gen-1"),
      "an unpublished orphan generation became visible")
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(1L))
    // the rerun bumps from the CURRENT manifest and overwrites only the
    // never-referenced orphan
    Manifest.publish(spark, root, pair(2L))
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(2L))
  }

  test("ensure publishes once and is a no-op after (materialize lifted " +
       "to snapshots)") {
    val root = newRoot()
    var built = 0
    def b(v: Long) = () => { built += 1; Seq((v, "x")).toDF("ver", "side") }
    val s1 = Manifest.ensure(spark, root, Map("a" -> b(7L), "b" -> b(7L)))
    assert(built === 2 && versionsOf(s1) === Set(7L))
    val s2 = Manifest.ensure(spark, root, Map("a" -> b(8L), "b" -> b(8L)))
    assert(built === 2, "ensure rebuilt an existing snapshot")
    assert(s2 === s1)
  }

  test("vacuum sweeps superseded generations, aged orphans, and old " +
       "manifests — never the current snapshot") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    Manifest.publish(spark, root, pair(2L))
    Manifest.publish(spark, root, pair(3L))
    Seq((9L, "l")).toDF("ver", "side")
      .write.parquet(s"$root/left/gen-9") // abandoned publish
    // grace=0 ⇒ the abandoned orphan counts as aged out
    val deleted = Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(deleted === 7,
      s"expected 2+2 superseded gens + 1 orphan + 2 old manifests, got $deleted")
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(3L))
  }

  test("vacuum's grace period protects an in-flight publish's " +
       "not-yet-referenced generations (ADVICE r12)") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // an in-flight publish has written its gen-2 dirs but not yet renamed
    // its manifest — a default-grace vacuum must leave them alone
    Seq((2L, "l")).toDF("ver", "side").write.parquet(s"$root/left/gen-2")
    Seq((2L, "r")).toDF("ver", "side").write.parquet(s"$root/right/gen-2")
    assert(Manifest.vacuum(spark, root, keep = 1) === 0,
      "vacuum destroyed a live publish's pending generations")
    // the publish completes against intact generations
    Manifest.publish(spark, root, pair(2L))
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(2L))
  }

  test("keep=2 retains the previous snapshot whole — a reader one " +
       "publish behind still resolves every member") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    val oldSnap = Manifest.resolve(spark, root)
    Manifest.publish(spark, root, pair(2L))
    Manifest.vacuum(spark, root, keep = 2, graceMs = 0L)
    assert(versionsOf(oldSnap) === Set(1L),
      "keep=2 vacuum deleted generations the previous manifest references")
    Manifest.vacuum(spark, root, keep = 1, graceMs = 0L)
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(2L))
  }

  test("reads are mutation-free: current/resolve leave the root's file " +
       "listing bit-identical (ADVICE r12)") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    def listing(): Set[String] = {
      val b = Files.walk(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        b.iterator().asScala.map(_.toString).toSet
      } finally b.close()
    }
    val before = listing()
    Manifest.current(spark, root)
    Manifest.resolve(spark, root)
    assert(listing() === before, "a pure read mutated the manifest root")
  }

  test("racing publishers serialize: the loser fails loudly instead of " +
       "silently dropping a snapshot") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // the rival lands m-2 between this publisher's listing and its
    // rename — driven through the pinned-sequence seam
    Seq(("left", 1L), ("right", 1L)).toDF("name", "gen")
      .coalesce(1).write.parquet(s"$root/_manifests/m-2")
    intercept[java.io.IOException] {
      Manifest.publishAt(spark, root, pair(2L), mySeq = 2L)
    }
    // the winner's snapshot is untouched by the loser's failure
    assert(Manifest.current(spark, root) ===
      Map("left" -> 1L, "right" -> 1L))
  }

  test("rename-race window (ADVICE r13): a rival landing m-<seq> AFTER " +
       "the loser's exists-check still loses loudly — no silent nesting") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    val rival = Seq(("left", 9L), ("right", 9L)).toDF("name", "gen")
    // the hook fires between the exists(dst) check and the rename: the
    // exact window where Hadoop rename would move .tmp-2 INTO m-2 and
    // report success
    intercept[java.io.IOException] {
      Manifest.publishAt(spark, root, pair(2L), mySeq = 2L,
        beforeRename = () =>
          rival.coalesce(1).write.parquet(s"$root/_manifests/m-2"))
    }
    // the rival's manifest is exactly what the rival wrote — no nested
    // .tmp- child smuggled in, no extra rows
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/m-2/.tmp-*"))).getOrElse(Array.empty).isEmpty)
    assert(Manifest.current(spark, root) ===
      Map("left" -> 9L, "right" -> 9L))
  }

  test("vacuum interleaved INSIDE a publish (listing before the rename) " +
       "leaves the about-to-be-referenced generations intact") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // the publisher's gen-2 dirs are on disk but m-2 is not yet renamed
    // when the vacuum runs — the grace period must protect them
    var swept = -1
    Manifest.publishAt(spark, root, pair(2L), mySeq = 2L,
      beforeRename = () => swept = Manifest.vacuum(spark, root, keep = 1))
    assert(swept === 0, "vacuum destroyed a mid-publish generation")
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(2L))
  }

  test("a crashed FIRST-EVER publish of a brand-new artifact name is " +
       "vacuumable once aged (ADVICE r13: scan from the root listing)") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // a publish introducing name "mid" died before its manifest rename —
    // "mid" appears in no manifest, so a manifest-derived scan would
    // never reclaim it
    Seq((1L, "m")).toDF("ver", "side").write.parquet(s"$root/mid/gen-1")
    assert(Manifest.vacuum(spark, root, keep = 1) === 0,
      "grace must still protect a fresh orphan")
    assert(Manifest.vacuum(spark, root, keep = 1, graceMs = 0L) === 1,
      "aged orphan of a never-published name must be reclaimed")
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(1L))
  }

  test("same-seq racers have DISJOINT staging dirs (ADVICE r14): a live " +
       "rival publishing to completion mid-window cannot clobber this " +
       "publisher's tmp, and the loser still fails loudly") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // the rival is a REAL full publishAt at the SAME sequence, fired in
    // the exists-to-rename window. Under the old shared `.tmp-<seq>`
    // path its mode(overwrite) staging write would have deleted this
    // publisher's in-flight tmp (token included) — the clobber the
    // unique-per-publisher staging dir makes impossible.
    var rivalPublished: Map[String, Long] = Map.empty
    intercept[java.io.IOException] {
      Manifest.publishAt(spark, root, pair(2L), mySeq = 2L,
        beforeRename = () =>
          rivalPublished = Manifest.publishAt(spark, root,
            Map("left" -> Seq((9L, "l")).toDF("ver", "side")), mySeq = 2L))
    }
    // the rival won cleanly; its snapshot is the visible head, untorn
    assert(rivalPublished === Map("left" -> 2L, "right" -> 1L))
    assert(Manifest.current(spark, root) === rivalPublished)
    assert(spark.read.parquet(Manifest.resolve(spark, root)("left"))
      .select("ver").head.getLong(0) === 9L)
    // and the loser's lose() cleaned its nested staging dir
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/m-2/.tmp-*"))).getOrElse(Array.empty).isEmpty)
  }

  test("ensureMembers re-calls the loser path (ADVICE r14): a rival " +
       "widener landing the same member mid-window is absorbed by the " +
       "retry instead of throwing to the query caller") {
    val root = newRoot()
    Manifest.publish(spark, root,
      Map("corpus" -> Seq((1L, "c")).toDF("ver", "side")))
    var built = 0
    val builders = Map(
      "corpus" -> (() => { built += 1; Seq((8L, "c")).toDF("ver", "side") }),
      "bm25"   -> (() => { built += 1; Seq((8L, "b")).toDF("ver", "side") }))
    // the rival wins the same sequence inside the exists-to-rename
    // window, landing the very member this call is trying to add
    var raced = false
    val snap = Manifest.ensureMembersAt(spark, root, builders, retries = 2,
      beforeRename = () => if (!raced) {
        raced = true
        Manifest.publish(spark, root,
          Map("bm25" -> Seq((9L, "b")).toDF("ver", "side")))
      })
    // no exception; the snapshot is whole; the WINNER's member survived
    assert(snap.keySet === Set("corpus", "bm25"))
    assert(spark.read.parquet(snap("bm25")).select("ver").head.getLong(0)
      === 9L, "the retry rebuilt over the winner's member")
    assert(spark.read.parquet(snap("corpus")).select("ver").head.getLong(0)
      === 1L, "ensure must not rebuild an existing member")
    assert(built === 1, "the missing builder must run exactly once")
  }

  test("nested stale staging dirs inside a published m-<seq> are swept " +
       "behind the grace guard (ADVICE r14: crash between rename and " +
       "lose)") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // a loser's rename nested its tmp into the winner's manifest dir,
    // then it crashed before lose() could clean up
    val nested = s"$root/_manifests/m-1/.tmp-1-dead"
    Seq(("left", 1L)).toDF("name", "gen").coalesce(1).write.parquet(nested)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(Manifest.vacuum(spark, root, keep = 1) === 0,
      "grace must protect a fresh nested staging dir")
    assert(Manifest.vacuum(spark, root, keep = 1, graceMs = 0L) === 1,
      "aged nested staging dir must be reclaimed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(nested)))
    // the winner's manifest still reads whole
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(1L))
  }

  test("epoch-0 modtimes on a PARTITIONED generation (epoch-0 child dirs " +
       "too) fall back recursively to leaf-file modtimes (ADVICE r14)") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    // a partitioned in-flight generation: gen-2/part=a/files
    Seq((2L, "a", "l")).toDF("ver", "part", "side")
      .write.partitionBy("part").parquet(s"$root/left/gen-2")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // synthetic-dir store: the dir AND its child dirs all report epoch 0;
    // only the leaf files carry real (fresh) modtimes
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$root/left/gen-2"), 0L, 0L)
    Option(fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/left/gen-2")))
      .getOrElse(Array.empty).filter(_.isDirectory)
      .foreach(st => fs.setTimes(st.getPath, 0L, 0L))
    assert(Manifest.vacuum(spark, root, keep = 1) === 0,
      "one-level fallback aged out a live partitioned generation")
  }

  test("a staging dir renamed away between vacuum's glob and its " +
       "recursive listing reads as maximally fresh instead of aborting " +
       "the vacuum (ADVICE r15)") {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // replay the race deterministically: a FileStatus captured by the
    // glob (epoch-0 dir → the recursive-listing fallback fires) whose
    // path a racing publisher has since renamed away
    val vanished = new FileStatus(
      0L, true, 0, 0L, 0L, new Path(s"$root/_manifests/.tmp-9-gone"))
    assert(Manifest.effectiveModTime(fs, vanished) === Long.MaxValue,
      "a vanished entry must read as fresh (skipped this pass), " +
      "not throw and kill the sweep")
    // and a full vacuum over a root containing only live state still
    // completes and deletes nothing
    assert(Manifest.vacuum(spark, root, keep = 1) === 0)
  }

  test("epoch-0 directory modtimes (synthetic object-store dirs) fall " +
       "back to child-file modtimes — the grace still protects") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    Seq((2L, "l")).toDF("ver", "side").write.parquet(s"$root/left/gen-2")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate a synthetic-directory listing: the dir itself reports 0
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$root/left/gen-2"), 0L, 0L)
    assert(Manifest.vacuum(spark, root, keep = 1) === 0,
      "epoch-0 dir modtime defeated the grace period")
    Manifest.publish(spark, root, Map(
      "left" -> Seq((2L, "l")).toDF("ver", "side")))
    assert(Manifest.resolve(spark, root)("left").endsWith("gen-2"))
  }
}
