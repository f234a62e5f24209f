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

  test("vacuum sweeps superseded generations and orphans, never the " +
       "current snapshot") {
    val root = newRoot()
    Manifest.publish(spark, root, pair(1L))
    Manifest.publish(spark, root, pair(2L))
    Manifest.publish(spark, root, pair(3L))
    Seq((9L, "l")).toDF("ver", "side")
      .write.parquet(s"$root/left/gen-9") // abandoned publish
    val deleted = Manifest.vacuum(spark, root, keep = 1)
    assert(deleted === 5, s"expected 2+2 superseded + 1 orphan, got $deleted")
    assert(versionsOf(Manifest.resolve(spark, root)) === Set(3L))
  }
}
