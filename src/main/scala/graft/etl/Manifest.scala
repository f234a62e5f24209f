package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-artifact SNAPSHOT publication (VERDICT r11 item 5) — the
  * minimum-viable form of the lakehouse commit idea (one manifest
  * pointing at immutable data generations; what Delta/Iceberg do with
  * logs and snapshot files, at the size this engine needs).
  *
  * The gap it closes: every materialized model here ([[Merge.materialize]]
  * / [[Merge.writeAndSwap]]) swaps atomically PER ARTIFACT, but a query
  * that reads TWO artifacts (q99's postings + the corpus, q90's leaders +
  * embeddings) can interleave with a refresh and see new postings against
  * an old corpus — each read individually fine, the PAIR inconsistent.
  *
  * Protocol:
  *  - each artifact lives as immutable GENERATION directories
  *    `root/<name>/gen-<g>`; a generation referenced by a published
  *    manifest is never rewritten (publishes always bump from the
  *    current manifest, so reruns of a crashed publish overwrite only
  *    never-referenced generations);
  *  - ONE tiny parquet manifest `root/MANIFEST` maps name → generation,
  *    swapped through the existing crash-safe [[Merge.writeAndSwap]] —
  *    the single atomic point. [[resolve]] reads the manifest ONCE and
  *    returns pinned paths: everything a reader opens through that
  *    snapshot is from one publish, so a concurrent [[publish]] can
  *    never tear a multi-artifact read (ManifestSpec drives exactly that
  *    interleaving);
  *  - a death between generation writes and the manifest swap leaves
  *    orphan generation dirs and an untouched manifest — readers keep
  *    the old snapshot for EVERY member, the crash is invisible;
  *    [[vacuum]] sweeps orphans and superseded generations offline (the
  *    [[Merge.compact]] stance: maintenance runs without readers holding
  *    paths older than `keep` publishes).
  */
object Manifest {

  private def manifestPath(root: String) = s"$root/MANIFEST"

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Current name → generation map (empty if never published); adopts a
    * crashed manifest swap first, like every artifact read. */
  def current(s: SparkSession, root: String): Map[String, Long] = {
    val f = fs(s, root)
    Merge.recoverSwap(f, manifestPath(root))
    if (!f.exists(new Path(manifestPath(root)))) Map.empty
    else s.read.parquet(manifestPath(root))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** One consistent snapshot: name → pinned generation path. A single
    * manifest read backs the whole map — the consistency unit. */
  def resolve(s: SparkSession, root: String): Map[String, String] =
    current(s, root).map { case (n, g) => n -> s"$root/$n/gen-$g" }

  /** Publish `updates` as ONE snapshot: each updated artifact lands as
    * its next generation directory, then the manifest swaps once.
    * Artifacts not in `updates` keep their current generation — the new
    * snapshot pairs them with the updates consistently. Returns the
    * published name → generation map. */
  def publish(s: SparkSession, root: String,
              updates: Map[String, DataFrame]): Map[String, Long] = {
    require(updates.nonEmpty, "publish needs at least one artifact")
    val cur = current(s, root)
    val next = cur ++ updates.keys.map(n => n -> (cur.getOrElse(n, 0L) + 1L))
    updates.foreach { case (n, df) =>
      // overwrite: a rerun after a pre-swap crash rewrites the SAME
      // never-referenced generation — idempotent
      df.write.mode("overwrite").parquet(s"$root/$n/gen-${next(n)}")
    }
    import s.implicits._
    Merge.writeAndSwap(
      next.toSeq.sorted.toDF("name", "gen").coalesce(1),
      manifestPath(root), s"pub${next.values.max}")
    next
  }

  /** Publish-if-absent ([[Merge.materialize]]'s shape lifted to a
    * snapshot): builders run only when the root has no manifest yet;
    * either way the caller gets one consistent resolved snapshot. */
  def ensure(s: SparkSession, root: String,
             builders: Map[String, () => DataFrame]): Map[String, String] = {
    if (current(s, root).isEmpty)
      publish(s, root, builders.map { case (n, b) => n -> b() })
    resolve(s, root)
  }

  /** OFFLINE GC: deletes generation dirs more than `keep` publishes
    * behind the current manifest, and orphans above it (crashed or
    * abandoned publishes). Run it like [[Merge.compact]] — on a
    * maintenance cadence, when no reader holds snapshots older than
    * `keep` publishes back. Returns deleted directory count. */
  def vacuum(s: SparkSession, root: String, keep: Int = 1): Int = {
    require(keep >= 1, "vacuum must keep at least the current generation")
    val f = fs(s, root)
    val cur = current(s, root)
    cur.keys.toSeq.sorted.map { n =>
      val gens = Option(f.globStatus(new Path(s"$root/$n/gen-*")))
        .getOrElse(Array.empty)
      gens.map(_.getPath).filter { p =>
        val g = p.getName.stripPrefix("gen-").toLong
        g <= cur(n) - keep || g > cur(n)
      }.count(p => f.delete(p, true))
    }.sum
  }
}
