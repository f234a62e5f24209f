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
  * Protocol (ADVICE r12: reads must be MUTATION-FREE and the swap atomic
  * for readers — the previous delete-then-rename single-file swap let a
  * reader's orphan-adoption race a publisher's rename):
  *  - each artifact lives as immutable GENERATION directories
  *    `root/<name>/gen-<g>`; a generation referenced by a published
  *    manifest is never rewritten (publishes always bump from the
  *    current manifest, so reruns of a crashed publish overwrite only
  *    never-referenced generations);
  *  - manifests themselves are IMMUTABLE numbered files — the Delta-log
  *    move: publish writes `root/_manifests/.tmp-<seq>` then renames it
  *    to `m-<seq>`, a name that never existed before. The rename is the
  *    single visibility point; there is no delete and no rename-over, so
  *    a reader listing `m-*` mid-publish sees either the old max or the
  *    new max, both complete. [[current]]/[[resolve]] NEVER mutate the
  *    filesystem — no adoption, no recovery rename — so any number of
  *    concurrent readers are safe against one publisher;
  *  - two RACING publishers serialize on the rename: the loser's rename
  *    target already exists and it fails loudly rather than silently
  *    dropping a snapshot (single-writer, like every sink here);
  *  - a death between generation writes and the manifest rename leaves
  *    orphan generation dirs (and possibly a `.tmp-` manifest) and no new
  *    `m-` file — readers keep the old snapshot for EVERY member, the
  *    crash is invisible; [[vacuum]] sweeps superseded generations and,
  *    behind a modification-time GRACE PERIOD, abandoned orphans (the
  *    grace keeps a live publish's not-yet-referenced generations safe
  *    from an overlapping vacuum — ADVICE r12).
  */
object Manifest {

  private def manifestDir(root: String) = new Path(s"$root/_manifests")

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Published manifest sequence numbers, ascending (empty if never
    * published). Pure listing — no mutation. */
  private def seqs(s: SparkSession, root: String): Seq[Long] = {
    val f = fs(s, root)
    Option(f.globStatus(new Path(manifestDir(root), "m-*")))
      .getOrElse(Array.empty)
      .map(_.getPath.getName.stripPrefix("m-").toLong).sorted.toSeq
  }

  private def readManifest(s: SparkSession, root: String,
                           seq: Long): Map[String, Long] =
    s.read.parquet(new Path(manifestDir(root), s"m-$seq").toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Current name → generation map (empty if never published). Reads the
    * highest-numbered manifest file; touches nothing. */
  def current(s: SparkSession, root: String): Map[String, Long] =
    seqs(s, root).lastOption
      .map(readManifest(s, root, _)).getOrElse(Map.empty)

  /** One consistent snapshot: name → pinned generation path. A single
    * manifest read backs the whole map — the consistency unit. */
  def resolve(s: SparkSession, root: String): Map[String, String] =
    current(s, root).map { case (n, g) => n -> s"$root/$n/gen-$g" }

  /** Publish `updates` as ONE snapshot: each updated artifact lands as
    * its next generation directory, then manifest `m-<seq+1>` appears via
    * one rename. Artifacts not in `updates` keep their current generation
    * — the new snapshot pairs them with the updates consistently. Returns
    * the published name → generation map. Throws if a concurrent
    * publisher won the same sequence number (single-writer contract). */
  def publish(s: SparkSession, root: String,
              updates: Map[String, DataFrame]): Map[String, Long] =
    publishAt(s, root, updates, seqs(s, root).lastOption.getOrElse(0L) + 1L)

  /** [[publish]] with the manifest sequence pinned — the seam ManifestSpec
    * uses to drive the racing-publisher window deterministically (a rival
    * lands `m-<mySeq>` between this publisher's listing and its rename). */
  private[etl] def publishAt(s: SparkSession, root: String,
      updates: Map[String, DataFrame], mySeq: Long): Map[String, Long] = {
    require(updates.nonEmpty, "publish needs at least one artifact")
    val f = fs(s, root)
    val cur = current(s, root)
    val next = cur ++ updates.keys.map(n => n -> (cur.getOrElse(n, 0L) + 1L))
    updates.foreach { case (n, df) =>
      // overwrite: a rerun after a pre-rename crash rewrites the SAME
      // never-referenced generation — idempotent
      df.write.mode("overwrite").parquet(s"$root/$n/gen-${next(n)}")
    }
    import s.implicits._
    val tmp = new Path(manifestDir(root), s".tmp-$mySeq")
    val dst = new Path(manifestDir(root), s"m-$mySeq")
    next.toSeq.sorted.toDF("name", "gen")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(dst) || !f.rename(tmp, dst))
      throw new java.io.IOException(
        s"manifest $dst already published — concurrent publisher won; rerun")
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

  /** OFFLINE GC. Retains the newest `keep` manifests and every generation
    * any of them references (keep=1 ⇒ only the current snapshot's
    * generations survive — readers at most `keep-1` publishes behind the
    * head stay whole). Deletes: older manifest files, generation dirs no
    * retained manifest references, and — only when their modification
    * time is more than `graceMs` in the past — orphan generations above
    * the head and stranded `.tmp-` manifests, so a vacuum overlapping an
    * in-flight publish never destroys the generations its about-to-land
    * manifest will reference. Returns deleted path count. */
  def vacuum(s: SparkSession, root: String, keep: Int = 1,
             graceMs: Long = 15 * 60 * 1000L): Int = {
    require(keep >= 1, "vacuum must keep at least the current snapshot")
    val f = fs(s, root)
    val all = seqs(s, root)
    if (all.isEmpty) return 0
    val (drop, kept) = all.splitAt(math.max(0, all.size - keep))
    val snapshots = kept.map(readManifest(s, root, _))
    val referenced: Set[(String, Long)] =
      snapshots.flatten.map { case (n, g) => (n, g) }.toSet
    val names = snapshots.flatten.map(_._1).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val oldManifests = drop
      .map(q => new Path(manifestDir(root), s"m-$q"))
      .count(p => f.delete(p, true))
    val staleTmps = Option(
        f.globStatus(new Path(manifestDir(root), ".tmp-*")))
      .getOrElse(Array.empty)
      .filter(_.getModificationTime < cutoff)
      .count(st => f.delete(st.getPath, true))
    val gens = names.toSeq.sorted.map { n =>
      val head = snapshots.last.getOrElse(n, 0L)
      Option(f.globStatus(new Path(s"$root/$n/gen-*")))
        .getOrElse(Array.empty)
        .filter { st =>
          val g = st.getPath.getName.stripPrefix("gen-").toLong
          !referenced((n, g)) &&
            (g < head || st.getModificationTime < cutoff)
        }.count(st => f.delete(st.getPath, true))
    }.sum
    oldManifests + staleTmps + gens
  }
}
