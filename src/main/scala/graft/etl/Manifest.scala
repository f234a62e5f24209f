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

  /** [[publish]] with the manifest sequence pinned and an optional
    * `beforeRename` hook — the seams ManifestSpec uses to drive the race
    * windows deterministically (a rival lands `m-<mySeq>`, or a vacuum
    * runs, between this publisher's generation writes and its rename).
    *
    * Rename-race hardening (ADVICE r13): the pre-rename `exists(dst)`
    * check is not atomic with the rename — if a rival's `m-<seq>` lands
    * in the window between them, Hadoop `FileSystem.rename` moves the
    * `.tmp-` dir INTO the existing destination directory and returns
    * true, so a bare rename-result check would report success while the
    * loser's snapshot silently vanished (the nested dot-dir is invisible
    * to parquet readers). So each publisher writes a UNIQUE `_pub-<uuid>`
    * token file into its tmp dir and, after a "successful" rename,
    * verifies the token sits DIRECTLY under `dst`: if it does, this
    * publisher's rename was the one that created `m-<seq>`; if it does
    * not, the rival won — the loser removes its nested dir and fails
    * loudly, exactly the documented serialization contract. The token
    * stays in place afterwards (parquet readers ignore `_`-prefixed
    * files; the published manifest dir is never mutated). */
  private[etl] def publishAt(s: SparkSession, root: String,
      updates: Map[String, DataFrame], mySeq: Long,
      beforeRename: () => Unit = () => ()): Map[String, Long] = {
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
    // The staging dir is unique PER PUBLISHER, not per sequence (ADVICE
    // r14): racing same-seq publishers sharing `.tmp-<seq>` could mutate
    // each other's staging dir — the rival's mode(overwrite) write deletes
    // the first publisher's in-flight tmp (token included), after which
    // one racer can rename the OTHER's tmp, possibly mid-parquet-commit,
    // into m-<seq>: both report failure while a torn manifest becomes the
    // visible head. With the token uuid in the tmp NAME, no two
    // publishers ever touch the same staging path; the rename still
    // targets m-<seq>, so the serialization contract and the token check
    // are unchanged, and vacuum's `.tmp-*` glob still matches.
    val uuid = java.util.UUID.randomUUID()
    val tmp = new Path(manifestDir(root), s".tmp-$mySeq-$uuid")
    val dst = new Path(manifestDir(root), s"m-$mySeq")
    next.toSeq.sorted.toDF("name", "gen")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val token = s"_pub-$uuid"
    f.create(new Path(tmp, token)).close()
    def lose(): Nothing = {
      // undo a rename-into-dst nesting so the winner's manifest dir stays
      // exactly as the winner published it, then fail loudly
      f.delete(new Path(dst, tmp.getName), true)
      f.delete(tmp, true)
      throw new java.io.IOException(
        s"manifest $dst already published — concurrent publisher won; rerun")
    }
    if (f.exists(dst)) lose()
    beforeRename() // ← the exists-to-rename window the token check closes
    if (!f.rename(tmp, dst)) lose()
    if (!f.exists(new Path(dst, token))) lose()
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

  /** Member-level [[ensure]]: builders run for exactly the names the
    * current manifest lacks, landing them in ONE publish that pairs them
    * consistently with every existing member. The growth path for a
    * shared snapshot root — q99 publishes {corpus, postings}; q122 later
    * widens the same root with its BM25 members without rebuilding (or
    * even reading) the ones already there. Unchanged members keep their
    * generation, so the new manifest is pair-consistent across old and
    * new by construction. Racing wideners serialize exactly like racing
    * publishers (the rename contract); a loser RE-CALLS itself (ADVICE
    * r14: the scaladoc prescribed the retry but the code threw to the
    * query caller) — its missing set shrinks by whatever the winner
    * landed, so one retry per contending widener converges; `retries`
    * bounds pathological contention, after which the loss surfaces. */
  def ensureMembers(s: SparkSession, root: String,
      builders: Map[String, () => DataFrame],
      retries: Int = 2): Map[String, String] =
    ensureMembersAt(s, root, builders, retries)

  /** [[ensureMembers]] with the pre-rename race seam exposed —
    * ManifestSpec drives a rival widener to completion inside the
    * window and proves the loser's re-call converges instead of
    * throwing to the query caller. The hook fires only on attempts that
    * actually publish (a retry whose missing set emptied never races). */
  private[etl] def ensureMembersAt(s: SparkSession, root: String,
      builders: Map[String, () => DataFrame], retries: Int,
      beforeRename: () => Unit = () => ()): Map[String, String] = {
    val have = current(s, root).keySet
    val missing = builders.filterNot { case (n, _) => have(n) }
    if (missing.nonEmpty)
      try publishAt(s, root, missing.map { case (n, b) => n -> b() },
        seqs(s, root).lastOption.getOrElse(0L) + 1L, beforeRename)
      catch {
        case e: java.io.IOException =>
          if (retries <= 0) throw e
          return ensureMembersAt(s, root, builders, retries - 1,
            beforeRename)
      }
    resolve(s, root)
  }

  /** A status's modification time, hardened for object stores (ADVICE
    * r13): on HDFS-like filesystems a directory's own modtime is the
    * honest signal, but object-store "directories" are synthetic and can
    * report epoch 0 — which would make every orphan look aged-out and
    * re-open the vacuum-vs-publish race the grace period closes. When the
    * entry reports 0, fall back to the newest modtime among ALL files
    * beneath it — recursively (ADVICE r14: a partitioned generation dir
    * on a synthetic-dir store has epoch-0 child DIRS too, so a
    * one-level fallback still yields 0 and a live publish's partitioned
    * generation would age out past grace). An in-flight publish's data
    * files are fresh at any depth; only a truly file-free epoch-0 tree
    * keeps 0 and ages out.
    *
    * The recursive listing races with publishers (ADVICE r15): a `.tmp-*`
    * staging dir captured by vacuum's glob can be renamed away before
    * this listing runs — the listing then throws FileNotFoundException,
    * which previously aborted the WHOLE vacuum. A vanished entry is by
    * definition being actively worked on, so report it as maximally
    * fresh (Long.MaxValue): it never ages past grace, is skipped this
    * pass, and the next vacuum sees the settled state. */
  private[etl] def effectiveModTime(f: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Long =
    if (st.getModificationTime > 0L || !st.isDirectory) st.getModificationTime
    else
      try {
        var max = 0L
        val it = f.listFiles(st.getPath, true)
        while (it.hasNext) max = math.max(max, it.next().getModificationTime)
        max
      } catch {
        case _: java.io.FileNotFoundException => Long.MaxValue
      }

  /** OFFLINE GC. Retains the newest `keep` manifests and every generation
    * any of them references (keep=1 ⇒ only the current snapshot's
    * generations survive — readers at most `keep-1` publishes behind the
    * head stay whole). Deletes: older manifest files, generation dirs no
    * retained manifest references, and — only when their modification
    * time ([[effectiveModTime]]) is more than `graceMs` in the past —
    * orphan generations above the head and stranded `.tmp-` manifests, so
    * a vacuum overlapping an in-flight publish never destroys the
    * generations its about-to-land manifest will reference.
    *
    * The artifact-name scan set comes from LISTING the root's child
    * directories, not from retained-manifest keys (ADVICE r13): a crashed
    * first-ever publish of a brand-new name leaves `root/<name>/gen-1`
    * with that name in no manifest — a manifest-derived scan would orphan
    * it forever; the listing-derived scan ages it out behind the same
    * grace guard as every other orphan. Returns deleted path count. */
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
    val names = Option(f.listStatus(new Path(root))).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_ == "_manifests").toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val oldManifests = drop
      .map(q => new Path(manifestDir(root), s"m-$q"))
      .count(p => f.delete(p, true))
    // Stranded staging dirs live in two places: the manifest dir itself
    // (a publisher that died before its rename) and NESTED inside a
    // published m-<seq> (ADVICE r14: a loser whose rename moved its tmp
    // INTO the winner's dir, then crashed between rename and lose() —
    // invisible to parquet readers but real bytes, and the top-level
    // glob never saw it). Both sweep behind the same grace guard.
    val staleTmps = (
        Option(f.globStatus(new Path(manifestDir(root), ".tmp-*")))
          .getOrElse(Array.empty) ++
        Option(f.globStatus(new Path(manifestDir(root), "m-*/.tmp-*")))
          .getOrElse(Array.empty))
      .filter(effectiveModTime(f, _) < cutoff)
      .count(st => f.delete(st.getPath, true))
    val gens = names.toSeq.sorted.map { n =>
      val head = snapshots.last.getOrElse(n, 0L)
      Option(f.globStatus(new Path(s"$root/$n/gen-*")))
        .getOrElse(Array.empty)
        .filter { st =>
          val g = st.getPath.getName.stripPrefix("gen-").toLong
          !referenced((n, g)) &&
            (g < head || effectiveModTime(f, st) < cutoff)
        }.count(st => f.delete(st.getPath, true))
    }.sum
    oldManifests + staleTmps + gens
  }
}
