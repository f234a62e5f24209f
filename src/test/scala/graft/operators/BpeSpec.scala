package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Pins the q124 BPE trainer's contract on constructed corpora — the
  * properties the oracle's unrolled replay relies on: greedy
  * left-to-right non-overlapping merges (the `replace`-on-spaced-strings
  * representation must implement BPE's specified semantics, not just
  * SOME rewrite), the deterministic (cnt DESC, lhs, rhs) tie-break, and
  * graceful early exhaustion when the corpus runs out of pairs before
  * the merge budget does. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def train(words: Seq[String], n: Int): Seq[(Long, String,
      String, String, Long)] =
    Documents.bpeMergeLoop(words.toDF("w"), n)
      .as[(Long, String, String, String, Long)].collect().toSeq

  test("greedy left-to-right non-overlapping merge: 'aaa' under (a,a) " +
       "becomes [aa, a], so round 2 merges (aa, a) — never (a, aa)") {
    // freq(aaa)=2, freq(ab)=1: round 1 counts (a,a)=4 [two adjacent
    // positions per occurrence], (a,b)=1
    val got = train(Seq("aaa", "aaa", "ab"), 10)
    assert(got === Seq(
      (1L, "a", "a", "aa", 4L),   // merge the doubled pair
      (2L, "aa", "a", "aaa", 2L), // greedy left-to-right: [aa, a] remains
      (3L, "a", "b", "ab", 1L)))  // exhaustion: only 3 merges exist
  }

  test("tie-break is (cnt DESC, lhs ASC, rhs ASC): equal counts elect " +
       "the byte-smallest pair") {
    val got = train(Seq("zw", "zw", "xy", "xy"), 1)
    assert(got === Seq((1L, "x", "y", "xy", 2L)))
  }

  test("merges never cross word boundaries and pair counts weight by " +
       "word frequency, not type") {
    // 'ba' x3 and 'ab' x1: (b,a) wins 3 > 1 even though both are one type
    val got = train(Seq("ba", "ba", "ba", "ab"), 1)
    assert(got === Seq((1L, "b", "a", "ba", 3L)))
    // a merged symbol matches only as a SYMBOL: after merging (b,a),
    // the word 'aba' = [a, b, a] -> [a, ba]; pair (a, ba) exists, but
    // the 'ba' inside '_ab_a' character-wise must not (word 'ab' + 'a'
    // are separate words and contribute no cross-word pair)
    val got2 = train(Seq("aba", "aba", "ab", "a"), 2)
    assert(got2 === Seq(
      (1L, "a", "b", "ab", 3L),   // 2 from 'aba' + 1 from 'ab'
      (2L, "ab", "a", "aba", 2L))) // [ab, a] pairs only inside 'aba'
  }

  test("back-to-back occurrences sharing a boundary space ALL merge in " +
       "one round: 'aaaa' under (a,a) becomes [aa, aa], not [aa, a, a]") {
    // ADVICE r15: the naive replace consumed both boundary spaces and
    // skipped every other occurrence in even runs; reference BPE merges
    // greedily left-to-right, so a 4-run yields two merged symbols.
    val got = train(Seq("aaaa"), 2)
    assert(got === Seq(
      (1L, "a", "a", "aa", 3L),       // 3 adjacent positions in 'aaaa'
      (2L, "aa", "aa", "aaaa", 1L)))  // round 2 sees [aa, aa]
  }

  test("adjacent occurrences of a two-symbol pair also all merge: " +
       "'abab' under (a,b) becomes [ab, ab]") {
    val got = train(Seq("abab"), 2)
    assert(got === Seq(
      (1L, "a", "b", "ab", 2L),
      (2L, "ab", "ab", "abab", 1L)))
  }

  test("single-char and empty-pair words are inert; budget stops the " +
       "loop when pairs remain") {
    assert(train(Seq("a", "b", "c"), 5) === Seq.empty)
    val budget = train(Seq("abcd", "abcd"), 2)
    assert(budget.size === 2, "budget must cap the merge count")
  }

  private def tmpPaths(): (String, String) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_frozen").toString
    (s"$dir/merges", s"$dir/types")
  }

  test("frozen-probe == retrain-and-encode on an unchanged corpus: the " +
       "materialized type table serves exactly what a fresh train would") {
    val docs = Seq((1L, "aaab"), (1L, "aaab"), (1L, "ab"), (2L, "aaab"),
      (2L, "b"), (3L, "ab"), (3L, "aaab")).toDF("doc_id", "w")
    val (mp, tp) = tmpPaths()
    val (_, frozen) = Documents.bpeFreezeAt(spark, mp, tp,
      docs.select("w"))
    val probe = Documents.bpeFrozenEncodeCore(docs, frozen)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val (_, fresh) = Documents.bpeTrainTypes(docs.select("w"), Documents.BpeMerges)
    val retrain = Documents.bpeFrozenEncodeCore(docs, fresh)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(probe === retrain, "frozen probe diverged from fresh retrain")
    assert(probe.forall(_._4 == 0L), "no word can be unseen here")
    // a second freeze call must NOT rebuild: serve the same bytes
    val (_, again) = Documents.bpeFreezeAt(spark, mp, tp,
      sys.error("builder must not run when the artifact exists"))
    assert(again.exceptAll(frozen).count() === 0 &&
           frozen.exceptAll(again).count() === 0)
  }

  test("unseen words fall back to CHAR-level segmentation and are " +
       "counted: n_tok = length(w), n_unseen tallies occurrences") {
    val trainWords = Seq("aaab", "aaab", "ab").toDF("w")
    val (mp, tp) = tmpPaths()
    val (_, frozen) = Documents.bpeFreezeAt(spark, mp, tp, trainWords)
    // 'zzzz' never seen -> 4 char tokens; 'aaab' seen -> fully merged
    // to 1 token under the 10-merge budget ([aa,a,b]->[aa,ab]->[aaab])
    val got = Documents.bpeFrozenEncodeCore(
      Seq((7L, "aaab"), (7L, "zzzz"), (8L, "zz")).toDF("doc_id", "w"),
      frozen).as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 7: 2 words, 1 + 4 tokens, 1 unseen, 8 chars -> cpt 16000 bp
    // doc 8: 1 word,  2 tokens,     1 unseen, 2 chars -> cpt 10000 bp
    assert(got === Seq((7L, 2L, 5L, 1L, 16000L), (8L, 1L, 2L, 1L, 10000L)))
  }

  test("bpeRefreshIfDrifted: an in-distribution batch refreshes " +
       "nothing; a vocabulary-shifted batch triggers and the refreshed " +
       "artifact equals a from-scratch train on the union") {
    val corpus = Seq.fill(8)("aaab").toDF("w")
    val (mp, tp) = tmpPaths()
    // in-distribution: same words -> same compression -> no refresh
    assert(!Documents.bpeRefreshIfDrifted(spark, mp, tp, corpus,
      Seq("aaab", "aaab").toDF("w")))
    val before = spark.read.parquet(tp).as[(String, String, Long)]
      .collect().toSet
    // shifted: long unseen words tokenize char-level -> cpt collapses
    val shifted = Seq.fill(6)("zzzzzzzz").toDF("w")
    assert(Documents.bpeRefreshIfDrifted(spark, mp, tp, corpus, shifted))
    val after = spark.read.parquet(tp).as[(String, String, Long)]
      .collect().toSet
    assert(after !== before, "refresh must replace the artifact")
    val (_, scratch) = Documents.bpeTrainTypes(
      corpus.unionByName(shifted), Documents.BpeMerges)
    assert(after === scratch.as[(String, String, Long)].collect().toSet,
      "refreshed artifact != from-scratch train on the union")
  }

  test("pair-swap crash window: a refresh that dies between the merges " +
       "swap and the types swap never serves a split-generation pair — " +
       "the next freeze rebuilds BOTH halves (ADVICE r17)") {
    val corpus = Seq.fill(8)("aaab").toDF("w")
    val shifted = Seq.fill(6)("zzzzzzzz").toDF("w")
    val (mp, tp) = tmpPaths()
    Documents.bpeFreezeAt(spark, mp, tp, corpus.select("w"))
    // Simulate the refresh path dying right after the merges swap:
    // types retired (orphans + target gone), NEW-generation merges
    // published, types swap never reached.
    val fs = new org.apache.hadoop.fs.Path(tp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.etl.Merge.retireArtifact(fs, tp)
    val (newMerges, _) = Documents.bpeTrainTypes(
      corpus.unionByName(shifted), Documents.BpeMerges)
    graft.etl.Merge.writeAndSwap(newMerges, mp, "refresh")
    // Recovery: freeze must take the rebuild-both path (types absent),
    // publishing a MATCHED pair trained on the freeze words — not the
    // crashed refresh's merges beside resurrected old types.
    val (servedMerges, servedTypes) =
      Documents.bpeFreezeAt(spark, mp, tp, corpus.select("w"))
    val (wantMerges, wantTypes) =
      Documents.bpeTrainTypes(corpus.select("w"), Documents.BpeMerges)
    assert(servedMerges.exceptAll(wantMerges).count() === 0 &&
           wantMerges.exceptAll(servedMerges).count() === 0,
      "recovered merges must come from the rebuild, not the crashed swap")
    assert(servedTypes.exceptAll(wantTypes).count() === 0 &&
           wantTypes.exceptAll(servedTypes).count() === 0,
      "recovered types must match the recovered merges' generation")
  }

  test("bpeTrainTypes returns each word type's final segmentation — " +
       "the q125 encode lookup IS the trainer's rewritten type table") {
    // round 1: (a,a)=4 beats (a,b)=3 → 'aaab' = [aa, a, b];
    // round 2: (a,b)=3 beats (aa,a)=2 → 'aaab' = [aa, ab], 'ab' = [ab]
    val (steps, types) = Documents.bpeTrainTypes(
      Seq("aaab", "aaab", "ab").toDF("w"), 2)
    assert(steps.as[(Long, String, String, String, Long)].collect()
      .toSeq === Seq((1L, "a", "a", "aa", 4L), (2L, "a", "b", "ab", 3L)))
    val seg = types.select("w", "s")
      .as[(String, String)].collect().toMap
    assert(seg("aaab") === " aa ab ", "2 subword tokens after 2 merges")
    assert(seg("ab") === " ab ", "the merged pair is 1 token")
  }

  test("TAKEDOWN retraction (q157): fold(appends + retract) over the " +
       "word-frequency ledger retrains to EXACTLY the reduced-corpus " +
       "merge table; a type living only in deleted docs vanishes from " +
       "the net table (and from every merge); a replayed retraction " +
       "absorbs") {
    import org.apache.spark.sql.functions.col
    val led = java.nio.file.Files
      .createTempDirectory("graft-bper").toString + "/wf"
    // doc 2 is the takedown: it carries the corpus's only 'zzzz'
    // occurrences (a type that must vanish) AND extra 'aaab' mass (a
    // shared type whose count must net down, flipping a merge argmax)
    val b0 = Seq((1L, "aaab aaab ab"), (2L, "zzzz zzzz zzzz aaab aaab"))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, "aaab cd cd")).toDF("doc_id", "text")
    val removed = b0.filter(col("doc_id") === 2L)
    Documents.appendWfLedger(led, b0, "b0")
    Documents.appendWfLedger(led, b1, "b1")
    Documents.retractWfBatch(led, removed, "rm0")
    Documents.retractWfBatch(led, removed, "rm0") // replay
    // net types == reduced-corpus types, zero-net 'zzzz' gone
    val net = Documents.wfLedgerNet(spark, led)
      .as[(String, Long)].collect().toMap
    assert(net === Map("aaab" -> 3L, "ab" -> 1L, "cd" -> 2L),
      s"net word frequencies wrong: $net")
    // retrain from the net == one-shot train on the reduced corpus
    val got = Documents.bpeTrainTypesFromFreq(
        Documents.wfLedgerNet(spark, led), 10)._1
      .as[(Long, String, String, String, Long)].collect().toSeq
    val want = train(
      Seq("aaab", "aaab", "ab", "aaab", "cd", "cd"), 10)
    assert(got === want,
      "ledger retrain != one-shot train on the reduced corpus")
    assert(!got.exists(m => m._2.contains("z") || m._3.contains("z")),
      "a merge still references the fully-retracted type")
  }
}
