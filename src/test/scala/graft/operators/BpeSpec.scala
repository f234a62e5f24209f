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
}
