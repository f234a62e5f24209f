package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q116 blocked fuzzy join: election tie rule, cutoff boundary, blocking
  * recall contract, and duplicate-registry behavior on constructed
  * corpora. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def cleanDF(rows: (Long, String)*) =
    rows.toDF("ckey", "cname")
      .withColumn("blk", substring_index(col("cname"), " ", 1))
  private def dirtyDF(rows: (Long, String)*) =
    rows.toDF("dirty_id", "dname")
      .withColumn("blk", substring_index(col("dname"), " ", 1))

  private def run(dirty: org.apache.spark.sql.DataFrame,
                  clean: org.apache.spark.sql.DataFrame,
                  maxDist: Int = Linkage.FuzzyMaxDist) =
    Linkage.fuzzyMatch(dirty, clean, maxDist)
      .as[(Long, Long, Long)].collect().toSeq

  test("equal-distance tie elects the smaller registry key") {
    // both registry entries are 1 edit from the dirty name
    val clean = cleanDF((20L, "navy blue sock"), (10L, "navy blue rock"))
    val dirty = dirtyDF((1L, "navy blue lock"))
    assert(run(dirty, clean) === Seq((1L, 10L, 1L)))
  }

  test("closer match beats smaller key; cutoff boundary is inclusive " +
       "at maxDist and excludes maxDist+1") {
    val clean = cleanDF((5L, "red wool hat"), (9L, "red wool cap"))
    // dist(dirty, key5 "hat") = 3 → outside the cutoff;
    // dist(dirty, key9 "cap") = 1 → wins despite the larger key
    val d1 = dirtyDF((1L, "red wool cup"))
    assert(run(d1, clean) === Seq((1L, 9L, 1L)))
    // exactly maxDist edits still matches; maxDist+1 does not
    val d2 = dirtyDF((2L, "red wool cup"))
    assert(run(d2, clean, maxDist = 1) === Seq((2L, 9L, 1L)))
    assert(run(d2, clean, maxDist = 0) === Seq((2L, -1L, -1L)))
  }

  test("a dirty record outside every block surfaces unmatched, even when " +
       "a near string exists in another block") {
    val clean = cleanDF((3L, "green silk tie"))
    val dirty = dirtyDF((1L, "greem silk tie")) // 1 edit, but block differs
    assert(run(dirty, clean) === Seq((1L, -1L, -1L)))
  }

  test("exact duplicate registry names: deterministic min-key winner, " +
       "distance 0") {
    val clean = cleanDF((42L, "plum dot bag"), (7L, "plum dot bag"))
    val dirty = dirtyDF((1L, "plum dot bag"))
    assert(run(dirty, clean) === Seq((1L, 7L, 0L)))
  }

  test("every dirty record appears exactly once in the output") {
    val clean = cleanDF((1L, "a b"), (2L, "a c"), (3L, "z q"))
    val dirty = dirtyDF((10L, "a b"), (11L, "a x"), (12L, "m n"))
    val got = run(dirty, clean)
    assert(got.map(_._1) === Seq(10L, 11L, 12L))
    assert(got === Seq((10L, 1L, 0L), (11L, 1L, 1L), (12L, -1L, -1L)))
  }

  test("duplicate dirty rows sharing a name all get the one per-name " +
       "verdict (the domain collapse fans back out)") {
    val clean = cleanDF((4L, "teal mug"))
    val dirty = dirtyDF((1L, "teal mugs"), (2L, "teal mugs"), (3L, "teal mug"))
    assert(run(dirty, clean) ===
      Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 0L)))
  }

  private def runMulti(dirty: org.apache.spark.sql.DataFrame,
                       clean: org.apache.spark.sql.DataFrame,
                       maxDist: Int = Linkage.FuzzyMaxDist) =
    Linkage.multipassMatch(dirty, clean, maxDist)
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("multipass: pass 2 recovers a reversed record the first-word " +
       "block lost, scoring on the normalized form") {
    val clean = cleanDF((5L, "green silk tie"))
    val dirty = dirtyDF((1L, "eit klis neerg"), // reversed, 0 edits after undo
                        (2L, "green silk tee"), // direct, 1 edit → pass 1
                        (3L, "utter nonsense")) // unmatched by both passes
    assert(runMulti(dirty, clean) === Seq(
      (1L, 5L, 0L, 2L), (2L, 5L, 1L, 1L), (3L, -1L, -1L, 0L)))
  }

  test("multipass: pass 1 match is final — pass 2 never rescans or " +
       "overrides a matched name") {
    // "ab ba" is 1 edit from "ab bb" (pass-1 match) AND reverses to
    // itself... use an asymmetric pair: dname "ba ab" matches clean
    // "ba ab" exactly in pass 1; its reversal "ba ab" would ALSO match —
    // the verdict must carry pass = 1 exactly once.
    val clean = cleanDF((1L, "ba ab"))
    val dirty = dirtyDF((1L, "ba ab"))
    assert(runMulti(dirty, clean) === Seq((1L, 1L, 0L, 1L)))
  }

  test("multipass: a reversed record whose reversal is still outside the " +
       "cutoff stays unmatched") {
    val clean = cleanDF((1L, "blue cap"))
    // undo → "blue sock": same block, but dist("sock","cap") = 3 > cutoff
    val dirty = dirtyDF((1L, "kcos eulb"))
    assert(runMulti(dirty, clean) === Seq((1L, -1L, -1L, 0L)))
  }

  test("multipass: pass 3 recovers a word-swapped record — passes 1 and 2 " +
       "both miss it, the word-sorted form scores 0") {
    val clean = cleanDF((7L, "green silk tie"))
    // first two words swapped: pass-1 block 'silk' misses, reversal is
    // garbage, sorted form 'green silk tie' == sorted registry form
    val dirty = dirtyDF((1L, "silk green tie"))
    assert(runMulti(dirty, clean) === Seq((1L, 7L, 0L, 3L)))
  }

  test("multipass: pass 3 scores on the SORTED forms — a swap plus one " +
       "typo lands at the sorted-domain edit distance") {
    val clean = cleanDF((7L, "red wool hat"))
    // swap + typo: "wool rad hat"; sorted dirty = "hat rad wool" vs
    // sorted clean "hat red wool" → distance 1, same first-word block
    val dirty = dirtyDF((1L, "wool rad hat"))
    assert(runMulti(dirty, clean) === Seq((1L, 7L, 1L, 3L)))
  }

  test("multipass: two registry names sorting to the same canonical form " +
       "elect the min key in pass 3") {
    val clean = cleanDF((30L, "cd ab zz"), (20L, "ab cd zz"))
    // block 'zz' matches neither registry block; the reversal blocks on
    // 'dc' (also nothing); the sorted form "ab cd zz" hits BOTH registry
    // entries' identical sorted form at dist 0 → min key 20 wins
    val dirty = dirtyDF((1L, "zz ab cd"))
    assert(runMulti(dirty, clean) === Seq((1L, 20L, 0L, 3L)))
  }

  test("multipass: earlier-pass verdicts are final — pass 3 never rescans " +
       "a name passes 1 or 2 matched") {
    val clean = cleanDF((1L, "ab ba"))
    // exact pass-1 match whose sorted form would also match at dist 0
    val dirty = dirtyDF((1L, "ab ba"))
    assert(runMulti(dirty, clean) === Seq((1L, 1L, 0L, 1L)))
  }

  test("multipass: a record no normalization rescues stays unmatched " +
       "after all three passes") {
    val clean = cleanDF((1L, "green silk tie"))
    val dirty = dirtyDF((1L, "utter nonsense here"))
    assert(runMulti(dirty, clean) === Seq((1L, -1L, -1L, 0L)))
  }
}
