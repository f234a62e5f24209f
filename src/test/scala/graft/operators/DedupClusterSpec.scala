package graft.operators

import graft.SparkSpec

/** Transitivity contract of the connected-components dedup core: the
  * harness corpus only plants DISJOINT twin pairs (2-doc components), so
  * the q63 oracle never exercises the case clustering exists for — a doc
  * chained through several overlapping pairs. This spec constructs the
  * shapes directly. */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodeIds: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = nodeIds.toDF("doc_id")
    val edges = pairs.toDF("a_id", "b_id")
    Documents.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
  }

  test("chains, cycles, stars and singletons all collapse to the min id") {
    val out = cc(
      0L to 12L,
      Seq(
        (1L, 2L), (2L, 3L), (3L, 4L),   // chain 1-2-3-4 (diameter > 1)
        (5L, 6L), (6L, 7L), (7L, 5L),   // cycle 5-6-7
        (9L, 8L), (10L, 8L), (11L, 8L)  // star around 8, reversed orientation
      ))                                 // 0 and 12 are singletons
    val expected = Map(
      0L -> 0L,
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      8L -> 8L, 9L -> 8L, 10L -> 8L, 11L -> 8L,
      12L -> 12L)
    assert(out === expected)
  }

  test("two chains merged by a single bridge edge become one component") {
    // each chain would converge alone in 2 rounds; the bridge forces the
    // min label to travel the full combined diameter — the convergence
    // witness (sum strictly decreasing until fixpoint) must not stop early
    val out = cc(
      1L to 8L,
      Seq((1L, 2L), (2L, 3L), (3L, 4L),        // chain A
          (5L, 6L), (6L, 7L), (7L, 8L),        // chain B
          (4L, 8L)))                            // bridge at the far ends
    assert(out.values.toSet === Set(1L), s"bridge not propagated: $out")
  }

  test("a duplicated pair and a self-loop change nothing") {
    val out = cc(1L to 3L, Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("an empty corpus converges immediately instead of NPE-ing on the " +
       "null sum witness (ADVICE r6)") {
    assert(cc(Seq.empty, Seq.empty) === Map.empty)
  }
}
