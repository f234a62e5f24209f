package graft.operators

import graft.SparkSpec

/** Pins the q133 reciprocal-rank-fusion contract on constructed rank
  * lists: integer contributions floor(10⁹/(60+rank)) per present arm
  * (0 when absent), presence in both arms dominating a single better
  * rank in one, and the deterministic id tie-break — the properties the
  * oracle's replay relies on being arithmetic, not float, facts. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def fuse(dense: Seq[(Long, Long, Long)],
                   lex: Seq[(Long, Long, Long)]) =
    Similarity.rrfFuse(
      dense.toDF("q_id", "id", "d_rank"),
      lex.toDF("q_id", "id", "l_rank"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("contributions are exact integers: both arms sum, an absent arm " +
       "contributes 0, and the emitted arm ranks echo the inputs") {
    val got = fuse(
      dense = Seq((1L, 10L, 1L), (1L, 11L, 2L)),
      lex   = Seq((1L, 10L, 3L), (1L, 12L, 1L)))
    // id 10: 10^9/61 + 10^9/63 = 16393442 + 15873015 = 32266457
    // id 12: 10^9/61 = 16393442 (dense-absent -> 0)
    // id 11: 10^9/62 = 16129032
    assert(got === Seq(
      (1L, 1L, 10L, 32266457L, 1L, 3L),
      (1L, 2L, 12L, 16393442L, 0L, 1L),
      (1L, 3L, 11L, 16129032L, 2L, 0L)))
  }

  test("an id present in BOTH arms at modest ranks outranks an id with " +
       "a single rank-1 appearance — the reason fusion recalls what " +
       "either arm alone misses") {
    val got = fuse(
      dense = Seq((7L, 100L, 20L), (7L, 200L, 1L)),
      lex   = Seq((7L, 100L, 20L)))
    // id 100: 2 * 10^9/80 = 25000000  >  id 200: 10^9/61 = 16393442
    assert(got.map(r => (r._3, r._4)) ===
      Seq((100L, 25000000L), (200L, 16393442L)))
  }

  test("equal scores tie-break on id ascending; per-query cut at 10") {
    val dense = (1L to 15L).map(i => (3L, i, 5L)) // identical rank 5
    val got = fuse(dense, Seq.empty[(Long, Long, Long)])
    assert(got.map(_._3) === (1L to 10L).toSeq, "id-asc tie-break + cut")
    assert(got.forall(_._4 === 1000000000L / 65L))
  }
}
