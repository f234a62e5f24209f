package graft.operators

import graft.SparkSpec

/** Pins the q129 temperature-mix contract on constructed token tables:
  * the largest source anchors at exactly 1 epoch (10000 bp), epoch
  * weights follow sqrt(T_max/T_i), the cap binds for tiny sources, and
  * whole copies are exact while fractional copies are hash-selected. */
class TempMixSpec extends SparkSpec {
  import spark.implicits._

  private def mix(rows: (String, Long, Long)*) =
    Documents.temperatureMixCore(rows.toDF("source", "doc_id", "n_tok"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("largest source anchors at exactly 10000 bp and runs once; a 4x " +
       "smaller source gets exactly 2 epochs (sqrt(4) = 2)") {
    // srcA: 2 docs x 50 tok = 100; srcB: 1 doc x 25 = 25
    val got = mix(("a", 1L, 50L), ("a", 2L, 50L), ("b", 3L, 25L))
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("a") === ("a", 100L, 2L, 10000L, 2L),
      "anchor source: 1 copy per doc, no fractional selection")
    assert(bySrc("b")._4 === 20000L, "sqrt(100/25) = 2 epochs")
    assert(bySrc("b")._5 === 2L, "whole copies only at integral weight")
  }

  test("the cap binds: a source small enough for sqrt to exceed 5 " +
       "epochs is clamped to 50000 bp") {
    val got = mix(("big", 1L, 10000L), ("tiny", 2L, 1L))
    val tiny = got.find(_._1 == "tiny").get
    assert(tiny._4 === Documents.TempMixCapBp,
      s"sqrt(10000/1) = 100 epochs must clamp to 5")
    assert(tiny._5 === 5L)
  }

  test("a zero-token source (every doc tokenizes empty) clamps to the " +
       "cap instead of dividing by zero — identical guard both engines") {
    val got = mix(("big", 1L, 100L), ("empty", 2L, 0L))
    val e = got.find(_._1 == "empty").get
    assert(e._4 === Documents.TempMixCapBp && e._5 === 5L)
  }

  test("fractional epochs hash-select a stable subset: total copies " +
       "land between the floor and ceiling of e_bp * n_docs / 10000, " +
       "and re-running is byte-identical") {
    // srcB at T=16 vs T_max=100: sqrt(6.25) = 2.5 -> 25000 bp over 8
    // docs -> 2 whole copies each + ~half selected for a third
    val docs = ("a", 0L, 100L) +: (1L to 8L).map(i => ("b", i, 2L))
    val got1 = mix(docs: _*)
    val b = got1.find(_._1 == "b").get
    assert(b._4 === 25000L)
    assert(b._5 >= 16L && b._5 <= 24L,
      s"8 docs at 2.5 epochs: 16 whole + 0..8 selected, got ${b._5}")
    assert(mix(docs: _*) === got1, "mix must be a pure function of data")
  }

  test("temperatureCopies (q143's per-doc frame) agrees with the q129 " +
       "aggregate per source — the duplicated weight logic cannot drift") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val docs = (1L to 120L).map(i =>
      (s"src${i % 5}", i, rnd.nextInt(400).toLong + 1L))
    val df = docs.toDF("source", "doc_id", "n_tok")
    val perDoc = Documents.temperatureCopies(df)
      .groupBy($"source")
      .agg(org.apache.spark.sql.functions.sum($"n_copies").as("n_copies"))
      .as[(String, Long)].collect().toMap
    val agg = Documents.temperatureMixCore(df)
      .select($"source", $"n_copies")
      .as[(String, Long)].collect().toMap
    assert(perDoc === agg,
      "per-doc copies disagree with the q129 per-source aggregate")
  }
}
