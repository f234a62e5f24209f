package graft.operators

import graft.SparkSpec

/** Zero-false-negative contract of the q35 near-dup operator on ORGANIC
  * near-dups (r5 advice, medium): a genuine cosine ≥ 0.999 pair flips
  * ~SketchBits/70 bits in expectation, so pairs at sketch-Hamming 1–3 are
  * the NORMAL case, not an edge — and the r5-interim 3-chunk geometry
  * silently dropped the Hamming-3 tail while the exact oracle reported
  * it. This spec builds a corpus of perturbed twins straddling the 0.999
  * threshold, derives ground truth + per-pair sketch Hamming from first
  * principles (the same hyperplane generator NativeSpec pins the kernel
  * to), and drives the PRODUCTION operator core over it.
  *
  * The fixture is fully deterministic (Knuth-hash vectors), so the pinned
  * facts — truth pairs exist at Hamming 1, 2 AND 3; no truth pair exceeds
  * the Hamming ≤ 3 pigeonhole budget; the operator returns EXACTLY the
  * truth set — hold on every run. */
class NearDupRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val NBase = 240
  private val NTwins = 60

  /** Uncorrelated deterministic components in [-1, 1]. */
  private def h(seed: Long, k: Long): Double =
    (((seed * Dim + k) * 2654435761L) % 2001L - 1000L) / 1000.0

  private def baseVec(id: Long): Array[Double] =
    Array.tabulate(Dim)(i => h(id, i))

  /** Twin of base `id`: perturbed along an unrelated deterministic
    * direction, magnitude stepped by id so the resulting cosines straddle
    * 0.999 — twins pushed below the threshold drop out of ground truth
    * naturally, the rest land at sketch-Hamming 0–3. */
  private def twinVec(id: Long): Array[Double] = {
    val v = baseVec(id)
    val eps = 0.004 + (id % 8) * 0.0035
    Array.tabulate(Dim)(i => v(i) + eps * h(id + 7777, i))
  }

  private val vectors: Seq[(Long, Array[Double])] =
    (0L until NBase).map(id => id -> baseVec(id)) ++
    (0L until NTwins).map(id => (10000L + id) -> twinVec(id))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < Dim) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  /** Sign sketch from the executable hyperplane spec at the PRODUCTION
    * geometry (Similarity.SketchBits) — independent reconstruction, not
    * the kernel under test. */
  private def sketchBits(v: Array[Double]): Array[Boolean] =
    Array.tabulate(Similarity.SketchBits) { j =>
      val hp = Similarity.hyperplane(j)
      var acc = 0.0
      var i = 0
      while (i < Dim) { acc += v(i) * hp(i); i += 1 }
      acc >= 0
    }

  private def hamming(a: Array[Boolean], b: Array[Boolean]): Int =
    a.zip(b).count { case (x, y) => x != y }

  private lazy val truth: Seq[((Long, Long), Int)] = {
    val sk = vectors.map { case (id, v) => id -> sketchBits(v) }.toMap
    for {
      i <- vectors.indices
      j <- (i + 1) until vectors.size
      (ida, va) = vectors(i)
      (idb, vb) = vectors(j)
      if cosine(va, vb) >= 0.999
    } yield {
      val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
      (lo, hi) -> hamming(sk(ida), sk(idb))
    }
  }

  test("fixture: organic truth pairs exist at sketch-Hamming 1, 2 and 3, " +
       "none beyond the pigeonhole budget") {
    val hs = truth.map(_._2)
    assert(truth.size >= 20, s"only ${truth.size} truth pairs")
    Seq(1, 2, 3).foreach { d =>
      assert(hs.contains(d), s"no truth pair at Hamming $d (got ${hs.sorted})")
    }
    // budget = NChunks - 1, the pigeonhole guarantee at the production
    // geometry (flip expectation grows with SketchBits — see the q35
    // scaladoc's chunk-count bullet)
    assert(hs.max <= Similarity.NChunks - 1,
      s"fixture exceeds the guarantee budget: Hamming ${hs.max}")
  }

  test("production near-dup operator finds every organic 0.999 pair (recall 1.0)") {
    val corpus = vectors.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
    val found = Similarity.nearDupPairs(corpus)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = truth.map(_._1).toSet
    val missed = expected -- found
    assert(missed.isEmpty,
      s"false negatives (the r5-advice failure mode): $missed")
    // the exact-cosine verify stage makes extras impossible too
    assert(found === expected, s"false positives: ${found -- expected}")
  }
}
