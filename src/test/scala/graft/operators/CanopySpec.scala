package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Native

/** Exact-recall gate for the q90 canopy leader quantizer (r11 verdict
  * item 1: the k ∝ N quantizer replacing the banded form must restore
  * recall WITHOUT the quadratic).
  *
  * The q90 scaladoc claims recall 1.0 BY CONSTRUCTION via the canopy
  * overlap argument (compare radius A_c < cos(acos T + acos τ)). This
  * spec is the empirical half of that proof: the full operator —
  * leader election + assignment + within-cluster/outlier compare +
  * witness election — must equal an all-pairs brute force (same micro
  * arithmetic) on corpora built to hit every miss mode the r11 banded
  * form had:
  *  - families whose member cosines STRADDLE τ (0.91–0.99 — the ladder's
  *    perturbed-replica shape; banding lost the high-Hamming tail here);
  *  - families straddling the COVER boundary (members ~T of each other,
  *    some covered, some outliers — the mixed covered/outlier case of
  *    the triangle argument);
  *  - uniform corpora (no structure: everything rides the outlier path);
  *  - exact scaled twins (the direction-identical class).
  * Leader-count scaling (k ∝ N, thinning to one leader per dense
  * region) is asserted separately.
  */
class CanopySpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  private def h(seed: Long, i: Int): Double =
    (((seed * Dim + i) * 2654435761L) % 1000L) / 1000.0 - 0.5

  private def vec(seed: Long): Array[Double] = Array.tabulate(Dim)(h(seed, _))

  private def blend(c: Array[Double], n: Array[Double], s: Double) =
    Array.tabulate(Dim)(i => c(i) + s * n(i)).toSeq

  private def frame(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(Native.dotProduct(col("v"), col("v"))))

  /** Families of `m` members each around centers, member = center +
    * s·noise: s = 0.23 puts member cosines right at τ ≈ 0.95, the
    * boundary case; ids interleave across families so min-id witnesses
    * cross family blocks. */
  private def familyCorpus(nFam: Int, m: Int, s: Double,
                           idBase: Long = 0L): Seq[(Long, Seq[Double])] =
    for (f <- 0 until nFam; j <- 0 until m) yield {
      val id = idBase + (j.toLong * nFam) + f
      (id, blend(vec(7000L + f), vec(90000L + id), s))
    }

  private def uniformCorpus(n: Int, idBase: Long = 0L): Seq[(Long, Seq[Double])] =
    (0 until n).map(j => (idBase + j, vec(40000L + idBase + j).toSeq))

  /** All-pairs ground truth under the operator's exact micro arithmetic. */
  private def brute(aug: DataFrame): Seq[Row] = {
    val a = aug.select(col("vec_id").as("a_id"), col("v").as("av"),
      col("nrm").as("an"))
    val b = aug.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("nrm").as("bn"))
    import org.apache.spark.sql.expressions.Window
    b.crossJoin(broadcast(a)).filter(col("a_id") < col("b_id"))
      .withColumn("sim_micro",
        floor(Native.dotProduct(col("av"), col("bv")) /
          (col("an") * col("bn")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .filter(col("sim_micro") >= lit(Similarity.SemDedupTauMicro))
      .withColumn("wrank", row_number().over(
        Window.partitionBy(col("b_id")).orderBy(col("a_id").asc)))
      .filter(col("wrank") === 1)
      .select(col("b_id").as("drop_id"), col("a_id").as("keep_id"),
        col("sim_micro"))
      .orderBy(col("drop_id")).collect().toSeq
  }

  private def canopy(aug: DataFrame, leaders: Option[DataFrame] = None)
      : Seq[Row] =
    Similarity.canopyDedup(aug,
        leaders.getOrElse(Similarity.canopyLeaders(aug)))
      .select("drop_id", "keep_id", "sim_micro")
      .orderBy("drop_id").collect().toSeq

  private def assertExact(rows: Seq[(Long, Seq[Double])],
                          leaders: Option[DataFrame] = None): Unit = {
    val aug = frame(rows)
    val expect = brute(aug)
    val got = canopy(aug, leaders)
    assert(got == expect,
      s"canopy != brute: got ${got.size} drops, expected ${expect.size}; " +
      s"first diff: ${got.toSet.diff(expect.toSet).take(3)} vs " +
      s"${expect.toSet.diff(got.toSet).take(3)}")
    assert(expect.nonEmpty, "vacuous corpus: ground truth found no pairs")
  }

  test("boundary families (member cosine ≈ τ): canopy == brute force") {
    // s spans 0.91..0.99 member cosine; ids interleaved
    assertExact(familyCorpus(6, 10, 0.23) ++
      familyCorpus(4, 8, 0.10, idBase = 1000L) ++
      familyCorpus(4, 8, 0.30, idBase = 2000L))
  }

  test("cover-boundary families (member cosine ≈ T, mixed covered/outlier): " +
       "canopy == brute force") {
    // s = 0.28 → member cosine ≈ 0.927: below cover T = 0.93, so members
    // of a seeded family sit in the compare ring without being covered —
    // the mixed case of the triangle argument — while a minority of
    // pairs still clears τ through noise alignment
    assertExact(familyCorpus(8, 12, 0.28) ++
      familyCorpus(2, 6, 0.05, idBase = 5000L))
  }

  test("uniform corpus + exact scaled twins ride the outlier path: " +
       "canopy == brute force") {
    val base = uniformCorpus(300)
    val twins = base.collect { case (id, v) if id % 25 == 0 =>
      (id + 100000L, v.map(_ * 1.0001)) }
    assertExact(base ++ twins)
  }

  test("blocked outlier branch (past the broadcast gate): exact on an " +
       "all-outlier corpus with planted pairs") {
    // uniform corpus + scaled twins: everything is residue; a limit of 10
    // forces the triangular block join instead of the broadcast loop
    val base = uniformCorpus(200)
    val twins = base.collect { case (id, v) if id % 20 == 0 =>
      (id + 100000L, v.map(_ * 1.0001)) }
    val rows = base ++ twins
    val aug = frame(rows)
    val expect = brute(aug)
    val got = Similarity.canopyDedup(aug, Similarity.canopyLeaders(aug),
        outlierBroadcastLimit = 10L)
      .select("drop_id", "keep_id", "sim_micro")
      .orderBy("drop_id").collect().toSeq
    assert(got == expect, s"blocked branch != brute: ${got.size} vs " +
      s"${expect.size}")
    assert(expect.nonEmpty)
  }

  test("degenerate leader tables stay exact: empty (all-outlier) and " +
       "all-vectors (maximal overlap)") {
    val rows = familyCorpus(5, 8, 0.20) ++ uniformCorpus(60, idBase = 3000L)
    val aug = frame(rows)
    val none = aug.select(col("vec_id").as("lead_id"), col("v"), col("nrm"))
      .limit(0)
    val all = aug.select(col("vec_id").as("lead_id"), col("v"), col("nrm"))
    assertExact(rows, Some(none))
    assertExact(rows, Some(all))
  }

  test("k ∝ N: uniform leaders scale with the corpus; dense families thin " +
       "to ~one leader per region") {
    val u1 = Similarity.canopyLeaders(frame(uniformCorpus(512))).count()
    val u4 = Similarity.canopyLeaders(frame(uniformCorpus(2048))).count()
    // uniform: nothing absorbs anything → leaders ≈ the 1/16 hash sample
    assert(u4 > 2 * u1, s"leader count did not scale: $u1 -> $u4")
    // 16 tight families × 64 members: every seed absorbs to its family's
    // min seed → at most ~one leader per family (+ hash-luck stragglers)
    val fam = Similarity.canopyLeaders(frame(familyCorpus(16, 64, 0.05)))
      .count()
    assert(fam <= 16 + 8 && fam >= 1,
      s"family corpus kept $fam leaders for 16 families")
  }
}
