package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q115 (Misra-Gries + recount heavy hitters) and q117 (median/MAD
  * outliers): the algorithmic guarantees, driven on constructed data.
  *
  * q115's contract: output EQUALS the brute-force groupBy-HAVING under
  * ANY partitioning of the stream — the MG candidate set may vary with
  * the split, the exact recount + threshold never does. The superset
  * proof (a key missed by every partition's summary has global count
  * < N/k) is exercised adversarially: partitionings chosen so a true
  * heavy key is locally light in most partitions.
  *
  * q117's contract: LOWER-median order statistics (rank (n+1) div 2) and
  * the STRICT `> k·MAD` boundary — a point at exactly k·MAD deviation is
  * not an outlier. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteHH(stream: Seq[Long], k: Int): Seq[(Long, Long)] = {
    val n = stream.size.toLong
    stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k >= n }
      .toSeq.sortBy { case (key, c) => (-c, key) }
  }

  test("q115: MG+recount == brute force under adversarial partitionings") {
    // one dominant key (40%), one boundary-heavy key, long unique tail
    val stream: Seq[Long] =
      Seq.fill(400)(7L) ++ Seq.fill(50)(13L) ++ (1000L until 1550L)
    val k = 20 // heavy ⇔ count ≥ 1000/20 = 50: key 7 and EXACTLY key 13
    val expected = bruteHH(stream, k)
    assert(expected.map(_._1) === Seq(7L, 13L),
      "test construction: expected exactly the planted heavies")
    // adversarial splits: heavy key clumped into one partition (locally
    // dominant nowhere else), spread thin across many, and shuffled
    val layouts = Seq(
      stream,                 // planted order: heavies clumped up front
      stream.reverse,         // heavies at the tail
      stream.sortBy(x => (x * 2654435761L) % 1009L), // deterministic shuffle
      stream.zipWithIndex.sortBy(_._2 % 7).map(_._1)) // round-robin smear
    for (layout <- layouts; parts <- Seq(1, 3, 8)) {
      val df = spark.createDataset(layout).repartition(parts).toDF("key")
      val got = Analytics.exactHeavyHitters(df, k)
        .select("key", "n_occurrences").as[(Long, Long)].collect().toSeq
      assert(got === expected, s"layout/parts=$parts diverged from brute force")
    }
  }

  test("q115: share_bp is integer basis points of the exact count") {
    val df = (Seq.fill(30)(1L) ++ Seq.fill(10)(2L)).toDF("key")
    val got = Analytics.exactHeavyHitters(df, 4)
      .as[(Long, Long, Long)].collect().toSeq
    // 30/40 = 7500 bp, 10/40 = 2500 bp; both ≥ 10000/4
    assert(got === Seq((1L, 30L, 7500L), (2L, 10L, 2500L)))
  }

  test("q117: lower median, exact MAD, strict k·MAD boundary") {
    // group a: values 0,10,20,30 → lower median = 10 (rank (4+1) div 2 = 2)
    //   deviations |v-10| = 10,0,10,20 → sorted 0,10,10,20 → MAD = 10
    //   k=2 ⇒ cutoff 20: dev 20 (v=30) is NOT an outlier (strict >),
    //   so group a flags nothing
    // group b: same plus v=51 → median 20, deviations 20,10,0,10,31 →
    //   MAD = 10 (rank 3 of 0,10,10,20,31); v=51 dev 31 > 20 flags;
    //   v=0 dev 20 does not (boundary again)
    val o = Seq(
      (1L, "a", 0L), (2L, "a", 10L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 0L), (6L, "b", 10L), (7L, "b", 20L), (8L, "b", 30L),
      (9L, "b", 51L)
    ).toDF("event_id", "g", "v")
    val got = Analytics.madFlags(o, 2)
      .select("event_type", "event_id", "v_cents", "med_cents", "mad_cents",
        "dev_cents")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("b", 9L, 51L, 20L, 10L, 31L)))
  }

  test("q117: value-frequency median handles repeated values (bucket " +
       "containing the rank, not one row per value)") {
    // group with heavy ties: 1,1,1,1,9 → lower median 1; MAD: devs
    // 0,0,0,0,8 → MAD 0 → any positive deviation flags at every k
    val o = Seq((1L, "t", 1L), (2L, "t", 1L), (3L, "t", 1L), (4L, "t", 1L),
      (5L, "t", 9L)).toDF("event_id", "g", "v")
    val got = Analytics.madFlags(o, 3)
      .select("event_id", "med_cents", "mad_cents", "dev_cents")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((5L, 1L, 0L, 8L)))
  }
}
