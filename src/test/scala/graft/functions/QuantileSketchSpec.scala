package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The pair-sketch's contracts (q101's building block): mergeability —
  * batch sketch tables absorbed through [[QuantileSketch.mergeTables]]
  * equal the one-shot sketch under any split and association — plus the
  * sample law (k smallest distinct hashes with their values, sorted) and
  * an accuracy bound of the order-statistic estimate against the exact
  * quantile on a large skewed input. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  private def sketch(rows: Seq[(Long, Long, Long)], k: Int = K): DataFrame = {
    val qsk = udaf(new QuantileSketch.Agg(k))
    rows.toDF("g", "h", "v").groupBy(col("g"))
      .agg(qsk(col("h"), col("v")).as("sk"))
      .select(col("g"), col("sk.pairs").as("pairs"))
  }

  private def rowsOf(df: DataFrame): List[(Long, List[(Long, Long)])] =
    df.select(col("g"), col("pairs")).as[(Long, List[(Long, Long)])]
      .collect().sortBy(_._1).toList

  private val gen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 40L),
      Gen.choose(0L, 999L)))

  test("property: mergeTables over any batch split equals the one-shot " +
       "sketch, in any association order — WITHOUT hash-unique inputs " +
       "(r11 advisor note: collisions keep min value, a pure set function)") {
    for (seed <- 0L until 8L) {
      val raw = gen(Gen.Parameters.default, Seed(seed)).get
      val oneShot = rowsOf(sketch(raw))
      val (b1, rest) = raw.splitAt(raw.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      val (t1, t2, t3) = (sketch(b1), sketch(b2), sketch(b3))
      val leftAssoc = QuantileSketch.mergeTables(
        QuantileSketch.mergeTables(t1, t2, Seq("g"), "pairs", K),
        t3, Seq("g"), "pairs", K)
      val rightAssoc = QuantileSketch.mergeTables(
        t1, QuantileSketch.mergeTables(t2, t3, Seq("g"), "pairs", K),
        Seq("g"), "pairs", K)
      assert(rowsOf(leftAssoc) === oneShot, s"seed $seed: left-assoc differs")
      assert(rowsOf(rightAssoc) === oneShot, s"seed $seed: right-assoc differs")
    }
  }

  test("mergeTables is idempotent: a table absorbed into itself is unchanged") {
    val raw = gen(Gen.Parameters.default, Seed(99L)).get
    val t = sketch(raw)
    assert(rowsOf(QuantileSketch.mergeTables(t, t, Seq("g"), "pairs", K))
      === rowsOf(t))
  }

  test("sketch keeps the pairs of the k smallest distinct hashes, sorted " +
       "by hash, minimum value winning per hash") {
    val raw = Seq.tabulate(30)(i => (1L, (i % 15) * 7L, 100L + i)) // h dupes
    val out = rowsOf(sketch(raw))
    // hashes 0,7,…,49; per hash arrivals i = h/7 and h/7 + 15 carry
    // values 100+h/7 < 115+h/7 — the minimum survives either order
    assert(out === List((1L,
      (0 until K).map(j => (j * 7L, 100L + j)).toList)))
    val rev = rowsOf(sketch(raw.reverse))
    assert(rev === out, "collision winner depended on arrival order")
  }

  test("order-statistic estimate lands within O(1/sqrt(k)) rank error of " +
       "the exact quantile on a skewed input") {
    val k = 256
    // splitmix64 finalizer — a well-mixed stand-in for the portable hash
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // 20k rows, skewed: v = id^2 % 100000 spreads the mass unevenly
    val rows = (0L until 20000L).map { id =>
      (0L, mix(id), (id * id) % 100000L)
    }
    val pairs = rowsOf(sketch(rows.map { case (g, h, v) => (g, h, v) }, k))
      .head._2
    val vals = pairs.map(_._2).sorted.toIndexedSeq
    val exact = rows.map(_._3).sorted.toIndexedSeq
    for (p <- Seq(50, 90, 99)) {
      val est = vals(((vals.size - 1) * p) / 100)
      // rank of the estimate in the EXACT distribution, in basis points
      val rankBp = exact.count(_ <= est) * 10000L / exact.size
      val err = math.abs(rankBp - p * 100L)
      // 3/sqrt(k) ≈ 0.1875 → 1875 bp of slack at k=256
      assert(err <= 1875,
        s"p$p estimate $est has rank error $err bp (> 1875)")
    }
  }
}
