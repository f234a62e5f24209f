package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The KMV sketch's MERGEABILITY contract (q93's incremental half): a
  * materialized per-group sketch table absorbed batch-by-batch through
  * [[KmvSketch.mergeTables]] must be bit-identical to sketching the whole
  * raw input one-shot, under ANY batch split and ANY merge grouping —
  * that's what makes the 100 TB retention shape (update the sketch table,
  * never re-read history) correct rather than approximate-on-approximate. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8 // small k so saturation + eviction paths all exercise

  private def sketch(rows: Seq[(Long, Long)]): DataFrame = {
    val kmv = udaf(new KmvSketch.Agg(K))
    rows.toDF("g", "h").groupBy(col("g")).agg(kmv(col("h")).as("sk"))
      .select(col("g"), col("sk.hashes").as("hashes"))
  }

  private def rowsOf(df: DataFrame): List[(Long, List[Long])] =
    df.select(col("g"), col("hashes")).as[(Long, List[Long])]
      .collect().sortBy(_._1).toList

  private val gen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 40L)))

  test("property: mergeTables over any batch split equals the one-shot " +
       "sketch, in any association order") {
    for (seed <- 0L until 8L) {
      val raw = gen(Gen.Parameters.default, Seed(seed)).get
      val oneShot = rowsOf(sketch(raw))
      val (b1, rest) = raw.splitAt(raw.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      val (t1, t2, t3) = (sketch(b1), sketch(b2), sketch(b3))
      val leftAssoc = KmvSketch.mergeTables(
        KmvSketch.mergeTables(t1, t2, Seq("g"), "hashes", K),
        t3, Seq("g"), "hashes", K)
      val rightAssoc = KmvSketch.mergeTables(
        t1, KmvSketch.mergeTables(t2, t3, Seq("g"), "hashes", K),
        Seq("g"), "hashes", K)
      assert(rowsOf(leftAssoc) === oneShot, s"seed $seed: left-assoc differs")
      assert(rowsOf(rightAssoc) === oneShot, s"seed $seed: right-assoc differs")
    }
  }

  test("mergeTables is idempotent: a table absorbed into itself is unchanged") {
    val raw = gen(Gen.Parameters.default, Seed(99L)).get
    val t = sketch(raw)
    val merged = KmvSketch.mergeTables(t, t, Seq("g"), "hashes", K)
    assert(rowsOf(merged) === rowsOf(t))
  }

  test("sketch keeps the k smallest distinct hashes, sorted") {
    val raw = Seq.tabulate(30)(i => (1L, (i % 15) * 7L)) // dupes + 15 distinct
    val out = rowsOf(sketch(raw))
    assert(out === List((1L, (0 until K).map(_ * 7L).toList)))
  }
}
