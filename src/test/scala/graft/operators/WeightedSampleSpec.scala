package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Text

/** q110's distributional law: the min-of-w-hash-draws key makes bottom-k
  * EXACT successive weighted sampling without replacement (among the
  * remaining items' pooled draws, each is equally likely minimal, so
  * P(item next) = w/Σw — the Efraimidis–Spirakis chain). The hash gate
  * proves cross-engine exactness of one universe; this spec measures the
  * LAW across many disjoint salt universes: selection frequencies must
  * track weight proportionality, the sample must be exactly k distinct
  * items, and a universe must be reproducible. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  /** The q110 kernel over (id, weight), salted into its own universe. */
  private def sample(items: DataFrame, k: Int, salt: String): Seq[Long] =
    items
      .withColumn("j", explode(sequence(lit(0L), col("weight") - lit(1L))))
      .withColumn("h", Text.portableHash(concat(col("id").cast("string"),
        lit(":"), col("j"), lit(":"), lit(salt))))
      .groupBy(col("id"), col("weight"))
      .agg(min(col("h")).as("minh"))
      .orderBy(col("minh").asc, col("id").asc)
      .limit(k)
      .select(col("id")).as[Long].collect().toSeq

  test("selection frequency tracks weight proportionality across salt " +
       "universes; samples are k distinct items; universes reproduce") {
    // 150 items of weight 1, 150 of weight 5 → heavy mass 750 of 900.
    // k = 30 ⇒ expected heavy picks ≈ 150·(1−(1−5/900)^30·…) ≈ 25
    val items = ((0L until 150L).map((_, 1L)) ++
      (150L until 300L).map((_, 5L))).toDF("id", "weight")
    val salts = (0 until 40).map(i => s"u$i")
    val heavies = salts.map { s =>
      val got = sample(items, 30, s)
      assert(got.size === 30 && got.distinct.size === 30,
        s"salt $s: sample not 30 distinct items")
      got.count(_ >= 150L)
    }
    val mean = heavies.sum.toDouble / heavies.size
    // binomial-ish spread over 40 universes: σ of the mean ≈ 0.3; the
    // [22, 28] band is ±10σ — a real proportionality failure (uniform
    // sampling would center at 15) sits far outside it
    assert(mean >= 22.0 && mean <= 28.0,
      s"heavy-item mean $mean outside the w-proportional band [22, 28]")
    assert(sample(items, 30, "u0") === sample(items, 30, "u0"),
      "same universe did not reproduce")
  }
}
