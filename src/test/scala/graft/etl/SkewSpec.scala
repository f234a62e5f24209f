package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join: result-equivalence with the plain join, and actual
  * distribution of a hot key across salt buckets. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on a skewed dataset") {
    // 10k rows of one hot key + a uniform tail
    val big = spark.range(10000).select(lit(7L).as("k"), col("id").as("v"))
      .unionByName(spark.range(500).select((col("id") % 50).as("k"),
        (col("id") + 100000).as("v")))
    val small = Seq((7L, "hot"), (3L, "cold"), (11L, "cold"))
      .toDF("k", "label")

    val plain = big.join(small, Seq("k"))
      .select("k", "v", "label").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .select("k", "v", "label").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
    assert(plain.count(_._1 == 7L) === 10010)
  }

  test("the hot key's rows actually spread across salt buckets") {
    val big = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
    val salts = big.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)).cast("int"))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    assert(salts.size === 8, s"expected 8 buckets, got ${salts.keySet}")
    assert(salts.values.max < 1000 * 0.3, s"skewed salt distribution: $salts")
  }

  test("keyHistogram surfaces the heavy hitter") {
    val big = spark.range(900).select(lit(42L).as("k"))
      .unionByName(spark.range(100).select(col("id").as("k")))
    val top = Skew.keyHistogram(big, col("k"), 1)
      .as[(Long, Long)].collect().head
    assert(top === ((42L, 901L))) // 42 appears once in the tail too
  }
}
