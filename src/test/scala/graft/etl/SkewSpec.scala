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

  test("salting beats the plain join's max output partition on the real plan") {
    // the whole point of the operator, measured on actual physical
    // partitions: with AQE off (it would coalesce/split and blur the
    // comparison) and broadcast off (the salted path exists precisely for
    // broadcast-ineligible dimensions), the plain shuffle join lands every
    // hot-key row in ONE task's partition; the salted join spreads them
    // across `salt` tasks.
    // 201 shuffle partitions: with the default 32, several of the 8
    // (hot-key, salt) combos hash into the SAME shuffle partition and the
    // win shrinks to ~1.3x — the salt-to-partition collision a real
    // deployment avoids by sizing salt × partitions, made explicit here
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "201")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(10000).select(lit(7L).as("k"), col("id").as("v"))
        .unionByName(spark.range(500).select((col("id") % 50).as("k"),
          (col("id") + 100000).as("v")))
      val small = spark.range(50).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("label"))
      def maxPartition(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val plainMax  = maxPartition(big.join(small, Seq("k")))
      val saltedMax = maxPartition(Skew.saltedJoin(big, small, "k", salt = 8))
      // hot key = 10000 of 10500 rows: plain → one ~10k partition; salted
      // → ~10k/8 per partition. Require at least a 2x win to stay robust
      // to hash placement of the uniform tail.
      assert(plainMax >= 10000, s"hot key not concentrated: $plainMax")
      assert(saltedMax * 2 <= plainMax,
        s"salting did not spread the hot key: salted max $saltedMax vs plain $plainMax")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("keyHistogram surfaces the heavy hitter") {
    val big = spark.range(900).select(lit(42L).as("k"))
      .unionByName(spark.range(100).select(col("id").as("k")))
    val top = Skew.keyHistogram(big, col("k"), 1)
      .as[(Long, Long)].collect().head
    assert(top === ((42L, 901L))) // 42 appears once in the tail too
  }
}
