package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketing — the lake-side answer to the fact⋈fact shuffle that shows up
  * in q03/q04/q09's plans. Both sides bucketed+sorted on the join key means
  * the sort-merge join consumes co-located buckets directly: ZERO Exchange,
  * ZERO Sort in the join plan. At 100 TB this turns the dominant cost of
  * every keyed join/merge (full-table shuffle) into a pure map-side merge,
  * which is why the engine's scaladocs keep saying "bucket the sink by the
  * merge key on a real lake" — this spec proves the claim on this engine.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans no shuffle and no sort") {
    val bucketed = "spark.sql.sources.bucketing.enabled"
    val bcThresh = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcThresh)
    try {
      // force the sort-merge path so the assertion is about co-location,
      // not about the broadcast fallback
      spark.conf.set(bcThresh, "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables.orders(spark, sfDir).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.customer(spark, sfDir).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val joined = spark.table("b_customer")
        .join(spark.table("b_orders"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // correctness of the co-located result
      val viaBuckets = joined.count()
      val viaPlain = Tables.customer(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1))).count()
      assert(viaBuckets === viaPlain)
    } finally {
      spark.conf.set(bcThresh, prevBc)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
