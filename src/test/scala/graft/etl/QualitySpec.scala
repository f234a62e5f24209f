package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DQ checks' counting contracts on constructed dirty frames — every
  * violation class fires with a known count, and the one-scan fused
  * [[Quality.rowChecks]] equals the per-check forms row-for-row. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("check_name"), col("n_checked"), col("n_violations"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  test("each check counts its violation class on a constructed dirty frame") {
    val dirty = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(999L)), // dup key + range hit
      (Some(2L), None),                              // null value
      (None, Some(50L)),                             // null key
      (Some(3L), Some(-5L))                          // below range
    ).toDF("k", "v")
    assert(rows(Quality.notNull(dirty, "k")) ===
      Seq(("not_null(k)", 5L, 1L)))
    assert(rows(Quality.unique(dirty, Seq("k"))) ===
      Seq(("unique(k)", 4L, 2L))) // null key out; both dup rows count
    assert(rows(Quality.inRange(dirty, "v", lit(0L), lit(100L))) ===
      Seq(("in_range(v)", 5L, 2L))) // nulls are not range violations
    val parent = Seq(1L, 2L).toDF("pk")
    assert(rows(Quality.fkCovered(dirty, "k", parent, "pk")) ===
      Seq(("fk(k)", 4L, 1L))) // k=3 orphaned; null key not checked
  }

  test("fused rowChecks == the separate per-check forms, in one scan") {
    val dirty = Seq((Some(1L), Some(10L)), (Some(2L), None),
      (None, Some(500L))).toDF("k", "v")
    val fused = rows(Quality.rowChecks(dirty, Seq(
      Quality.notNullCheck("k"), Quality.notNullCheck("v"),
      Quality.inRangeCheck("v", lit(0L), lit(100L)))))
    val separate = rows(Quality.report(Seq(
      Quality.notNull(dirty, "k"), Quality.notNull(dirty, "v"),
      Quality.inRange(dirty, "v", lit(0L), lit(100L)))))
    assert(fused === separate)
    // one scan: a single aggregate, no union of per-check plans
    val plan = Quality.rowChecks(dirty, Seq(Quality.notNullCheck("k"),
      Quality.inRangeCheck("v", lit(0L), lit(100L))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"fused checks planned a union:\n$plan")
  }
}
