package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q94's two contracts on a constructed hot-user corpus (VERDICT r10
  * item 6): (1) bounded-horizon bucketing changes NO per-view outcome —
  * the replica lookahead makes the widened key exact, not approximate;
  * (2) the bare-user_id window really does serialize the hot user into
  * one task partition, and bucketing really does spread it — measured on
  * physical partitions, the SkewSpec methodology. */
class FunnelSkewSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = 86400L * 1000000L
  private val Lookahead =
    Events.FunnelClickHorizonUs + Events.FunnelPurchaseHorizonUs

  /** One pathological user emitting an event every ~2 minutes for a month
    * (21 000 events), plus 200 normal users with 30 hourly events each —
    * deterministic formulas, no RNG. */
  private lazy val corpus: DataFrame = {
    val types = Array("view", "click", "purchase")
    val hot = (0 until 21000).map(i =>
      (1L, 1000000L + i.toLong * 118L * 1000000L, types(i % 3)))
    val normal = for (u <- 2 to 201; j <- 0 until 30) yield
      (u.toLong, 1000000L + u * 1000000L + j.toLong * 3600L * 1000000L,
        types((u + j) % 3))
    (hot ++ normal).toDF("user_id", "us", "event_type")
  }

  private def bare(e: DataFrame): DataFrame =
    e.withColumn("bucket", lit(0L)).withColumn("home", lit(true))

  test("bucketed funnel resolves every view identically to the bare form") {
    def outcomes(e: DataFrame) =
      Events.funnelResolved(e)
        .select(col("user_id"), col("us"), col("clicked"), col("purchased"))
        .as[(Long, Long, Boolean, Boolean)].collect().sorted.toList
    val a = outcomes(bare(corpus))
    val b = outcomes(Events.funnelBucketed(corpus, DayUs, Lookahead))
    assert(a.nonEmpty && a.count(_._3) > 0 && a.count(_._4) > 0,
      "corpus must exercise clicked and purchased paths")
    assert(b === a, "bucketing changed a per-view outcome")
  }

  test("the hot user serializes into one partition bare; bucketing spreads " +
       "it (measured physical partitions)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "201")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def maxPartition(df: DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val bareMax = maxPartition(Events.funnelResolved(bare(corpus)))
      val bucketedMax = maxPartition(
        Events.funnelResolved(Events.funnelBucketed(corpus, DayUs, Lookahead)))
      // the hot user has 7000 views, all retained by the window partition
      // that owns the bare user_id key; per day-bucket it is ~244
      assert(bareMax >= 7000, s"hot user not concentrated: $bareMax")
      assert(bucketedMax * 8 <= bareMax,
        s"bucketing did not spread the hot user: $bucketedMax vs $bareMax")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
