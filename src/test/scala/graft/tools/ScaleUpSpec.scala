package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Native

/** The scale-ladder generator must produce data that scales the WORKLOAD,
  * not just the row count: keys stay FK-consistent per replica, replica 0
  * embeds the source exactly, and the similarity corpora are perturbed so
  * no cross-replica twin pairs appear (a verbatim copy would turn the
  * near-dup queries quadratic — the failure mode the perturbation exists
  * to prevent). BENCH_sf1.json's credibility rests on these properties. */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.001"
  private val dst = "/tmp/scaleup-spec"
  private val Off = 10000000L

  override def beforeAll(): Unit = {
    super.beforeAll()
    ScaleUp.run(spark, src, dst, reps = 2)
  }

  test("row counts: facts scale by replicas, fixed dims copy once") {
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
        "documents", "embeddings").foreach { t =>
      val n0 = Tables.load(spark, src, t).count()
      val n1 = Tables.load(spark, dst, t).count()
      assert(n1 === 2 * n0, s"$t: expected ${2 * n0}, got $n1")
    }
    Seq("region", "nation").foreach { t =>
      assert(Tables.load(spark, dst, t).count() ===
             Tables.load(spark, src, t).count(), s"$t should copy once")
    }
  }

  test("FK integrity holds within every replica") {
    val orphans = Tables.load(spark, dst, "orders").as("o")
      .join(Tables.load(spark, dst, "customer").as("c"),
        col("o.o_custkey") === col("c.c_custkey"), "left_anti")
      .count()
    assert(orphans === 0, s"$orphans orders reference missing customers")
    val liOrphans = Tables.load(spark, dst, "lineitem").as("l")
      .join(Tables.load(spark, dst, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"), "left_anti")
      .count()
    assert(liOrphans === 0, s"$liOrphans lineitems reference missing orders")
  }

  test("replica 0 is the identity — the source SF embeds exactly") {
    val a = Tables.load(spark, src, "lineitem")
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * 100 + 0.5)),
           sum(col("l_orderkey"))).as[(Long, Long, Long)].head()
    val b = Tables.load(spark, dst, "lineitem")
      .filter(col("l_orderkey") < Off)
      .agg(count(lit(1)), sum(floor(col("l_extendedprice") * 100 + 0.5)),
           sum(col("l_orderkey"))).as[(Long, Long, Long)].head()
    assert(a === b)
    // bit_xor: order-independent row digest with no ANSI sum-overflow
    val d0 = Tables.load(spark, src, "documents")
      .agg(expr("bit_xor(xxhash64(doc_id, text))")).as[Long].head()
    val d1 = Tables.load(spark, dst, "documents")
      .filter(col("doc_id") < Off)
      .agg(expr("bit_xor(xxhash64(doc_id, text))")).as[Long].head()
    assert(d0 === d1, "replica-0 documents are not byte-identical")
  }

  test("cross-replica documents are NOT near-dups (shingle Jaccard < 0.8)") {
    // measured at the granularity q18 actually gates on: 3-gram SHINGLE
    // Jaccard (a short low-diversity doc can keep word-level J ≈ 0.83
    // across replicas, but each rewritten word kills up to 3 shingles —
    // measured here: max 0.78, mean 0.26 on this corpus)
    val docs = Tables.load(spark, dst, "documents")
      .select(col("doc_id"),
        Native.shingles(split(col("text"), " "), 3).as("s"))
    val j = docs.filter(col("doc_id") < Off).as("a")
      .join(docs.filter(col("doc_id") >= Off).as("b"),
        col("b.doc_id") === col("a.doc_id") + Off)
      .select((size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
               size(array_union(col("a.s"), col("b.s")))).as("j"))
    val (jMax, jAvg, n) = j.agg(max(col("j")), avg(col("j")), count(lit(1)))
      .as[(Double, Double, Long)].head()
    assert(n > 0 && jMax < 0.8,
      f"cross-replica twin pairs would explode near-dup queries: max J=$jMax%.3f")
    assert(jAvg < 0.5, f"perturbation too weak on average: mean J=$jAvg%.3f")
  }

  test("cross-replica embeddings are NOT cosine near-dups (< 0.999)") {
    val e = Tables.load(spark, dst, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Native.dotProduct(col("v"), col("v"))))
    val sims = e.filter(col("vec_id") < Off).as("a")
      .join(e.filter(col("vec_id") >= Off).as("b"),
        col("b.vec_id") === col("a.vec_id") + Off)
      .select((Native.dotProduct(col("a.v"), col("b.v")) /
               (col("a.nrm") * col("b.nrm"))).as("sim"))
    val (sMax, n) = sims.agg(max(col("sim")), count(lit(1)))
      .as[(Double, Long)].head()
    assert(n > 0 && sMax < 0.999,
      f"cross-replica cosine twins would explode q35: max sim=$sMax%.5f")
  }
}
