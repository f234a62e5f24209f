package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Native

/** Recall gate for the IVF probe (r4 verdict #5: "single-probe recall is
  * the known cliff of IVF at scale; add nprobe and a spec measuring
  * recall@k against brute-force ground truth, ≥0.95 target").
  *
  * The harness embeddings can't host this gate: their labels are NOT
  * cosine clusters (measured: same-label mean cosine ≈ cross-label ≈ 0),
  * so label-IVF recall there is structurally nprobe/nlist whatever the
  * implementation does. This spec constructs a corpus with REAL cluster
  * structure — 10 well-separated centroids, 100 members each — and makes
  * every query a deliberate 50/50 BOUNDARY blend of two adjacent
  * centroids: the worst case for single-probe (the query's true neighbors
  * split across two clusters; probe 1 sees only one side). Both the
  * ground truth (bruteTopK) and the candidates (ivfCentroidProbe) run
  * through the production operator cores over this frame.
  */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** Deterministic pseudo-random component in [-0.5, 0.5) — the engine's
    * Knuth-hash family (sign_sketch hyperplanes), different seed space. */
  private def h(seed: Long, i: Int): Double =
    (((seed * Dim + i) * 2654435761L) % 1000L) / 1000.0 - 0.5

  private def centroid(c: Int): Array[Double] =
    Array.tabulate(Dim)(i => h(1000L + c, i))
  private def noise(id: Long): Array[Double] =
    Array.tabulate(Dim)(i => h(5000L + id, i))

  /** 1000 vectors, cluster = (vec_id / 50) % 10 (so the operator's fixed
    * QueryIds — multiples of 50 — spread across ALL 10 clusters, 2 each):
    * members sit at centroid + 0.15·noise; queries are 0.5/0.5 blends of
    * their own and the NEXT centroid + 0.02·noise — equidistant from two
    * clusters, with true neighbors on both sides. */
  private def clusteredCorpus: DataFrame = {
    val rows = (0L until 1000L).map { id =>
      val cl = ((id / 50) % 10).toInt
      val v =
        if (id % 50 == 0) {
          val a = centroid(cl); val b = centroid((cl + 1) % 10); val n = noise(id)
          Array.tabulate(Dim)(i => 0.5 * a(i) + 0.5 * b(i) + 0.02 * n(i)).toSeq
        } else {
          val a = centroid(cl); val n = noise(id)
          Array.tabulate(Dim)(i => a(i) + 0.15 * n(i)).toSeq
        }
      (id, cl, v)
    }
    rows.toDF("vec_id", "label", "v")
      .withColumn("nrm", sqrt(Native.dotProduct(col("v"), col("v"))))
  }

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("q_id"), col("n_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  /** Mean recall@k over the 20 queries. */
  private def recallOf(cand: Map[Long, Set[Long]],
                       truth: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      cand.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    per.sum / per.size
  }

  test("multi-probe IVF recovers boundary queries: recall@5 >= 0.95 at nprobe=2") {
    val e = clusteredCorpus.cache()
    try {
      val truth = topSets(Similarity.bruteTopK(e, 5))
      assert(truth.size === 20 && truth.forall(_._2.size === 5))
      val r1 = recallOf(topSets(Similarity.ivfCentroidProbe(e, 1, 5)), truth)
      val r2 = recallOf(topSets(Similarity.ivfCentroidProbe(e, 2, 5)), truth)
      // single probe sees one side of every boundary query — materially
      // lossy; the second probe (the blend's other cluster) must recover
      // nearly everything
      assert(r1 <= 0.85, f"boundary construction failed — r1=$r1%.3f not lossy")
      assert(r2 >= 0.95, f"nprobe=2 recall $r2%.3f below the 0.95 gate (r1=$r1%.3f)")
      // measured on this corpus: r1 = 0.82, r2 = 1.00
      assert(r2 >= r1 + 0.1, f"multi-probe gained too little: $r1%.3f -> $r2%.3f")
    } finally { e.unpersist(); () }
  }

  /** A fresh batch with the corpus's member distribution (new ids). */
  private def inDistributionBatch: DataFrame =
    (2000L until 2100L).map { id =>
      val cl = (id % 10).toInt
      val a = centroid(cl); val n = noise(id)
      (id, cl, Array.tabulate(Dim)(i => a(i) + 0.15 * n(i)).toSeq)
    }.toDF("vec_id", "label", "v")

  /** The same batch pushed 0.8 per dimension off every centroid —
    * embedding drift (a re-trained upstream encoder, a new modality). */
  private def shiftedBatch: DataFrame =
    (3000L until 3100L).map { id =>
      val cl = (id % 10).toInt
      val a = centroid(cl); val n = noise(id)
      (id, cl, Array.tabulate(Dim)(i => a(i) + 0.15 * n(i) + 0.8).toSeq)
    }.toDF("vec_id", "label", "v")

  test("refreshIfDrifted: in-distribution batch keeps the frozen model; " +
       "a shifted batch retrains to exactly the from-scratch union model") {
    val corpus = clusteredCorpus
    def model(path: String) = spark.read.parquet(path)
      .select(col("label"), col("cv")).as[(Int, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    def tmp(n: String) =
      java.nio.file.Files.createTempDirectory(n).toString + "/model"

    val steady = tmp("graft-refresh-steady")
    assert(!Similarity.refreshIfDrifted(spark, steady, corpus,
      inDistributionBatch), "in-distribution batch triggered a refresh")
    assert(model(steady) ===
      Similarity.trainCentroids(corpus.select(col("label"), col("v")))
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq,
      "model changed without a refresh")

    val drifted = tmp("graft-refresh-drift")
    assert(Similarity.refreshIfDrifted(spark, drifted, corpus, shiftedBatch),
      "shifted batch did not trigger a refresh")
    assert(model(drifted) ===
      Similarity.trainCentroids(
          corpus.select(col("label"), col("v"))
            .unionByName(shiftedBatch.select(col("label"), col("v"))))
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq,
      "refreshed model != from-scratch train on corpus ∪ batch")
  }
}
