package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** q107 evidence runner: the incremental claim is that applying a SMALL
  * new-edge batch costs Δ-proportional work, not a graph recount. This
  * times (a) the one-shot triangle recount (q104's count, same edge
  * build), and (b) `Relational.deltaTriangles` for a 1/16 hash batch
  * against the standing 15/16 — the steady-state shape of per-batch
  * maintenance. The registered q107 query folds ALL batches (so its
  * total ≈ a recount by construction — it re-derives every triangle
  * once); the per-batch ratio here is the number that matters at scale.
  *
  * Usage: runMain graft.tools.GraphDiag <sfDir>
  */
object GraphDiag {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val sp = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-graph-diag")
    sp.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(sp, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.join(li.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
      .filter(col("pk") < col("pk2"))
      .select(col("pk").as("a"), col("pk2").as("b"))
      .distinct()
      .withColumn("h16", pmod(graft.functions.Text.portableHash(
          concat(col("a").cast("string"), lit(","), col("b").cast("string"))),
        lit(16L)))
      .localCheckpoint() // both measurements start from a built edge log
    val nEdges = e.count()
    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // (a) one-shot recount: the q104 oracle's 3-way join shape (the
    // un-maintained alternative a batch apply would otherwise pay)
    val ed = e.select("a", "b")
    val (tFull, full) = time {
      ed.as("e1")
        .join(ed.as("e2"), col("e2.a") === col("e1.b"))
        .join(ed.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .count()
    }
    // (b) one 1/16 batch against the standing rest
    val old = e.filter(col("h16") =!= 0).select("a", "b").localCheckpoint()
    val batch = e.filter(col("h16") === 0).select("a", "b").localCheckpoint()
    val nBatch = batch.count()
    val (tDelta, dRow) = time {
      graft.operators.Relational.deltaTriangles(old, batch).collect().head
    }
    println(s"""{"metric":"triangle_delta_diag","sf":"$d","n_edges":$nEdges,""" +
      s""""n_batch_edges":$nBatch,"full_recount_sec":${"%.3f".format(tFull)},""" +
      s""""full_triangles":$full,""" +
      s""""batch_apply_sec":${"%.3f".format(tDelta)},""" +
      s""""batch_delta_triangles":${dRow.getAs[Long]("delta_triangles")}}""")
    sp.stop()
  }
}
