package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) bottom-k sketch as a typed [[Aggregator]] — the
  * custom-aggregate tier of the build guidance (a mergeable sketch Spark
  * has no built-in for; `approx_count_distinct` is HLL, which gives an
  * estimate but no sample and no exact cross-engine replay).
  *
  * The sketch keeps the k smallest DISTINCT hash values seen. It is:
  *  - mergeable (union, keep k smallest) → partial aggregation works, the
  *    shuffle carries ≤ k longs per group at any input size;
  *  - a distinct-count estimator: est ≈ (k-1) · H / h_k for hash space
  *    [0, H) — with the portable md5 hash both engines reproduce h_k
  *    EXACTLY, so unlike HLL the estimate itself is oracle-verifiable;
  *  - a uniform sample of the group's distinct values (bottom-k by hash =
  *    consistent sampling), reusable for per-group auditing.
  *
  * Buffer/output are case classes so Encoders.product keeps everything in
  * Catalyst's serialized format (no kryo blobs).
  */
object KmvSketch {

  /** Table-level sketch merge — the maintenance op of a MATERIALIZED
    * per-group sketch table (the production retention shape at 100 TB:
    * incremental batches each produce a small (group → bottom-k hashes)
    * table, and the standing table absorbs them without ever touching
    * raw history). Union the tables, re-aggregate each group's hashes
    * through the same [[Agg]] — set-union-keep-k-smallest is exactly the
    * aggregator's merge, so the result is bit-identical to sketching the
    * concatenated raw input (KmvSketchSpec proves associativity and
    * idempotence across arbitrary batch splits).
    *
    * Scale: the explode fans out ≤ k longs per group-row, partial
    * aggregation combines map-side, and the shuffle carries ≤ k longs
    * per group — cost is proportional to the sketch table, never the
    * corpus that produced it. */
  def mergeTables(a: org.apache.spark.sql.DataFrame,
                  b: org.apache.spark.sql.DataFrame,
                  keys: Seq[String], hashesCol: String,
                  k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val kmv = udaf(new Agg(k))
    a.unionByName(b)
      .select(keys.map(col) :+ explode(col(hashesCol)).as("__h"): _*)
      .groupBy(keys.map(col): _*)
      .agg(kmv(col("__h")).as("__sk"))
      .select(keys.map(col) :+ col("__sk.hashes").as(hashesCol): _*)
  }

  /** Sorted-ascending distinct hashes, at most k. `Vector`, not `Seq`:
    * [[Agg.search]] indexes into the buffer, and a List-backed Seq would
    * silently turn the binary search into O(k log k) per probe. */
  case class Buf(hashes: Vector[Long])
  case class Out(hashes: Seq[Long])

  class Agg(k: Int) extends Aggregator[Long, Buf, Out] {
    require(k >= 2, "k must be >= 2")

    override def zero: Buf = Buf(Vector.empty)

    override def reduce(b: Buf, h: Long): Buf = insert(b, h)

    override def merge(a: Buf, b: Buf): Buf =
      b.hashes.foldLeft(a)(insert)

    private def insert(b: Buf, h: Long): Buf = {
      val hs = b.hashes
      if (hs.length >= k && h >= hs.last) b
      else {
        val idx = search(hs, h) // -1 → present, skip
        if (idx < 0) b
        else {
          // the accepting branch still copies O(k) — unavoidable with an
          // immutable buffer — but acceptance is rare once the sketch
          // saturates (p ≈ k/n); the common reject paths above stay O(1)
          // (last-element gate) and O(log k) (search, no copy)
          val inserted = (hs.take(idx) :+ h) ++ hs.drop(idx)
          Buf(if (inserted.length > k) inserted.take(k) else inserted)
        }
      }
    }

    /** Binary search over the sorted buffer in place — indexed access is
      * pinned by Buf's `Vector` type; the win over sorting/copying per
      * probe is avoiding any allocation on the common reject path. */
    private def search(hs: Vector[Long], h: Long): Int = {
      var lo = 0
      var hi = hs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = hs(mid)
        if (v == h) return -1
        else if (v < h) lo = mid + 1
        else hi = mid - 1
      }
      lo
    }

    override def finish(b: Buf): Out = Out(b.hashes)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}
