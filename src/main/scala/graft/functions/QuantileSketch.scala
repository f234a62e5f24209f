package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash VALUE sample as a typed [[Aggregator]] — the quantile
  * twin of [[KmvSketch]] (which keeps only hashes). Keeping the k pairs
  * (h, v) with the smallest DISTINCT hashes is a consistent uniform
  * random sample of the group's keyed rows, so any order statistic of the
  * kept values estimates the group quantile with O(1/√k) error — the
  * mergeable shape percentile reporting actually ships at 100 TB, where
  * q51's exact per-group sort of the raw data is the thing being avoided.
  *
  * Why not t-digest/KLL: both are mergeable but their buffers depend on
  * arrival/merge order, so no cross-engine oracle can replay them. The
  * bottom-k sample is ORDER-FREE (set union, keep k smallest hashes) —
  * with the portable md5 hash the DuckDB oracle reproduces the exact
  * sample and therefore the exact estimate, making the probabilistic
  * operator hash-comparable (the q45/q93 argument, extended from distinct
  * counts to quantiles). QuantileSketchSpec proves merge associativity /
  * replay idempotence across arbitrary batch splits, and bounds the
  * estimate against the exact quantile.
  *
  * Contract: the hash identifies the ROW (unique key per row); two rows
  * with equal hashes are treated as one observation (the second's value
  * is dropped), exactly like KMV's distinct semantics.
  *
  * Scale: partial aggregation combines map-side; the shuffle carries ≤ k
  * (long, long) pairs per group at any input size.
  */
object QuantileSketch {

  /** Sample pair: portable row hash + the measured value. */
  case class HV(h: Long, v: Long)

  /** Pairs sorted ascending by hash, at most k — Vector for O(log k)
    * binary-search probes, the [[KmvSketch.Buf]] rationale. */
  case class Buf(pairs: Vector[HV])
  case class Out(pairs: Seq[HV])

  class Agg(k: Int) extends Aggregator[HV, Buf, Out] {
    require(k >= 2, "k must be >= 2")

    override def zero: Buf = Buf(Vector.empty)

    override def reduce(b: Buf, p: HV): Buf = insert(b, p)

    override def merge(a: Buf, b: Buf): Buf =
      b.pairs.foldLeft(a)(insert)

    private def insert(b: Buf, p: HV): Buf = {
      val ps = b.pairs
      // strict >: an equal last hash still needs the collision min-merge
      if (ps.length >= k && p.h > ps.last.h) b
      else {
        val idx = lowerBound(ps, p.h)
        if (idx < ps.length && ps(idx).h == p.h)
          // hash collision: keep the MINIMUM value — a pure set function
          // of the (h, v) pairs, so the sketch stays arrival-order-free
          // even across colliding hashes (the advisor's r11 note: "keep
          // first seen" depended on shuffle order; the DuckDB oracle
          // replays min-per-hash exactly)
          if (p.v < ps(idx).v) Buf(ps.updated(idx, p)) else b
        else {
          val inserted = (ps.take(idx) :+ p) ++ ps.drop(idx)
          Buf(if (inserted.length > k) inserted.take(k) else inserted)
        }
      }
    }

    /** First index with hash ≥ h (insertion point; callers test for an
      * exact hit at the returned slot). */
    private def lowerBound(ps: Vector[HV], h: Long): Int = {
      var lo = 0
      var hi = ps.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = ps(mid).h
        if (v < h) lo = mid + 1
        else hi = mid - 1
      }
      lo
    }

    override def finish(b: Buf): Out = Out(b.pairs)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Table-level sketch merge — [[KmvSketch.mergeTables]] for the pair
    * sketch: a standing per-group sample table absorbs incremental batch
    * sample tables without ever re-reading raw history, bit-identical to
    * sketching the concatenated input (set-union-keep-k-smallest is the
    * aggregator's own merge). */
  def mergeTables(a: org.apache.spark.sql.DataFrame,
                  b: org.apache.spark.sql.DataFrame,
                  keys: Seq[String], pairsCol: String,
                  k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val qsk = udaf(new Agg(k))
    a.unionByName(b)
      .select(keys.map(col) :+ explode(col(pairsCol)).as("__p"): _*)
      .groupBy(keys.map(col): _*)
      .agg(qsk(col("__p.h"), col("__p.v")).as("__sk"))
      .select(keys.map(col) :+ col("__sk.pairs").as(pairsCol): _*)
  }
}
