package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering — the lake LAYOUT tool for
  * multi-dimensional data skipping. Bucketing + [[zValue]] map a row's
  * (x, y) to its position on a space-filling curve; range-partitioning
  * and sorting the write by that position gives every output file a
  * TIGHT bounding box in BOTH dimensions, so any engine that prunes by
  * file/row-group min-max statistics (Spark parquet row groups, and the
  * file-skipping layer of every lakehouse format) answers a 2-D box
  * predicate from a small fraction of files. A single-column sort can
  * only do that for its leading column: a filter on the OTHER column
  * touches every file. That asymmetry — not the curve arithmetic — is
  * the point, and ZOrderSpec measures it.
  *
  * All pure `Column` arithmetic (shift/and/or over longs): codegen'd,
  * partition-parallel, and exactly reproducible in the DuckDB oracle —
  * q74 hash-verifies the curve math cell-by-cell.
  */
object Layout {

  /** Interleave the low `bits` of two bucket ids: bit i of `xb` lands at
    * even position 2i, bit i of `yb` at odd 2i+1 (y takes the higher bit,
    * so the curve's top-level split is on y). Inputs must already be
    * bucketed to [0, 2^bits); the result is in [0, 4^bits). */
  def zValue(xb: Column, yb: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val xi = shiftleft(shiftrightunsigned(xb, i).bitwiseAND(lit(1L)), 2 * i)
      val yi = shiftleft(shiftrightunsigned(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xi.bitwiseOR(yi)
    }.reduce(_ bitwiseOR _)
  }

  /** Clamped fixed-width range bucket: floor((v - lo) / width), capped to
    * [0, 2^bits). Fixed bounds, not data-derived quantiles — the layout
    * must not shift when the data grows (a re-cluster is an explicit
    * maintenance job, same stance as every lakehouse). */
  def rangeBucket(v: Column, lo: Column, width: Double, bits: Int): Column = {
    // 1L — at bits = 31 the Int shift overflows to a NEGATIVE cap, which
    // would silently clamp every row to bucket -1 and poison zValue; the
    // require mirrors zValue's so the two helpers' valid ranges agree
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    least(greatest(floor((v - lo) / width), lit(0.0)), lit((1L << bits) - 1.0))
      .cast("long")
  }

  /** Write `df` z-clustered on `z` into `nFiles` files: range-partition by
    * curve position (contiguous curve segments per file → tight per-file
    * bounding boxes), sort within each file (tight row-group stats too),
    * drop the helper column at the write edge. */
  def writeZOrdered(df: DataFrame, z: Column, path: String,
                    nFiles: Int): Unit = {
    val cols = df.columns
    // withColumn REPLACES an existing column of the same name — a caller
    // whose frame already carries `__z` would get curve positions written
    // out in its place (silent corruption), so refuse loudly instead
    require(!cols.contains("__z"),
      "writeZOrdered reserves the helper column name __z; rename the input column")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(cols.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(path)
  }
}
