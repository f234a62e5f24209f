package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for keyed joins.
  *
  * AQE's skew-join splitting (on in every [[graft.Sessions]] session) is
  * the first line of defense, but it only splits SHUFFLE partitions of a
  * sort-merge join — it cannot help when a single hot key must meet a
  * broadcast-ineligible dimension, or when the skew is so extreme one key
  * exceeds an executor. Salting is the manual fix: spread each hot key
  * across `salt` synthetic sub-keys on the big side and replicate the
  * matching small-side rows to every sub-key, so the hot key's work lands
  * on `salt` tasks instead of one.
  *
  * Cost model: small side grows ×salt (keep it the genuinely-small side);
  * big side's shuffle is unchanged in volume but its hottest partition
  * shrinks ÷salt. Pick salt ≈ hot-key rows / target-partition rows.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways. Result equals
    * `big.join(small, key)` row-for-row; only the distribution changes.
    * The salt is derived from xxhash64 over the big side's whole row, so
    * rows of one hot key spread uniformly and deterministically. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
           lit(salt.toLong)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-n heavy-hitter keys with counts — the diagnostic used to decide
    * whether (and how much) to salt. One pass, partial-aggregated. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
