package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.Media
import graft.operators.{Analytics, Documents, Events, Extraction, Ingest,
  Linkage, Relational, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the north-star
  * extensions) registers a named query here; each SQL-expressible one also
  * registers equivalent DuckDB SQL in [[oracleSql]] for the driver's
  * hash-compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way FK star join + exact-integer aggregation (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap((Relational.queries ++ Extraction.queries ++
             Documents.queries ++ Similarity.queries ++
             Events.queries ++ Analytics.queries ++ Ingest.queries ++
             Linkage.queries ++ Media.queries): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    ListMap((Relational.oracles ++ Extraction.oracles ++
             Documents.oracles ++ Similarity.oracles ++
             Events.oracles ++ Analytics.oracles ++ Ingest.oracles ++
             Linkage.oracles ++ Media.oracles): _*)
}
