package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Merge

/** The reference's E1 ingestion pipeline (SURVEY §3) end-to-end over the
  * DSv2 [[graft.sources.FrontierSource]]: partitioned listing scan (S2) →
  * skip-not-fail fetch (S1) → link expansion (S4) → containment filter
  * (F1) → distinct frontier (D1) → anti-join incremental skip (J1).
  *
  * The source is deterministic (the harness is network-free), so the DuckDB
  * oracle reproduces the generator arithmetically and the WHOLE pipeline —
  * source, pruning, filter, dedup, anti-join — is hash-verified.
  */
object Ingest {

  /** The shared frontier pipeline over either enumeration mode: containment
    * filter → distinct → anti-join against the "already scraped" set →
    * per-page counts. */
  private def newLinksPerPage(listing: DataFrame): DataFrame = {
    val links = listing
      .filter(col("url").contains("fighter-details")) // F1
      .select(col("page"), col("url")).distinct()     // D1
    val existing = listing.filter(col("ord") === 0)   // S5 stand-in
      .select(col("url"))
    Merge.incrementalSkip(links, existing, "url")     // J1
      .groupBy(col("page")).agg(count(lit(1)).as("n_new"))
      .orderBy(col("page"))
  }

  /** q33: per-letter count of new (not-yet-scraped) detail links.
    * "Existing sink" = the ord==0 link of every page, so the anti-join has
    * real work on every partition. */
  def frontierScan(s: SparkSession, d: String): DataFrame =
    newLinksPerPage(s.read.format("graft.sources.FrontierSource")
      .option("mode", "letters").load())
  /** Oracle re-derives the generator: page i∈[0,26) fails fetch when
    * i%7==3, else yields 3+i%5 detail links of which ord 0 is "existing". */
  val frontierScanSql: String =
    """SELECT chr(97 + CAST(i AS INT)) AS page, CAST(2 + i % 5 AS BIGINT) AS n_new
      |FROM range(26) t(i) WHERE i % 7 <> 3
      |ORDER BY page""".stripMargin

  /** q55: the numbered-pages enumeration (S3 — the fights scraper's
    * `get_event_links(pages=N)`) through the identical downstream pipeline.
    * 12 pages so the skip-not-fail path triggers (page indexes 3 and 10
    * exhaust their retries and yield zero rows, not a failed scan). */
  def frontierScanPages(s: SparkSession, d: String): DataFrame =
    newLinksPerPage(s.read.format("graft.sources.FrontierSource")
      .option("mode", "pages").option("pages", "12").load())
  /** Same generator arithmetic, numbered keys; pages sort as STRINGS
    * ('1' < '10' < '2'), matching the engine's string `page` column. */
  val frontierScanPagesSql: String =
    """SELECT CAST(i + 1 AS VARCHAR) AS page, CAST(2 + i % 5 AS BIGINT) AS n_new
      |FROM range(12) t(i) WHERE i % 7 <> 3
      |ORDER BY page""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q33_frontier_scan" -> (frontierScan _),
    "q55_frontier_pages" -> (frontierScanPages _))

  val oracles: Seq[(String, String)] = Seq(
    "q33_frontier_scan" -> frontierScanSql,
    "q55_frontier_pages" -> frontierScanPagesSql)
}
