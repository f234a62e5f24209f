package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Extract, Merge}

/** The reference's complete ingestion lifecycle (SURVEY §3 E1/E3) as ONE
  * composed library call — the "switch from the reference" story end to
  * end: frontier scan → incremental skip → detail 'fetch' → composite
  * extraction → first-wins merge into the sink → derived analytics.
  *
  * The network fetch is a deterministic generator (harness is
  * network-free): each frontier URL yields a raw "profile page" of
  * composite strings shaped like the scraped fields (record, height,
  * weight, date — FIXTURES §A3), which the [[Extract]] parsers then type.
  * Swap the generator for a real fetcher (with retry inside the partition,
  * as [[graft.sources.FrontierSource]] documents) and nothing downstream
  * changes.
  *
  * Every pass is idempotent: rerunning [[runIncrementalPass]] against the
  * same sink adds nothing (E3 — the reference's core invariant, asserted
  * in PipelineSpec).
  */
object Pipeline {

  /** Frontier of detail links not yet in the sink (S2→F1→D1→J1). */
  def newFrontier(s: SparkSession, sink: DataFrame): DataFrame = {
    val listing = s.read.format("graft.sources.FrontierSource")
      .option("mode", "letters").load()
    val links = listing
      .filter(col("url").contains("fighter-details"))
      .select(col("page"), col("url"), col("ord")).distinct()
    Merge.incrementalSkip(links, sink.select(col("url")), "url")
  }

  /** Deterministic stand-in for the detail-page fetch+parse: builds the
    * raw composite strings the reference scrapes (P-rows' inputs). */
  def fetchDetails(frontier: DataFrame): DataFrame = {
    val k = xxhash64(col("url"))
    frontier.select(
      col("url"),
      concat(lit("Record: "), pmod(k, lit(30)).cast("string"), lit("-"),
        pmod(k, lit(12)).cast("string"), lit("-"),
        pmod(k, lit(4)).cast("string")).as("record_raw"),
      concat((lit(60) + pmod(k, lit(18)) / 12).cast("int").cast("string"),
        lit("' "), pmod(lit(60) + pmod(k, lit(18)), lit(12)).cast("string"),
        lit("\"")).as("height_raw"),
      when(pmod(k, lit(7)) === 0, lit("--"))
        .otherwise(concat((lit(115) + pmod(k, lit(20)) * 5).cast("string"),
          lit(" lbs."))).as("weight_raw"),
      date_format(
        date_add(lit("1990-01-01").cast("date"), pmod(k, lit(9000)).cast("int")),
        "MMM. d, yyyy").as("last_fight_raw"))
  }

  /** Typed extraction of the scraped composites (P3/P4/F4 parsers). */
  def extractTyped(details: DataFrame): DataFrame =
    details.select(
      col("url"),
      Extract.recordWins(col("record_raw")).as("wins"),
      Extract.recordLosses(col("record_raw")).as("losses"),
      Extract.recordDraws(col("record_raw")).as("draws"),
      Extract.heightToInches(col("height_raw")).cast("int").as("height_in"),
      Extract.weightToLbs(col("weight_raw")).as("weight_lbs"),
      Extract.parseRefDate(col("last_fight_raw")).as("last_fight_date"))

  /** One full incremental pass: returns the NEW sink contents (caller
    * persists — keeping I/O at the edge makes the pass testable). */
  def runIncrementalPass(s: SparkSession, sink: DataFrame): DataFrame = {
    val typed = extractTyped(fetchDetails(newFrontier(s, sink)))
    Merge.firstWinsMerge(sink, typed, "url")
  }

  /** Downstream analytics over the sink: the reference's active-status
    * derivation (A1/A2) per record bucket. */
  def activeSummary(sink: DataFrame, asOf: String): DataFrame =
    sink.withColumn("status",
        Extract.activeFlag(col("last_fight_date"), asOf))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
           sum(col("wins").cast("long")).as("total_wins"))
      .orderBy(col("status"))

  /** Empty sink with the pipeline's schema (first run). */
  def emptySink(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("url", StringType),
        StructField("wins", IntegerType),
        StructField("losses", IntegerType),
        StructField("draws", IntegerType),
        StructField("height_in", IntegerType),
        StructField("weight_lbs", IntegerType),
        StructField("last_fight_date", DateType))))
  }
}
