package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Extract

/** Oracle-registered queries for the extraction library — SURVEY.md §2 rows
  * P1–P10 and F1–F4, the reference's raison d'être (turning scraped
  * composite strings into typed columns, `fighters_scraper.py:64-156`,
  * `fights_scraper.py:70-213`).
  *
  * The harness has no scraped-string tables, so each query SYNTHESIZES the
  * composite shapes of FIXTURES.md §A3 from harness integers/dates
  * (deterministically, keyed on the row key), parses them back with
  * [[Extract]], and the oracle checks the round trip by computing the
  * expected typed values directly from the source columns. Malformed
  * variants (`"TBD"`, `"--"`, `"N/A"`, `"(1 NC)"` tails) are injected on
  * fixed key residues so the parse-or-NULL path is exercised on every run.
  *
  * Scale: every expression here is a built-in `regexp_*`/`split`/`concat`
  * — whole-stage-codegen'd, zero UDFs, no shuffle except the final
  * determinism ORDER BY.
  */
object Extraction {

  private def k: Column = col("c_custkey")

  // ── q10: P3 record split, with "(1 NC)" tail + malformed rows ───────────
  /** Builds `"Record: W-L-D"` strings (tail `" (1 NC)"` on k%7==0, whole
    * string replaced by `"TBD"` on k%11==0) and parses them back —
    * `fighters_scraper.py:78-86` semantics with the §7.5 documented fix
    * (anchored regex instead of bare split, so the NC tail parses). */
  def recordParse(s: SparkSession, d: String): DataFrame = {
    val raw = when(k % 11 === 0, lit("TBD")).otherwise(
      concat(lit("Record: "),
        (k % 30).cast("string"), lit("-"),
        (k % 12).cast("string"), lit("-"),
        (k % 4).cast("string"),
        when(k % 7 === 0, lit(" (1 NC)")).otherwise(lit(""))))
    Tables.customer(s, d)
      .select(k.as("c_custkey"), raw.as("record_str"))
      .select(col("c_custkey"),
        Extract.recordWins(col("record_str")).as("wins"),
        Extract.recordLosses(col("record_str")).as("losses"),
        Extract.recordDraws(col("record_str")).as("draws"))
      .orderBy(col("c_custkey"))
  }
  val recordParseSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE CAST(c_custkey % 30 AS INT) END AS wins,
      |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE CAST(c_custkey % 12 AS INT) END AS losses,
      |  CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE CAST(c_custkey % 4 AS INT) END AS draws
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ── q11: "x of y" ratio → struct(landed, attempted) (P7/P8 shape) ───────
  /** Builds `"L of A"` stat strings from lineitem (the `"58 of 112"` shape
    * of `fights_scraper.py:156-166`), `"N/A"` on l_orderkey%5==0, parses
    * back landed/attempted and a basis-point accuracy. */
  def ratioParse(s: SparkSession, d: String): DataFrame = {
    val landed = floor(col("l_quantity")).cast("long")
    val attempted = landed + col("l_linenumber")
    val raw = when(col("l_orderkey") % 5 === 0, lit("N/A")).otherwise(
      concat(landed.cast("string"), lit(" of "), attempted.cast("string")))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), raw.as("ratio_str"))
      .select(col("l_orderkey"), col("l_linenumber"),
        Extract.ratioLanded(col("ratio_str")).cast("long").as("landed"),
        Extract.ratioAttempted(col("ratio_str")).cast("long").as("attempted"))
      .withColumn("acc_bp",
        (col("landed") * 10000L) / col("attempted") cast "long")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  val ratioParseSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_orderkey % 5 = 0 THEN NULL
      |       ELSE CAST(floor(l_quantity) AS BIGINT) END AS landed,
      |  CASE WHEN l_orderkey % 5 = 0 THEN NULL
      |       ELSE CAST(floor(l_quantity) AS BIGINT) + l_linenumber END AS attempted,
      |  CASE WHEN l_orderkey % 5 = 0 THEN NULL
      |       ELSE CAST(floor(CAST(floor(l_quantity) AS BIGINT) * 10000
      |            / (CAST(floor(l_quantity) AS BIGINT) + l_linenumber)) AS BIGINT) END AS acc_bp
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ── q12: height/weight/reach/percent/M:SS measurements ──────────────────
  /** All five measurement shapes of FIXTURES §A3 round-tripped in one
    * query; every string goes malformed (`"--"`) on k%13==0. */
  def measuresParse(s: SparkSession, d: String): DataFrame = {
    val bad = k % 13 === 0
    def orBad(c: Column): Column = when(bad, lit("--")).otherwise(c)
    val hIn  = lit(60) + (k % 18).cast("int")
    val wLbs = lit(115) + (k % 20).cast("int") * 5
    val rIn  = lit(60) + (k % 20).cast("int")
    val pct  = (k % 101).cast("int")
    val secs = (k % 3600).cast("int")
    val built = Tables.customer(s, d).select(
      k.as("c_custkey"),
      orBad(concat((hIn / 12).cast("int").cast("string"), lit("' "),
                   (hIn % 12).cast("string"), lit("\""))).as("height_str"),
      orBad(concat(wLbs.cast("string"), lit(" lbs."))).as("weight_str"),
      orBad(concat(rIn.cast("string"), lit("\""))).as("reach_str"),
      orBad(concat(pct.cast("string"), lit("%"))).as("pct_str"),
      orBad(concat((secs / 60).cast("int").cast("string"), lit(":"),
                   lpad((secs % 60).cast("string"), 2, "0"))).as("ctrl_str"))
    built.select(col("c_custkey"),
      Extract.heightToInches(col("height_str")).cast("int").as("height_in"),
      Extract.weightToLbs(col("weight_str")).as("weight_lbs"),
      Extract.reachToInches(col("reach_str")).cast("int").as("reach_in"),
      floor(Extract.percentToFraction(col("pct_str")) * 10000 + 0.5)
        .cast("long").as("acc_bp"),
      Extract.mmssToSeconds(col("ctrl_str")).as("ctrl_sec"))
      .orderBy(col("c_custkey"))
  }
  val measuresParseSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE CAST(60 + c_custkey % 18 AS INT) END AS height_in,
      |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE CAST(115 + (c_custkey % 20) * 5 AS INT) END AS weight_lbs,
      |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE CAST(60 + c_custkey % 20 AS INT) END AS reach_in,
      |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE CAST(floor(CAST(c_custkey % 101 AS INT)/100.0*10000 + 0.5) AS BIGINT) END AS acc_bp,
      |  CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE CAST(c_custkey % 3600 AS INT) END AS ctrl_sec
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ── q13: F4 date parse-or-NULL, reference format "%b. %d, %Y" ───────────
  /** Formats o_orderdate as `"Jul. 19, 1987"`-shaped strings (`"TBD"` on
    * o_orderkey%13==0) and parses back with [[Extract.parseRefDate]] — the
    * try/except-continue of `fighters_scraper.py:122-127`. */
  def dateParse(s: SparkSession, d: String): DataFrame = {
    val raw = when(col("o_orderkey") % 13 === 0, lit("TBD"))
      .otherwise(date_format(col("o_orderdate"), "MMM. d, yyyy"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), raw.as("date_str"))
      .select(col("o_orderkey"),
        date_format(Extract.parseRefDate(col("date_str")), "yyyy-MM-dd")
          .as("parsed_date"))
      .orderBy(col("o_orderkey"))
  }
  val dateParseSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS parsed_date
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ── q14: P4/P5 label-scan extraction over "Label: value; ..." blobs ─────
  /** Builds the labeled-meta blob shape of `fights_scraper.py:88-105` /
    * `extract_info` (`fighters_scraper.py:89-93`) and extracts fields two
    * ways: anchored regex ([[Extract.labelValue]]) and parse-once-to-map
    * ([[Extract.labelsToMap]] + element_at). `"N/A"` values null out. */
  def labelExtract(s: SparkSession, d: String): DataFrame = {
    val balCents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
    val blob = concat(
      lit("Segment: "), col("c_mktsegment"),
      lit("; Nation: "), col("c_nationkey").cast("string"),
      lit("; Balance: "),
      when(col("c_acctbal") < 0, lit("N/A")).otherwise(balCents.cast("string")))
    Tables.customer(s, d)
      .select(k.as("c_custkey"), blob.as("blob"))
      .select(col("c_custkey"),
        Extract.labelValue(col("blob"), "Segment").as("segment"),
        element_at(Extract.labelsToMap(col("blob")), "Nation")
          .cast("int").as("nation_key"),
        Extract.labelValue(col("blob"), "Balance")
          .cast("long").as("balance_cents"))
      .orderBy(col("c_custkey"))
  }
  val labelExtractSql: String =
    """SELECT c_custkey, c_mktsegment AS segment,
      |  c_nationkey AS nation_key,
      |  CASE WHEN c_acctbal < 0 THEN NULL
      |       ELSE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) END AS balance_cents
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ── q15: P6 wide pivot — attribute rows → wide columns ──────────────────
  /** The `parse_fight_table` header-zip pivot (`fights_scraper.py:109-139`)
    * as SQL: tall (orderkey, returnflag, qty) rows pivot to one wide row
    * per order with a column per flag. Spark's `pivot` with EXPLICIT values
    * — never the value-discovering overload, which runs an extra
    * distinct-collect job over the full fact table at scale. */
  def pivotWide(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(floor(col("l_quantity")).cast("long")))
      .select(col("l_orderkey"),
        coalesce(col("A"), lit(0L)).as("qty_a"),
        coalesce(col("N"), lit(0L)).as("qty_n"),
        coalesce(col("R"), lit(0L)).as("qty_r"))
      .orderBy(col("l_orderkey"))
  val pivotWideSql: String =
    """SELECT l_orderkey,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='A' THEN CAST(floor(l_quantity) AS BIGINT) END), 0) AS BIGINT) AS qty_a,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='N' THEN CAST(floor(l_quantity) AS BIGINT) END), 0) AS BIGINT) AS qty_n,
      |  CAST(COALESCE(sum(CASE WHEN l_returnflag='R' THEN CAST(floor(l_quantity) AS BIGINT) END), 0) AS BIGINT) AS qty_r
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  // ── q16: F1 containment + F2 null drop + F3 arity guard ─────────────────
  /** The reference's three filter idioms in one query over documents:
    * substring containment (`"fighter-details" in href`), null drop, and
    * the `len(fighters) >= 2` arity guard, plus guarded element_at — all
    * pushdown-friendly predicates. */
  def arityFilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull && col("text").contains("spark"))
      // ONE regex split per row: derive every consumer (arity guard + the
      // three output columns) from the single projected `words` attribute,
      // and filter on the DERIVED n_words. The former shape (filter on
      // size(words) between two projects) re-ran the split up to 4×/row
      // once predicate pushdown substituted the alias (r3 VERDICT "What's
      // wrong" #2); PlanSpec pins the split count at ≤2 evaluations.
      .select(col("doc_id"), split(col("text"), "\\s+").as("words"))
      .select(col("doc_id"),
        size(col("words")).as("n_words"),
        element_at(col("words"), 1).as("w1"),
        element_at(col("words"), 2).as("w2"))
      .filter(col("n_words") >= 40)
      .orderBy(col("doc_id"))
  val arityFilterSql: String =
    """SELECT doc_id, CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_words,
      |  string_split_regex(text, '\s+')[1] AS w1,
      |  string_split_regex(text, '\s+')[2] AS w2
      |FROM documents
      |WHERE text IS NOT NULL AND position('spark' IN text) > 0
      |  AND len(string_split_regex(text, '\s+')) >= 40
      |ORDER BY doc_id""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q10_record_parse"   -> (recordParse _),
    "q11_ratio_parse"    -> (ratioParse _),
    "q12_measures_parse" -> (measuresParse _),
    "q13_date_parse"     -> (dateParse _),
    "q14_label_extract"  -> (labelExtract _),
    "q15_pivot_wide"     -> (pivotWide _),
    "q16_arity_filter"   -> (arityFilter _))

  val oracles: Seq[(String, String)] = Seq(
    "q10_record_parse"   -> recordParseSql,
    "q11_ratio_parse"    -> ratioParseSql,
    "q12_measures_parse" -> measuresParseSql,
    "q13_date_parse"     -> dateParseSql,
    "q14_label_extract"  -> labelExtractSql,
    "q15_pivot_wide"     -> pivotWideSql,
    "q16_arity_filter"   -> arityFilterSql)
}
