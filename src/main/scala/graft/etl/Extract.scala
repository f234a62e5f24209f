package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-row scalar extraction library — SURVEY.md §2 rows P1–P10 / F4.
  *
  * The reference performs these extractions imperatively per scraped page
  * (`scrapers/fighters_scraper.py:64-156`, `scrapers/fights_scraper.py:70-213`).
  * Here each one is a pure `Column → Column` function built ONLY from
  * `org.apache.spark.sql.functions._` — every function below stays inside
  * whole-stage codegen (no UDFs), so at 100 TB these run as tight generated
  * loops over Parquet column batches with nothing materialized per row.
  *
  * Null convention: the reference mixes Python `None` (fighters) and the
  * literal `"N/A"` (fights) — SURVEY.md §1.2. [[nullifyNA]] normalizes both
  * to SQL NULL at ingest; all parsers return NULL on malformed input
  * (replicating the skip-not-fail stance of `fighters_scraper.py:122-127`).
  */
object Extract {

  /** `"N/A"`, `"--"`, `"---"`, `""` → NULL (SURVEY §1.2 two-sentinel fix). */
  def nullifyNA(c: Column): Column =
    when(trim(c).isin("N/A", "--", "---", ""), lit(null)).otherwise(trim(c))

  // ── P1/P2: selector-style text extraction over a raw markup column ──────

  /** First regex group match, else NULL (P1: CSS-select single text,
    * `fighters_scraper.py:71-75`). Empty match → NULL, mirroring the
    * reference's `if el else None`. */
  def extractFirst(c: Column, pattern: String): Column =
    nullifyNA(regexp_extract(c, pattern, 1))

  /** All regex group matches as an array (P2: CSS-select text list,
    * `fights_scraper.py:82-83`). */
  def extractAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(1))

  // ── P3: record string "Record: 22-3-1 (1 NC)" → (wins, losses, draws) ──

  /** Wins from a record string; NULL when absent. Uses anchored regex rather
    * than the reference's bare `split("-")` so the `"(1 NC)"` tail case
    * (`fighters_scraper.py:78-86`, FIXTURES.md §A3) parses cleanly —
    * divergence-by-fix documented in SURVEY §7.5. */
  private def recPart(c: Column, group: Int): Column = {
    val m = regexp_extract(c, """Record:\s*(\d+)-(\d+)-(\d+)""", group)
    when(m === "", lit(null)).otherwise(m.cast("int"))
  }
  def recordWins(c: Column): Column   = recPart(c, 1)
  def recordLosses(c: Column): Column = recPart(c, 2)
  def recordDraws(c: Column): Column  = recPart(c, 3)

  // ── Ratio "58 of 112" → struct(landed, attempted) ───────────────────────

  def ratioLanded(c: Column): Column = {
    val m = regexp_extract(c, """^\s*(\d+)\s+of\s+(\d+)\s*$""", 1)
    when(m === "", lit(null)).otherwise(m.cast("int"))
  }
  def ratioAttempted(c: Column): Column = {
    val m = regexp_extract(c, """^\s*(\d+)\s+of\s+(\d+)\s*$""", 2)
    when(m === "", lit(null)).otherwise(m.cast("int"))
  }
  /** `"58 of 112"` → `struct(landed int, attempted int)` (FIXTURES §A2). */
  def ratioStruct(c: Column): Column =
    struct(ratioLanded(c).as("landed"), ratioAttempted(c).as("attempted"))

  // ── Percent / measurements ───────────────────────────────────────────────

  /** `"48%"` → 0.48; `"---"`/garbage → NULL. */
  def percentToFraction(c: Column): Column = {
    val m = regexp_extract(c, """^\s*(\d+(?:\.\d+)?)%\s*$""", 1)
    when(m === "", lit(null)).otherwise(m.cast("double") / 100.0)
  }

  /** `5' 11"` → total inches (71); malformed → NULL. */
  def heightToInches(c: Column): Column = {
    val ft = regexp_extract(c, """^\s*(\d+)'\s*(\d+)"\s*$""", 1)
    val in = regexp_extract(c, """^\s*(\d+)'\s*(\d+)"\s*$""", 2)
    when(ft === "", lit(null)).otherwise(ft.cast("int") * 12 + in.cast("int"))
  }

  /** `"155 lbs."` → 155; malformed → NULL. */
  def weightToLbs(c: Column): Column = {
    val m = regexp_extract(c, """^\s*(\d+)\s*lbs\.?\s*$""", 1)
    when(m === "", lit(null)).otherwise(m.cast("int"))
  }

  /** `72"` → 72 inches; malformed → NULL. */
  def reachToInches(c: Column): Column = {
    val m = regexp_extract(c, """^\s*(\d+(?:\.\d+)?)"\s*$""", 1)
    when(m === "", lit(null)).otherwise(m.cast("double"))
  }

  /** Control/fight time `"2:31"` (M:SS) → seconds (151); `"--"` → NULL
    * (`fights_scraper.py:162-163`). */
  def mmssToSeconds(c: Column): Column = {
    val mm = regexp_extract(c, """^\s*(\d+):(\d{2})\s*$""", 1)
    val ss = regexp_extract(c, """^\s*(\d+):(\d{2})\s*$""", 2)
    when(mm === "", lit(null)).otherwise(mm.cast("int") * 60 + ss.cast("int"))
  }

  // ── F4: date parse-or-null, reference format "%b. %d, %Y" ────────────────

  /** `"Jul. 19, 1987"` → DATE; unparseable (`"TBD"`) → NULL — the exact
    * try/except-continue semantics of `fighters_scraper.py:122-127`. */
  def parseRefDate(c: Column): Column = try_to_date(c, "MMM. d, yyyy")

  // ── P4/P5: label-scan field extraction ──────────────────────────────────

  /** `extract_info(label)` (`fighters_scraper.py:89-93`): from a blob of
    * `"Label: value"` lines, value for `label`, else NULL. */
  def labelValue(c: Column, label: String): Column = {
    val quoted = java.util.regex.Pattern.quote(label)
    nullifyNA(regexp_extract(c, quoted + """\s*:\s*([^\n;]*)""", 1))
  }

  /** Parse a whole `"k1: v1; k2: v2"` blob to a map once, then project with
    * `element_at` — the map-typed alternative for many-label extraction. */
  def labelsToMap(c: Column): Column =
    str_to_map(c, lit(";\\s*"), lit(":\\s*"))

  // ── A2: active-status derivation with a FIXED as-of date ────────────────

  /** `Active` iff last activity within 730 days of `asOf` else `Inactive`
    * (`fighters_scraper.py:117-133`); `datetime.now()` is parameterized to a
    * literal for determinism (SURVEY §7.5). NULL last-date → Inactive,
    * mirroring the reference's no-dates default. */
  def activeFlag(lastDate: Column, asOf: String): Column =
    when(lastDate.isNotNull &&
         datediff(to_date(lit(asOf)), lastDate) <= 730, "Active")
      .otherwise("Inactive")
}
