package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Boundary contract of the q69 decontamination scan: containment is
  * decided by EXACT word-8-gram windows — an 8-word verbatim copy from a
  * benchmark doc flags the copier, a 7-word copy does not, and whole-
  * document similarity plays no role (the contaminated doc here has
  * Jaccard ~ 0.3 against its benchmark source — far below every near-dup
  * threshold in this repo, yet flagged; that asymmetry is the entire
  * reason q69 exists next to q18/q68). */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100: ten words → three distinct 8-gram windows
  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  // doc 200 embeds words 1-8 of the bench doc verbatim inside fresh text
  private val hitText =
    "one two three alpha beta gamma delta epsilon zeta eta theta four five"
  // doc 300 embeds only words 1-7 — longest shared window is 7 < 8
  private val missText =
    "one two three alpha beta gamma delta epsilon zeta eta four five six"

  private def run() = {
    val docs = Seq(
      (100L, benchText), (200L, hitText), (300L, missText))
      .toDF("doc_id", "text")
    Documents.decontamScan(docs, col("doc_id") === 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("8-gram verbatim window flags; 7-gram window does not") {
    // bench doc self-hits all 3 of its windows; doc 200 trips exactly one
    // (windows 2 and 3 of the bench doc are broken by its fresh tail);
    // doc 300 is absent
    assert(run() == Seq((100L, 3L, 1L), (200L, 1L, 1L)))
  }
}
