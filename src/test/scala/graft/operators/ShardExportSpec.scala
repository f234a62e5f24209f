package graft.operators

import graft.SparkSpec

/** Contract of the q139 distributed global cumsum + shard manifest: the
  * two-pass parallel scan must equal the declarative single-window cumsum
  * (the form the DuckDB oracle runs) for EVERY partitioning — the range
  * boundaries and partition count are execution detail, never semantics —
  * and the contiguous-packing shard rule must place the straddling doc in
  * the shard where its START offset lands. */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def cumsumMap(rows: Seq[(Long, Long, Long)],
                        parts: Option[Int]): Map[Long, Long] =
    Documents.globalCumsum(rows.toDF("doc_id", "h", "n_tokens"), parts)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap

  private def expectedCumsum(rows: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    var run = 0L
    rows.sortBy(r => (r._2, r._1)).map { case (id, _, n) =>
      run += n; id -> run
    }.toMap
  }

  test("globalCumsum == the single-window cumsum, for partition counts " +
       "1/3/8 and the default — boundaries are execution detail") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 200L).map(i =>
      (i, rnd.nextLong().abs % 50L, rnd.nextInt(100).toLong + 1L))
    val want = expectedCumsum(rows)
    for (p <- Seq(Some(1), Some(3), Some(8), None))
      assert(cumsumMap(rows, p) === want, s"numParts=$p diverged")
  }

  test("ties in h are broken by doc_id — the total order is tie-free") {
    // all rows share one h: cum must follow doc_id order exactly
    val rows = Seq((30L, 7L, 5L), (10L, 7L, 1L), (20L, 7L, 2L))
    assert(cumsumMap(rows, Some(2)) ===
      Map(10L -> 1L, 20L -> 3L, 30L -> 8L))
  }

  test("empty input yields an empty cumsum and an empty manifest") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_id", "h", "n_tokens")
    assert(Documents.globalCumsum(empty, Some(3)).count() === 0L)
    assert(Documents.shardManifest(empty, Some(3)).count() === 0L)
  }

  test("shard rule: a doc belongs to the shard where its start offset " +
       "lands — hand-computed manifest incl. a straddling doc") {
    // budget 4096; h = position, doc_id distinct:
    //   doc 1: start 0     (shard 0)
    //   doc 2: start 3000  (shard 0 — straddles into shard 1's range)
    //   doc 3: start 5000  (shard 1, exactly budget-sized)
    //   doc 4: start 9096  (shard 2)
    val rows = Seq((1L, 1L, 3000L), (2L, 2L, 2000L),
                   (3L, 3L, 4096L), (4L, 4L, 100L))
      .toDF("doc_id", "h", "n_tokens")
    val out = Documents.shardManifest(rows, Some(2))
      .select("shard", "n_docs", "sum_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L, 5000L), (1L, 1L, 4096L), (2L, 1L, 100L)))
    // conservation law (r19): every row carries corpus totals from BOTH
    // sides of the assignment, and they must agree — Σ shard docs =
    // corpus docs, last cum = corpus tokens
    val cons = Documents.shardManifest(rows, Some(2))
      .select("corpus_docs", "corpus_tokens", "docs_accounted",
        "tokens_accounted")
      .as[(Long, Long, Long, Long)].collect().toSeq.distinct
    assert(cons === Seq((4L, 9196L, 4L, 9196L)),
      s"conservation columns wrong: $cons")
  }

  test("manifest is invariant to the partition count (the q139 gate's " +
       "shape, re-proven off-harness)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextLong().abs % 1000L, rnd.nextInt(900).toLong + 100L))
      .toDF("doc_id", "h", "n_tokens")
    val a = Documents.shardManifest(rows, Some(1)).collect().toSeq
    val b = Documents.shardManifest(rows, Some(8)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
