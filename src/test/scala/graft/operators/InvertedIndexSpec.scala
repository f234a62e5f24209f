package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}
import graft.etl.Merge

/** Lifecycle contract of the q99 posting index (the q82 maintenance story
  * applied to text retrieval): an append-maintained index answers probes
  * identically to a from-scratch build, a replayed append is absorbed by
  * the probe's duplicate collapse, and compaction shrinks the file
  * population without changing a single probe row. */
class InvertedIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("hash", "join", "scan")

  private def rows(df: DataFrame): Seq[(Long, Long)] = {
    import spark.implicits._
    df.as[(Long, Long)].collect().toSeq.sorted
  }

  test("append-maintained postings: probe == from-scratch; replayed append " +
       "absorbs; compaction shrinks files, changes nothing") {
    val docs = Tables.documents(spark, sfDir)
    val standing = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-postings").toString + "/idx"

    Merge.writeAndSwap(Documents.postings(standing), path, "build")
    Documents.appendPostings(path, batch)
    Documents.appendPostings(path, batch) // replayed append: duplicates only

    val expect = rows(Documents.searchIndex(
      Documents.postings(docs), terms, 1000))
    assert(expect.nonEmpty, "probe terms missing from the corpus")
    assert(rows(Documents.searchIndex(
      spark.read.parquet(path), terms, 1000)) === expect,
      "appended index probe != from-scratch probe")

    val (before, after) = Merge.compact(spark, path, "term")
    assert(after < before,
      s"compaction did not shrink the file population ($before -> $after)")
    assert(rows(Documents.searchIndex(
      spark.read.parquet(path), terms, 1000)) === expect,
      "compaction changed probe results")
  }
}
