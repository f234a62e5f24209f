package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (line-delimited JSON) parity — the interchange format training
  * corpora ship in: schema-explicit write → read round-trip over the
  * documents table's shape, including the characters that break naive
  * line-oriented handling (embedded newlines, quotes, unicode, nulls). */
class JsonlRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft-jsonl").toString + "/t"

  test("jsonl write → schema-explicit read round-trips hostile strings") {
    val path = tmp()
    val rows = Seq(
      (1L, "en", "plain text"),
      (2L, "en", "embedded \"quotes\" and \\ backslash"),
      (3L, "de", "newline\ninside and tab\tinside"),
      (4L, "fr", "unicode: déjà vu — ünïcødé ✓"),
      (5L, null.asInstanceOf[String], null.asInstanceOf[String]))
    Tables.writeJsonl(rows.toDF("doc_id", "lang", "text"), path)
    val back = Tables.loadJsonl(spark, path, schema)
      .as[(Long, Option[String], Option[String])].collect().sortBy(_._1)
    val want = rows.map { case (id, l, t) => (id, Option(l), Option(t)) }
    assert(back.toSeq === want)
  }

  test("documents round-trips through jsonl unchanged at sf0.001") {
    val path = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    Tables.writeJsonl(docs, path)
    val back = Tables.loadJsonl(spark, path, schema)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0, "jsonl altered a document")
    assert(docs.exceptAll(back).count() === 0, "jsonl lost a document")
  }

  test("malformed lines FAILFAST instead of nulling a shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      "{\"doc_id\":1,\"lang\":\"en\",\"text\":\"ok\"}\nnot json at all\n"
        .getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      Tables.loadJsonl(spark, dir.toString, schema).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
