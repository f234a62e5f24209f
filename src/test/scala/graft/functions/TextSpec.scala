package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the text/dedup kernels: the short-doc shingle guard (Spark's
  * `sequence(1, 0)` goes DESCENDING — regression for the fixed bug),
  * signature shape invariants, and the Jaccard↔MinHash agreement that
  * underwrites the LSH query. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def df(texts: String*) = texts.toDF("text")
    .select(col("text"), Text.toWords(col("text")).as("w"))

  test("shingles: short docs yield empty sets, not errors") {
    val out = df("one two", "one", "", "a b c d")
      .select(Text.shingles(col("w"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
    assert(out(3) === Seq("a b c", "b c d"))
  }

  test("shingles are distinct sets") {
    val out = df("x y x y x y x y")
      .select(Text.shingles(col("w"), 3).as("s")).as[Seq[String]].collect()
    assert(out.head.sorted === Seq("x y x", "y x y"))
  }

  test("minhash signature: width k, values in [0, P)") {
    val sig = df("the quick brown fox jumps over the lazy dog")
      .select(Text.minhashSignature(Text.shingles(col("w"), 3), 16).as("sig"))
      .as[Seq[Long]].collect().head
    assert(sig.length === 16)
    assert(sig.forall(v => v >= 0 && v < Text.MinhashP))
  }

  test("identical docs share all bands; disjoint docs share none") {
    val d = df("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")
      .select(Text.lshBands(
        Text.minhashSignature(Text.shingles(col("w"), 3), 16), 4, 4).as("b"))
      .as[Seq[(Int, Long)]].collect()
    assert(d(0) === d(1))
    assert(d(0).toSet.intersect(d(2).toSet) === Set.empty)
  }

  test("simhash60: in [0, 2^60); equal inputs equal outputs; bits flip on change") {
    val out = df("spark flink trino presto druid", "spark flink trino presto druid",
                 "entirely different words here now")
      .select(Text.simhash60(col("w")).as("h")).as[Long].collect()
    assert(out.forall(h => h >= 0 && h < (1L << 60)))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }

  test("simhashChunks: 4 disjoint 15-bit bands reassemble the signature") {
    val Row(h: Long, chunks: collection.Seq[_]) =
      df("alpha beta gamma delta epsilon zeta")
        .select(Text.simhash60(col("w")).as("h"),
                Text.simhashChunks(Text.simhash60(col("w"))).as("c"))
        .collect().head
    val parts = chunks.map { case Row(band: Int, bh: Long) => (band, bh) }
    assert(parts.map(_._1) === Seq(0, 1, 2, 3))
    val reassembled = parts.map { case (band, bh) => bh << (band * 15) }.sum
    assert(reassembled === h)
  }

  test("char-trigram lang-ID discriminates real multilingual sentences") {
    val samples = Seq(
      ("the cat sat on the mat and looked at the dog", "en"),
      ("der hund und die katze schlafen in einem schönen haus", "de"),
      ("le chien et le chat dorment dans la maison que nous aimons", "fr"),
      ("el perro y el gato duermen en la casa que los vecinos aman", "es"))
    val langs = Text.LangProfiles.map(_._1)
    val rows = samples.map(_._1).toDF("text")
      .select(Text.normText(col("text")).as("nt"))
      .select(Text.charTrigrams(col("nt")).as("tg"))
      .select(langs.map(l => Text.langHits(col("tg"), l).as(l)): _*)
      .collect()
    rows.zip(samples).foreach { case (r, (_, expected)) =>
      val scores = langs.map(l => l -> r.getAs[Int](l))
      val best = scores.maxBy(_._2)._1
      assert(best === expected, s"scores $scores for '$expected'")
    }
  }

  test("token counts: whitespace and bpe-ish") {
    val out = df("Hello, world! This is fine.")
      .select(Text.tokenCount(col("text")).as("t"),
              Text.punctCount(col("text")).as("p"),
              Text.bpeishTokenCount(col("text")).as("b"))
      .as[(Int, Int, Int)].collect().head
    assert(out === ((5, 3, 8)))
  }

  test("normText collapses case and whitespace (exact-dedup equivalence)") {
    val out = Seq("A  B\tC", "a b c", "  a b   c  ").toDF("text")
      .select(Text.normText(col("text")).as("n")).as[String].collect()
    assert(out.toSet === Set("a b c"))
  }
}
