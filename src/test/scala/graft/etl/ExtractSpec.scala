package graft.etl

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Edge-case specs for the composite-string parsers (SURVEY §5 item 2):
  * the malformed shapes the reference meets in the wild — `"(1 NC)"` record
  * tails, `"TBD"` dates, `"--"` control times, `"N/A"` sentinels — must all
  * parse to NULL or the documented fixed value, never throw. */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): Option[T] =
    Seq(input).toDF("s").select(c.as("r"))
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[T])).head

  test("record parse: clean, NC-tail, and malformed") {
    assert(one[Int](Extract.recordWins(col("s")), "Record: 22-3-1") === Some(22))
    assert(one[Int](Extract.recordLosses(col("s")), "Record: 22-3-1") === Some(3))
    assert(one[Int](Extract.recordDraws(col("s")), "Record: 22-3-1") === Some(1))
    // "(1 NC)" tail: reference's bare split breaks; our anchored regex parses
    assert(one[Int](Extract.recordDraws(col("s")), "Record: 20-5-1 (1 NC)") === Some(1))
    assert(one[Int](Extract.recordWins(col("s")), "TBD") === None)
    assert(one[Int](Extract.recordWins(col("s")), "") === None)
  }

  test("ratio parse: clean and N/A") {
    assert(one[Int](Extract.ratioLanded(col("s")), "58 of 112") === Some(58))
    assert(one[Int](Extract.ratioAttempted(col("s")), "58 of 112") === Some(112))
    assert(one[Int](Extract.ratioLanded(col("s")), "N/A") === None)
    assert(one[Int](Extract.ratioLanded(col("s")), "58 of") === None)
  }

  test("measurements: height/weight/reach/percent/ctrl") {
    assert(one[Int](Extract.heightToInches(col("s")), "5' 11\"") === Some(71))
    assert(one[Int](Extract.weightToLbs(col("s")), "155 lbs.") === Some(155))
    assert(one[Double](Extract.reachToInches(col("s")), "72\"") === Some(72.0))
    assert(one[Double](Extract.percentToFraction(col("s")), "48%") === Some(0.48))
    assert(one[Int](Extract.mmssToSeconds(col("s")), "2:31") === Some(151))
    for (bad <- Seq("--", "---", "N/A", ""))
      assert(one[Int](Extract.mmssToSeconds(col("s")), bad) === None, s"input '$bad'")
  }

  test("date parse-or-null: reference format %b. %d, %Y") {
    assert(one[java.sql.Date](Extract.parseRefDate(col("s")), "Jul. 19, 1987")
      === Some(java.sql.Date.valueOf("1987-07-19")))
    assert(one[java.sql.Date](Extract.parseRefDate(col("s")), "TBD") === None)
    assert(one[java.sql.Date](Extract.parseRefDate(col("s")), "1987-07-19") === None)
  }

  test("extractFirst/extractAll: selector-style single and list extraction") {
    val markup = "<a href='/f/1'>Jon</a> <a href='/f/2'>Amanda</a>"
    assert(one[String](
      Extract.extractFirst(col("s"), "<a[^>]*>([^<]*)</a>"), markup)
      === Some("Jon"))
    assert(one[String](
      Extract.extractFirst(col("s"), "<b>([^<]*)</b>"), markup) === None)
    val all = Seq(markup).toDF("s")
      .select(Extract.extractAll(col("s"), "<a[^>]*>([^<]*)</a>").as("r"))
      .as[Seq[String]].collect().head
    assert(all === Seq("Jon", "Amanda"))
  }

  test("ratioStruct bundles landed/attempted as one struct") {
    val r = Seq("58 of 112").toDF("s")
      .select(Extract.ratioStruct(col("s")).as("r"))
      .select(col("r.landed"), col("r.attempted"))
      .as[(Int, Int)].collect().head
    assert(r === ((58, 112)))
  }

  test("label extraction: hit, miss, and N/A value") {
    val blob = "Segment: GOLD; Nation: 7; Balance: N/A"
    assert(one[String](Extract.labelValue(col("s"), "Segment"), blob) === Some("GOLD"))
    assert(one[String](Extract.labelValue(col("s"), "Balance"), blob) === None)
    assert(one[String](Extract.labelValue(col("s"), "Missing"), blob) === None)
  }

  test("property: parse(format(x)) == x for records, ratios, and times") {
    // SURVEY §5 item 3 — round-trip identity over generated values
    for (seed <- 0 until 50) {
      val w = seed * 7 % 100; val l = seed * 3 % 50; val dr = seed % 4
      assert(one[Int](Extract.recordWins(col("s")), s"Record: $w-$l-$dr")
        === Some(w), s"wins $seed")
      assert(one[Int](Extract.recordLosses(col("s")), s"Record: $w-$l-$dr")
        === Some(l), s"losses $seed")
      val landed = seed % 120; val att = landed + seed % 30
      assert(one[Int](Extract.ratioLanded(col("s")), s"$landed of $att")
        === Some(landed), s"ratio $seed")
      val sec = seed * 97 % 3600
      assert(one[Int](Extract.mmssToSeconds(col("s")),
        f"${sec / 60}:${sec % 60}%02d") === Some(sec), s"mmss $seed")
    }
  }

  test("nullifyNA: both reference null conventions normalize") {
    for (bad <- Seq("N/A", "--", "---", "", "  "))
      assert(one[String](Extract.nullifyNA(col("s")), bad) === None, s"input '$bad'")
    assert(one[String](Extract.nullifyNA(col("s")), " x ") === Some("x"))
  }
}
