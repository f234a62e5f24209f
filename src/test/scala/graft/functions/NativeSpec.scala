package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native kernels ([[Native]] / GraftExtensions) must agree exactly
  * with the higher-order-function reference implementations in [[Text]] —
  * same shingle sets, same simhash bits, same bucket-sharing behavior. */
class NativeSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "completely unrelated words appear in this line",
    "a b",  // shorter than one 3-gram
    "x y x y x y")  // repeated grams → distinct set

  private def df = texts.toDF("text")
    .select(col("text"), Text.toWords(col("text")).as("w"))

  test("native shingles == HOF shingles (as sets)") {
    val out = df.select(
        Native.shingles(col("w"), 3).as("a"),
        Text.shingles(col("w"), 3).as("b"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (a, b) => assert(a.toSet === b.toSet) }
    assert(out(3)._1 === Seq.empty)
  }

  test("native simhash60 == HOF simhash60") {
    val out = df.select(
        Native.simhash60(col("w")).as("a"),
        Text.simhash60(col("w")).as("b"))
      .as[(Long, Long)].collect()
    out.foreach { case (a, b) => assert(a === b) }
  }

  test("native simhash128_bands == independent md5 vote reconstruction") {
    // rebuild the signature from first principles: word k of each md5 is
    // hex chars [8k+1, 8k+8] big-endian, bit j of chunk k is the majority
    // vote of bit j across words — the documented oracle layout
    def reference(words: Seq[String]): Seq[(Int, Long)] = {
      val votes = Array.fill(128)(0)
      val md = java.security.MessageDigest.getInstance("MD5")
      words.foreach { w =>
        md.reset()
        val d = md.digest(w.getBytes("UTF-8"))
        for (k <- 0 until 4; p <- 0 until 32) {
          val hex = d.map("%02x".format(_)).mkString.substring(8 * k, 8 * k + 8)
          val word = java.lang.Long.parseLong(hex, 16)
          votes(32 * k + p) += (if (((word >> p) & 1L) == 1L) 1 else -1)
        }
      }
      (0 until 4).map { k =>
        k -> (0 until 32).foldLeft(0L) { (acc, p) =>
          if (votes(32 * k + p) >= 0) acc | (1L << p) else acc
        }
      }
    }
    val out = df.select(col("w"), Native.simhash128Bands(col("w")).as("b"))
      .as[(Seq[String], Seq[(Int, Long)])].collect()
    out.foreach { case (words, bands) =>
      assert(bands === reference(words), s"mismatch for $words")
    }
    // null elements are skipped, not poisoning (the simhash60 contract)
    val withNull = Seq(Seq(Some("alpha"), None, Some("beta")))
      .toDF("w").select(Native.simhash128Bands(col("w")).as("b"))
      .as[Seq[(Int, Long)]].collect()
    assert(withNull.head === reference(Seq("alpha", "beta")))
  }

  test("native minhash bands: near-identical docs share a band, unrelated don't") {
    val bands = df.select(
        Native.minhashBands(Native.shingles(col("w"), 3), 128, 32, 4).as("b"))
      .as[Seq[(Int, Long)]].collect()
    assert(bands.head.map(_._1) === (0 until 32))
    // rows 0 and 1 differ by one word → high Jaccard → some shared bucket
    assert(bands(0).toSet.intersect(bands(1).toSet).nonEmpty)
    // row 2 shares no shingles with row 0 → no shared bucket
    assert(bands(0).toSet.intersect(bands(2).toSet).isEmpty)
  }

  test("native char_ngrams == HOF charTrigrams, order included") {
    val strs = Seq(
      "the quick brown fox",
      "aaaa",            // repeated grams → distinct set, first-occurrence order
      "ab",              // shorter than one trigram → empty
      "",                // empty string
      "héllo wörld déjà" // multi-byte chars gram by character, not byte
    )
    val out = strs.toDF("s").select(
        Native.charTrigrams(col("s")).as("a"),
        Text.charTrigrams(col("s")).as("b"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (a, b) => assert(a === b) }
    assert(out(1)._1 === Seq("aaa"))
    assert(out(2)._1 === Seq.empty)
    // null input → null out on both surfaces
    val nulls = Seq(Option.empty[String]).toDF("s").select(
        Native.charTrigrams(col("s")).as("a"),
        Text.charTrigrams(col("s")).as("b"))
      .as[(Option[Seq[String]], Option[Seq[String]])].collect()
    assert(nulls.head._1 === None && nulls.head._2 === None)
  }

  test("native dot product == HOF sequential fold, bit-exact") {
    val vecs = Seq(
      (Seq(0.1, 0.2, 0.3, 0.7), Seq(0.4, 0.5, 0.6, 1.1)),
      (Seq(1e-9, 1e9, -3.7, 0.0), Seq(2.5, 1e-9, 1.1, 9.9)))
    val out = vecs.toDF("a", "b").select(
        Native.dotProduct(col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("h"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n)
        === java.lang.Double.doubleToLongBits(h))
    }
  }

  test("native jaccard_bp == array_intersect/array_union column form") {
    // random string-array pairs, duplicates and unicode included — the
    // kernel claims VALUE identity with the Column form on the whole
    // domain (it dedups internally; the built-ins dedup by construction)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "δδ", "e e", "", "f\tf", "longer token")
    def arr() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
    val cases = Seq.fill(200)((arr(), arr())) ++ Seq(
      (Seq("a"), Seq.empty[String]),               // empty one side → 0 bp
      (Seq("a", "bb"), Seq("bb", "a")),            // identical set → 10000
      (Seq("a", "a", "bb"), Seq("a")))             // duplicates in input
    val nonEmpty = cases.filter(c => c._1.nonEmpty || c._2.nonEmpty)
    val out = nonEmpty.toDF("a", "b").select(
        Native.jaccardBp(col("a"), col("b")).as("n"),
        floor(size(array_intersect(col("a"), col("b"))).cast("long") * lit(10000L)
          / size(array_union(col("a"), col("b"))).cast("long")).cast("long").as("h"))
      .as[(Option[Long], Option[Long])].collect()
    out.foreach { case (n, h) => assert(n === h) }
    assert(out(nonEmpty.length - 2)._1 === Some(10000L)) // identical sets
    // both-empty union: the kernel yields NULL where the ANSI-mode Column
    // form would raise DIVIDE_BY_ZERO — strictly gentler, never wrong
    val empt = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(Native.jaccardBp(col("a"), col("b")).as("n"))
      .as[Option[Long]].collect()
    assert(empt.head === None)
    // null ELEMENTS carry set identity like the built-ins do
    val nullCases: Seq[(Seq[Option[String]], Seq[Option[String]])] = Seq(
      (Seq(Some("a"), None), Seq(None)),              // null on both sides
      (Seq(Some("a"), None), Seq(Some("a"))),         // null on one side
      (Seq(None), Seq(None)))                         // null-only arrays
    val nout = nullCases.toDF("a", "b").select(
        Native.jaccardBp(col("a"), col("b")).as("n"),
        floor(size(array_intersect(col("a"), col("b"))).cast("long") * lit(10000L)
          / size(array_union(col("a"), col("b"))).cast("long")).cast("long").as("h"))
      .as[(Option[Long], Option[Long])].collect()
    nout.foreach { case (n, h) => assert(n === h) }
    assert(nout(0)._1 === Some(5000L)) // {a,null} ∩ {null} over {a,null}
  }

  test("native sign_sketch == per-bit literal-hyperplane dots, sign for sign") {
    // reconstruct the sketch the unfused way: 60 literal hyperplane
    // arrays (the Similarity generator), one dot + sign test per bit
    val vecs = Seq(
      Seq.tabulate(64)(i => math.sin(i + 1)),            // arbitrary dense
      Seq.tabulate(64)(i => math.sin(i + 1) * 1.0001),   // scaled twin
      Seq.tabulate(64)(i => -0.25 + (i % 7) * 0.1),      // small values
      Seq.fill(64)(0.0))                                  // all-zero → all acc=0 → all bits set
    val unfused = vecs.toDF("v").select(
      (0 until 60).map { j =>
        val h = array(graft.operators.Similarity.hyperplane(j).map(lit): _*)
        when(Native.dotProduct(col("v"), h) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _).as("s"))
    val fused = vecs.toDF("v").select(Native.signSketch(col("v"), 60).as("s"))
    assert(fused.as[Long].collect().toSeq === unfused.as[Long].collect().toSeq)
    // scaled twin keeps the identical sketch (the q35 planted-pair invariant)
    val out = fused.as[Long].collect()
    assert(out(0) === out(1))
  }

  test("native sign_sketch_bands == sign_sketch∘long_chunks, plus the 63-bit overflow bits") {
    val vecs = Seq(
      Seq.tabulate(64)(i => math.sin(i + 1)),
      Seq.tabulate(64)(i => math.sin(i + 1) * 1.0001),   // scaled twin
      Seq.tabulate(64)(i => -0.25 + (i % 7) * 0.1),
      Seq.fill(64)(0.0))                                  // all acc=0 → all bits set
    // chunks 0-2 (bits 0..59) must equal the two-step composition on the
    // representable prefix: same hyperplanes, same fold, same 20-bit split
    val both = vecs.toDF("v").select(
        Native.signSketchBands(col("v"), 80, 4).as("a"),
        Native.longChunks(Native.signSketch(col("v"), 60), 3, 20).as("b"))
      .as[(Seq[(Int, Long)], Seq[(Int, Long)])].collect()
    both.foreach { case (a, b) =>
      assert(a.length === 4 && a.map(_._1) === Seq(0, 1, 2, 3))
      assert(a.take(3) === b)
    }
    // chunk 3 (bits 60..79, beyond any single-Long sketch) must equal the
    // unfused literal-hyperplane reconstruction bit for bit
    val unfused = vecs.toDF("v").select(
      (60 until 80).map { j =>
        val h = array(graft.operators.Similarity.hyperplane(j).map(lit): _*)
        when(Native.dotProduct(col("v"), h) >= 0, lit(1L << (j - 60)))
          .otherwise(lit(0L))
      }.reduce(_ + _).as("c3"))
    val c3 = both.map(_._1(3)._2).toSeq
    assert(c3 === unfused.as[Long].collect().toSeq)
    // scaled twin: identical bands in every chunk (the q35 planted-pair
    // invariant — all 4 buckets shared, unlosable under any split)
    assert(both(0)._1 === both(1)._1)
  }

  test("native long_chunks == HOF simhashChunks, negative longs included") {
    val xs = Seq(0L, 1L, (1L << 60) - 1, 0x7fffffffffffffffL, -1L,
      -123456789012345L, 0x123456789abcdefL)
    val out = xs.toDF("x").select(
        Native.longChunks(col("x"), 4, 15).as("a"),
        Text.simhashChunks(col("x")).as("b"))
      .as[(Seq[(Int, Long)], Seq[(Int, Long)])].collect()
    out.foreach { case (a, b) => assert(a === b) }
  }

  test("codegen path == interpreted path for every kernel (no silent fallback)") {
    // KernelInvokeCodegen replaced CodegenFallback (r5): the child is
    // evaluated by whole-stage codegen and the kernel loop invoked through
    // a bound reference. Prove the two evaluation paths agree — and that
    // the generated code actually compiles — by running identical
    // projections with codegen FORCED (factory CODEGEN_ONLY + wholeStage
    // fallback disabled, so a broken doGenCode fails loudly, never
    // silently degrades) and with codegen fully OFF.
    def kernelsOut(): Seq[String] = {
      val t = (texts.map(Option(_)) :+ Option.empty[String]).toDF("text")
        .select(col("text"), Text.toWords(col("text")).as("w"))
        .select(
          Native.shingles(col("w"), 3).as("sh"),
          Native.simhash60(col("w")).as("h60"),
          Native.simhash128Bands(col("w")).as("h128"),
          Native.minhashBands(Native.shingles(col("w"), 3), 16, 4, 4).as("mb"),
          Native.charTrigrams(lower(col("text"))).as("cg"),
          Native.jaccardBp(Native.shingles(col("w"), 3),
            Native.shingles(reverse(col("w")), 3)).as("jb"))
        .collect().map(_.toString).toSeq
      val vecs: Seq[Seq[Option[Double]]] = Seq(
        Seq.tabulate(64)(i => Some(math.sin(i + 1))),
        Seq.fill(64)(Some(0.0)),                          // all-bits-set sketch
        Some(1.0) +: Seq.fill(63)(Option.empty[Double]))  // null element → nulls
      val v = vecs.toDF("v").select(
          Native.signSketch(col("v"), 60).as("ss"),
          Native.dotProduct(col("v"), col("v")).as("dp"),
          Native.longChunks(Native.signSketch(col("v"), 60), 4, 15).as("lc"),
          Native.signSketchBands(col("v"), 80, 4).as("sb"))
        .collect().map(_.toString).toSeq
      t ++ v
    }
    def withConf[A](kv: (String, String)*)(body: => A): A = {
      val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val gen = withConf(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback"    -> "false")(kernelsOut())
    val interp = withConf(
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
      "spark.sql.codegen.wholeStage"  -> "false")(kernelsOut())
    assert(gen.nonEmpty && gen === interp)
    // the null-element vector row must null out on both paths
    assert(gen.last === "[null,null,null,null]")
  }

  test("subword_count: greedy longest-match parity with an independent " +
       "model, both codegen modes (q95)") {
    import spark.implicits._
    // independent greedy model: prefix search over the piece LIST via
    // startsWith (the kernel uses substring + HashSet — different path)
    def modelWord(w: String): Int = {
      var pos = 0
      var n = 0
      while (pos < w.length) {
        val rest = w.substring(pos)
        val hit = SubwordVocab.pieces.filter(rest.startsWith)
          .sortBy(-_.length).headOption
        n += 1
        pos += hit.map(_.length).getOrElse(1)
      }
      n
    }
    // canaries: whole-word piece beats its prefixes; multi-piece splits
    assert(modelWord("window") === 1)
    assert(modelWord("streaming") === 2)  // stream + ing
    assert(modelWord("thecat") === 4)     // the + c + a + t
    val texts = Seq("the window stream merge", "streaming batches sorted",
      "zz qq xyzzy", "spark table scan join order hash", "a", "")
    def run(): Seq[Int] = texts.toDF("text")
      .select(Native.subwordCount(graft.functions.Text.toWords(col("text"))))
      .as[Int].collect().toSeq
    def withConf[A](kv: (String, String)*)(body: => A): A = {
      val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val expect = texts.map(
      _.trim.split("\\s+").filter(_.nonEmpty).map(modelWord).sum)
    val gen = withConf(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback"    -> "false")(run())
    val interp = withConf(
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
      "spark.sql.codegen.wholeStage"  -> "false")(run())
    assert(gen === expect)
    assert(interp === expect)
  }

  test("kernels are SQL-callable through the registry") {
    val n = df.createOrReplaceTempView("t")
    val out = spark.sql(
      """SELECT simhash60(w) AS h, size(shingles_ngram(w, 3)) AS ns,
        |       size(minhash_bands(shingles_ngram(w, 3), 16, 4, 4)) AS nb
        |FROM t""".stripMargin)
      .as[(Long, Int, Int)].collect()
    assert(out.length === texts.length)
    assert(out.forall(_._3 === 4))
  }
}
