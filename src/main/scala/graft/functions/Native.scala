package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot dedup kernels.
  *
  * WHY these exist (and the higher-order-function versions in [[Text]]
  * don't suffice at scale): Spark's array higher-order functions are
  * interpreted — no codegen, no common-subexpression elimination — and
  * Catalyst's CollapseProject happily inlines a single-use alias into a
  * lambda body that the surrounding `transform` evaluates k times. A
  * MinHash signature written as nested `transform`s therefore re-evaluates
  * the whole shingle pipeline once per permutation: O(k²·|shingles|)
  * interpreted evals per document (r2 bench: q18 hung for >10 min at sf0.1).
  * A single native expression evaluates its child ONCE and runs the whole
  * signature+banding as a tight JVM loop: O(k·|shingles|) long arithmetic,
  * ~µs per document.
  *
  * This is the (b) tier of the build guidance — custom `Expression` for a
  * scalar kernel Spark's built-ins can't express efficiently — and it stays
  * fully distributed: per-row, no state, partition-parallel.
  */
object Native {

  /** Shingle array → LSH band buckets in one pass:
    * `array<struct<band:int, bh:bigint>>`. Signature is k affine
    * permutations of xxhash64(shingle) mod P (P = 2^31-1, products stay
    * < 2^62); each band's bucket id chain-hashes its `rows` signature
    * values with xxhash64.
    *
    * Same banding STRUCTURE as [[Text.lshBands]] (bands × rows over the
    * same affine-permutation signature), but the bucket VALUES are not
    * interchangeable: this kernel chain-hashes the raw signature longs
    * (seed 42), while `Text.lshBands` xxhash64's the comma-joined decimal
    * string. Empty inputs differ too (here an empty shingle set yields the
    * all-Long.MaxValue signature; the HOF's `array_min` of an empty array
    * yields nulls). Use ONE surface on both sides of a candidate join —
    * mixing them silently produces zero candidates.
    *
    * Resolves through the function registry — the session must carry
    * [[graft.plans.GraftExtensions]] (Sessions.local does). */
  def minhashBands(shingles: Column, k: Int, bands: Int, rows: Int): Column =
    call_function("minhash_bands", shingles, lit(k), lit(bands), lit(rows))

  /** Portable 60-bit SimHash (bit-identical to [[Text.simhash60]] and the
    * DuckDB oracle's md5 reconstruction) as one native pass over the word
    * array. */
  def simhash60(words: Column): Column =
    call_function("simhash60", words)

  /** Distinct word n-gram shingle set as one native pass over the word
    * array — semantics of [[Text.shingles]]. The HOF version references
    * its `words` argument once per gram element, so a non-trivial `words`
    * expression (regex normalize + split) re-executes O(|words|) times per
    * row; here it is evaluated exactly once. */
  def shingles(words: Column, n: Int): Column =
    call_function("shingles_ngram", words, lit(n))

  /** Distinct character n-gram set of an ALREADY-NORMALIZED string column —
    * semantics of [[Text.charTrigrams]] generalized to any n. The HOF
    * version runs O(len) interpreted `substring` calls per row AND
    * re-evaluates its argument per position unless carefully staged
    * (the [[Text.shingleHashes]] staging contract); this expression
    * evaluates its child exactly once and emits the gram set in one tight
    * loop, so `Text.normText(text)` can be passed inline with no caveat.
    * q52's language-ID kernel — the engine's slowest before this existed. */
  def charNgrams(s: Column, n: Int): Column =
    call_function("char_ngrams", s, lit(n))

  /** The language-ID trigram case of [[charNgrams]]. */
  def charTrigrams(s: Column): Column = charNgrams(s, 3)

  /** Total greedy longest-match subword token count of a word array over
    * the fixed embedded [[SubwordVocab]] — the token-true budget for q95's
    * sequence packing. */
  def subwordCount(words: Column): Column =
    call_function("subword_count", words)

  /** Random-hyperplane sign sketch of a double vector, fused: bit j of
    * the result is `sign(v · h_j)` over `bits` fixed pseudo-random
    * hyperplanes (Knuth-hash doubles in [-0.5, 0.5), derived per
    * (bit, dim) as `(((j·d + i) · 2654435761) % 1000) / 1000 - 0.5` with
    * d = the vector's length — the exact constants
    * [[graft.operators.Similarity]] used as literal arrays). One native
    * pass replaces `bits` separate dot-product expressions: the unfused
    * form built a ~4000-node tree whose PLANNING + codegen compile alone
    * cost ~1.2 s per run (measured, sf0.1), dwarfing its own arithmetic.
    * Same left-fold accumulation order per hyperplane, so every sign —
    * and therefore every LSH bucket — is bit-identical to the unfused
    * form ON CLEAN FIXED-LENGTH VECTORS. Edge semantics (ADVICE r4):
    * null vector → null; EMPTY vector → all-bits-set sketch (every
    * accumulator is 0.0, and sign(0) sets the bit — same as the unfused
    * `when(dot >= 0)` form); a null ELEMENT → null sketch, which DIVERGES
    * from the unfused form's `otherwise(0)` per-bit fallback (sketch 0) —
    * a null-element row drops out of LSH banding entirely here rather
    * than landing in bucket 0. Pre-filter null vectors if rows must
    * survive. */
  def signSketch(v: Column, bits: Int): Column =
    call_function("sign_sketch", v, lit(bits))

  /** [[signSketch]] fused with [[longChunks]]: an `bits`-bit sign sketch
    * emitted directly as `nChunks` disjoint band structs
    * (`array<struct<band:int, bh:bigint>>`), bit j landing in chunk
    * `j / (bits/nChunks)`. Two things the two-step form can't give:
    * the sketch is NOT capped at 63 bits (no intermediate Long — the
    * Hamming≤(nChunks−1) pigeonhole guarantee can keep 4 bands while the
    * chunk width grows with the corpus, ADVICE r5), and the generator
    * consumes ONE expression, so `explode` evaluates the kernel exactly
    * once per row whatever pushdown inlines. Same hyperplane constants,
    * same fold order: bits 0..59 are bit-identical to
    * `long_chunks(sign_sketch(v, 60), …)` (NativeSpec pins it). */
  def signSketchBands(v: Column, bits: Int, nChunks: Int): Column =
    call_function("sign_sketch_bands", v, lit(bits), lit(nChunks))

  /** Split a long into `nChunks` disjoint `chunkBits`-wide band structs
    * (`array<struct<band:int, bh:bigint>>`) — semantics of
    * [[Text.simhashChunks]] as ONE expression. The point is not the
    * arithmetic (4 shifts) but EVALUATION COUNT under `explode`: a
    * generator built as `array(struct(.. sig ..) × 4)` carries four
    * references to the signature column, and the optimizer inlines the
    * signature's whole subtree into each — q35 was re-running its fused
    * sketch kernel 4×/row, q54 its simhash. `explode(long_chunks(sig))`
    * evaluates the signature exactly once per row, whatever gets inlined.
    * PlanSpec pins the eval counts. */
  def longChunks(x: Column, nChunks: Int, chunkBits: Int): Column =
    call_function("long_chunks", x, lit(nChunks), lit(chunkBits))

  /** 128-bit SimHash emitted directly as 4 disjoint 32-bit band structs
    * (`array<struct<band:int, bh:bigint>>`) — the [[simhash60]] growth
    * path the q54 scaladoc promises: random chunk-bucket collisions grow
    * N²·nChunks/2^chunkBits and Hamming≤3 pins nChunks at 4, so the ONLY
    * scale lever is a longer signature — 4×32 gives 2^32 buckets per
    * chunk (131072× the 4×15 layout) with the identical pigeonhole
    * guarantee. Bit j of the signature is the majority vote over words of
    * bit j%32 of md5 word j/32, where word k is hex chars [8k+1, 8k+8]
    * big-endian (= `conv(substr(md5(w), 1+8k, 8), 16, 10)`, each < 2^32 so
    * the DuckDB oracle stays in BIGINT). Null elements are skipped like
    * [[simhash60]]; chunk c's value is bits [32c, 32c+32). */
  def simhash128Bands(words: Column): Column =
    call_function("simhash128_bands", words)

  /** Sequential-fold dot product of two double arrays — bit-identical to
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` (the (((0+x₁)+x₂)+…) order
    * the DuckDB oracle's `list_reduce(list_prepend(0.0, …))` replays), but
    * a tight JVM loop instead of ~3·d interpreted lambda frames per row.
    * This is the inner loop of every similarity scan — the kernel that
    * runs O(|Q|·N) times at 100 TB. */
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Exact set-Jaccard similarity of two string arrays in basis points —
    * value-identical to
    * `floor(size(array_intersect(a,b)) * 10000L / size(array_union(a,b)))`
    * on distinct-element arrays (NativeSpec proves it on random corpora,
    * duplicates included), but ONE counting pass instead of two boxed
    * `SQLOpenHashSet` builds that each MATERIALIZE a result array nobody
    * reads. This is the verify kernel of every candidate-pair dedup join
    * (q18, q68) — the expression that runs once per CANDIDATE, and
    * candidates are the quantity that grows superlinearly when near-
    * threshold document families scale (the r9 sf100 ladder point caught
    * exactly that: all 32 executor threads pinned in
    * `ArrayIntersect.nullSafeEval` — the engine's first third-decade
    * cliff). Null ELEMENTS carry set identity exactly like the
    * built-ins (a member of the intersection iff present on both
    * sides) — the engine's shingle arrays are null-free, but hand-built
    * SQL inputs stay on identical semantics. Union of two empty sets →
    * NULL (division by zero), matching the Column form. */
  def jaccardBp(a: Column, b: Column): Column =
    call_function("jaccard_bp", a, b)
}

/** Real codegen for the unary kernels WITHOUT hand-writing each loop in
  * Java. `CodegenFallback` keeps the operator inside whole-stage codegen
  * but evaluates the ENTIRE expression interpreted per call — including
  * the child subtree, so q52's `char_ngrams(normText(text))` was paying
  * an interpreted regex normalize per row, and every call crossed the
  * megamorphic `eval(InternalRow)` dispatch. Here the CHILD is evaluated
  * by whole-stage codegen (once, inline, shared with every other use of
  * the column), and only the kernel body — already a tight primitive
  * Scala loop, JIT-compiled once — is invoked through a bound reference.
  * Same division of labor as Spark's own `StaticInvoke`/`Invoke` bridge
  * expressions, built from the public `CodegenContext` API.
  */
trait KernelInvokeCodegen extends UnaryExpression {

  /** Public bridge for generated code — `nullSafeEval` is protected. */
  final def kernelEval(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => {
      // Janino autoboxing is not reliable — box primitive children by hand
      val boxedIn =
        if (CodeGenerator.isPrimitiveType(child.dataType))
          s"${CodeGenerator.boxedType(child.dataType)}.valueOf($c)"
        else c
      val r = ctx.freshName("kres")
      val assign =
        if (CodeGenerator.isPrimitiveType(dataType))
          s"${ev.value} = ((${CodeGenerator.boxedType(dataType)}) $r)" +
            s".${CodeGenerator.javaType(dataType)}Value();"
        else
          s"${ev.value} = (${CodeGenerator.javaType(dataType)}) $r;"
      if (nullable)
        s"""Object $r = $ref.kernelEval($boxedIn);
           |if ($r == null) { ${ev.isNull} = true; } else { $assign }
           |""".stripMargin
      else
        // Still null-check even though the expression claims non-nullable:
        // a kernel whose `nullable` override under-reports would otherwise
        // NPE inside generated code while the interpreted path silently
        // yields null — a codegen/interpreted divergence turned crash with
        // no pointer to the offending kernel (ADVICE r5). Fail descriptive.
        s"""Object $r = $ref.kernelEval($boxedIn);
           |if ($r == null) {
           |  throw new IllegalStateException(
           |    "kernel ${this.prettyName} declared non-nullable but returned null" +
           |    " - fix its nullable override");
           |}
           |$assign
           |""".stripMargin
    })
  }
}

case class MinHashBandsExpr(child: Expression, k: Int, bands: Int, rows: Int)
    extends UnaryExpression with KernelInvokeCodegen {
  require(bands * rows == k, s"bands($bands) * rows($rows) must equal k($k)")

  private val P = Text.MinhashP
  private val aCoef = Text.minhashA(k)
  private val bCoef = Text.minhashB(k)

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bh", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_bands needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val raw = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        val h = ((raw % P) + P) % P
        var j = 0
        while (j < k) {
          val v = (aCoef(j) * h + bCoef(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      var bh = 42L
      var r = 0
      while (r < rows) {
        bh = XxHash64Function.hash(sig(b * rows + r), LongType, bh)
        r += 1
      }
      out(b) = InternalRow(b, bh)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with KernelInvokeCodegen {
  require(n >= 1, "n must be >= 1")

  override def prettyName: String = "shingles_ngram"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles_ngram needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nw = arr.numElements()
    if (nw < n) return new GenericArrayData(Array.empty[AnyRef])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= nw - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var o = 0
      while (o < n) { parts(o) = arr.getUTF8String(i + o); o += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct character n-gram set (first-occurrence order, matching
  * `array_distinct(transform(sequence(1, len-n+1), i -> substring(s,i,n)))`
  * — NativeSpec asserts the parity). Character semantics are SQL
  * `substring`'s (code-unit-per-char via UTF8String), so multi-byte text
  * grams identically to the HOF form. */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with KernelInvokeCodegen {
  require(n >= 1, "n must be >= 1")

  override def prettyName: String = "char_ngrams"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams needs string, got ${other.sql}")
  }

  /** One pass over the UTF-8 bytes: char starts are walked once (same
    * `numBytesForFirstByte` walk SQL `substring` uses, so multi-byte parity
    * holds), grams are deduped in an open-addressing table of char indexes
    * (FNV-1a over the byte span, linear probing, byte-wise equality on
    * collision — exact, not hash-trusting), and only the DISTINCT grams are
    * materialized as strings at the end. The naive per-position
    * `substringSQL` + `LinkedHashSet[UTF8String]` form allocated two
    * objects per CHARACTER of input and benched 3× slower on q52. */
  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val b = input.asInstanceOf[UTF8String].getBytes
    val nb = b.length
    var nc = 0
    var i = 0
    while (i < nb) { i += UTF8String.numBytesForFirstByte(b(i)); nc += 1 }
    if (nc < n) return new GenericArrayData(Array.empty[AnyRef])
    val offs = new Array[Int](nc + 1)
    i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i; i += UTF8String.numBytesForFirstByte(b(i)); c += 1
    }
    offs(nc) = nb
    val nGrams = nc - n + 1
    var cap = 4
    while (cap < nGrams * 2) cap <<= 1
    val table = new Array[Int](cap) // 0 = empty, else gram start char + 1
    val mask = cap - 1
    val order = new Array[Int](nGrams) // first-occurrence order of distincts
    var distinct = 0
    var g = 0
    while (g < nGrams) {
      val from = offs(g)
      val until = offs(g + n)
      var h = 0x811c9dc5
      var p = from
      while (p < until) { h = (h ^ (b(p) & 0xff)) * 0x01000193; p += 1 }
      var slot = h & mask
      var done = false
      while (!done) {
        val e = table(slot)
        if (e == 0) {
          table(slot) = g + 1; order(distinct) = g; distinct += 1; done = true
        } else {
          val ef = offs(e - 1)
          val len = until - from
          var same = (offs(e - 1 + n) - ef) == len
          var q = 0
          while (same && q < len) { same = b(ef + q) == b(from + q); q += 1 }
          if (same) done = true else slot = (slot + 1) & mask
        }
      }
      g += 1
    }
    val out = new Array[AnyRef](distinct)
    var d = 0
    while (d < distinct) {
      val gs = order(d)
      out(d) = UTF8String.fromBytes(b, offs(gs), offs(gs + n) - offs(gs))
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "dot_product"
  override def dataType: DataType = DoubleType

  /** NULL semantics match `aggregate(zip_with(a,b,_*_), 0.0, _+_)` in
    * full: unequal lengths → NULL (zip_with pads with null, null products
    * poison the sum) and any null element → NULL. So the bit-identical
    * claim holds on the whole input domain, not just the clean subset —
    * reading getDouble on a null slot (undefined 0.0) can't happen. */
  override def nullable: Boolean = true

  /** Real codegen (not CodegenFallback): this kernel runs once per
    * CANDIDATE PAIR — O(|queries|·N) times in a brute-force scan — so the
    * per-call boxing of an interpreted fallback is the hot path's hot
    * path. The generated loop stays inside whole-stage codegen. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two array<double>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with pads → null sum
    // exact (((0+x₁y₁)+x₂y₂)+…) fold — keep the order, it is the oracle
    // contract for float-exact comparison
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** See [[Native.jaccardBp]]. Set semantics over DISTINCT elements, same
  * as `array_intersect`/`array_union`; counts only — no result-array
  * materialization, no per-element closure dispatch. The basis-point
  * arithmetic replays the Column form's exact evaluation order
  * (long·10000 promoted to double, double divide, floor, cast long) so
  * the swap is bit-for-bit invisible to the DuckDB oracle. */
case class JaccardBpExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "jaccard_bp"
  override def dataType: DataType = LongType

  /** Null when either array is null, or when both are empty (the Column
    * form divides by a zero union and Spark's non-ANSI Divide yields
    * null). */
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_bp needs two array<string>, got ${l.sql}, ${r.sql}")
    }

  /** Public bridge for generated code — `nullSafeEval` is protected. */
  final def kernelEval(a: Any, b: Any): Any = nullSafeEval(a, b)

  /** Children evaluate inside whole-stage codegen; only the counting
    * loop — a JIT-compiled method on this reference object — is invoked
    * per call (the [[KernelInvokeCodegen]] division of labor, binary
    * form). */
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("kres")
      s"""Object $r = $ref.kernelEval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }
         |""".stripMargin
    })
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    // null elements carry set identity, exactly like array_intersect /
    // array_union: a distinct member present in the intersection iff
    // present on both sides (the engine's shingle arrays are null-free;
    // this keeps hand-built SQL inputs on the same semantics)
    val sx = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      Math.max(4, nx * 2))
    var nullX = false
    var i = 0
    while (i < nx) {
      if (x.isNullAt(i)) nullX = true else sx.add(x.getUTF8String(i))
      i += 1
    }
    val sy = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      Math.max(4, ny * 2))
    var nullY = false
    var inter = 0L
    i = 0
    while (i < ny) {
      if (y.isNullAt(i)) nullY = true
      else {
        val e = y.getUTF8String(i)
        if (sy.add(e) && sx.contains(e)) inter += 1L
      }
      i += 1
    }
    // union = |strings of x ∪ strings of y| + 1 if either side holds null;
    // the intersection additionally gains the null member iff BOTH do
    val union = sx.size.toLong + sy.size.toLong - inter +
      (if (nullX || nullY) 1L else 0L)
    if (nullX && nullY) inter += 1L
    if (union == 0L) null
    else java.lang.Long.valueOf(Math.floor(inter * 10000L / union.toDouble).toLong)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** See [[Native.longChunks]]. `(x >> k) & mask` equals
  * `pmod(shiftright(x, k), 2^bits)` on the whole long domain (two's
  * complement), so the HOF parity holds for negative inputs too —
  * NativeSpec checks one. */
case class LongChunksExpr(child: Expression, nChunks: Int, chunkBits: Int)
    extends UnaryExpression with KernelInvokeCodegen {
  require(nChunks >= 1 && chunkBits >= 1 && nChunks * chunkBits <= 64,
    s"nChunks($nChunks) * chunkBits($chunkBits) must fit in 64 bits")

  // -1L >>> (64 - chunkBits), NOT (1L << chunkBits) - 1: Java shifts mod
  // 64, so the latter wraps to 0 at chunkBits = 64 and every chunk would
  // silently read as 0 (ADVICE r4). The unsigned-shift form is exact on
  // the whole permitted range [1, 64].
  private val mask = -1L >>> (64 - chunkBits)

  override def prettyName: String = "long_chunks"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bh", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"long_chunks needs bigint, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    val out = new Array[AnyRef](nChunks)
    var c = 0
    while (c < nChunks) {
      out(c) = InternalRow(c, (x >> (c * chunkBits)) & mask)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[Native.signSketch]]. The hyperplane component is recomputed
  * inline from integer arithmetic (two multiplies, a modulo, a divide per
  * cell) — allocation-free and exactly the doubles the literal-array form
  * folded into the plan, so sign decisions cannot drift. */
case class SignSketchExpr(child: Expression, bits: Int)
    extends UnaryExpression with KernelInvokeCodegen {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def prettyName: String = "sign_sketch"
  override def dataType: DataType = LongType

  /** Exact, not a blanket `true` (r4 verdict): the result is null iff the
    * input vector is null or contains a null element. A blanket-nullable
    * signature invites InferFiltersFromConstraints to synthesize
    * `isnotnull(sign_sketch(...))` join-key filters that re-inline this
    * CodegenFallback kernel below its defining Project — the q35 3×/row
    * re-evaluation. With a non-nullable child the constraint now folds. */
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_sketch needs array<double>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    var sketch = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        if (v.isNullAt(i)) return null
        val h = (((j.toLong * d + i) * 2654435761L) % 1000L) / 1000.0 - 0.5
        acc += v.getDouble(i) * h
        i += 1
      }
      if (acc >= 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[Native.signSketchBands]]. Sign decisions are the exact
  * [[SignSketchExpr]] arithmetic (same Knuth-hash hyperplane cells, same
  * left-fold accumulation), only the destination differs: bit j sets bit
  * `j % chunkBits` of chunk `j / chunkBits` instead of bit j of one Long,
  * which is precisely the [[LongChunksExpr]] split — so the fused kernel
  * equals the two-step composition wherever the two-step form is
  * representable (≤63 bits), and extends it beyond. Null semantics match
  * [[SignSketchExpr]]: null vector → null, null ELEMENT → null (pre-filter
  * if rows must survive); empty vector → every accumulator 0.0 → all bits
  * set in every chunk. */
case class SignSketchBandsExpr(child: Expression, bits: Int, nChunks: Int)
    extends UnaryExpression with KernelInvokeCodegen {
  require(nChunks >= 1 && bits >= nChunks && bits % nChunks == 0,
    s"bits($bits) must be a positive multiple of nChunks($nChunks)")
  private val chunkBits = bits / nChunks
  require(chunkBits <= 63, s"chunk width $chunkBits exceeds 63 bits")

  override def prettyName: String = "sign_sketch_bands"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bh", LongType, nullable = false))),
    containsNull = false)

  /** Exact, like [[SignSketchExpr]] — a blanket `true` would let
    * InferFiltersFromConstraints re-inline the kernel into join-key
    * Filters below the defining Project. */
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_sketch_bands needs array<double>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    val chunks = new Array[Long](nChunks)
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        if (v.isNullAt(i)) return null
        val h = (((j.toLong * d + i) * 2654435761L) % 1000L) / 1000.0 - 0.5
        acc += v.getDouble(i) * h
        i += 1
      }
      if (acc >= 0) chunks(j / chunkBits) |= (1L << (j % chunkBits))
      j += 1
    }
    val out = new Array[AnyRef](nChunks)
    var c = 0
    while (c < nChunks) { out(c) = InternalRow(c, chunks(c)); c += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[Native.simhash128Bands]]. */
case class SimHash128BandsExpr(child: Expression)
    extends UnaryExpression with KernelInvokeCodegen {

  override def prettyName: String = "simhash128_bands"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bh", LongType, nullable = false))),
    containsNull = false)

  /** Exact: null elements are skipped (like [[SimHash60Expr]]), so the
    * result is null only for a null input array — keeps inferred
    * isnotnull join-key constraints foldable (the r4 re-inline trap). */
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash128_bands needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](128)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // word k = md5 bytes [4k, 4k+4) big-endian — hex chars [8k+1, 8k+8]
        var k = 0
        while (k < 4) {
          val w = ((d(4 * k) & 0xffL) << 24) | ((d(4 * k + 1) & 0xffL) << 16) |
                  ((d(4 * k + 2) & 0xffL) << 8) | (d(4 * k + 3) & 0xffL)
          var p = 0
          while (p < 32) {
            votes(32 * k + p) += (if (((w >> p) & 1L) == 1L) 1 else -1)
            p += 1
          }
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](4)
    var c = 0
    while (c < 4) {
      var bh = 0L
      var p = 0
      while (p < 32) {
        if (votes(32 * c + p) >= 0) bh |= (1L << p)
        p += 1
      }
      out(c) = InternalRow(c, bh)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash60Expr(child: Expression)
    extends UnaryExpression with KernelInvokeCodegen {

  override def prettyName: String = "simhash60"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash60 needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex chars of md5 = 7 full bytes + the high nibble of
        // byte 7, identical to conv(substring(md5(x),1,15),16,10)
        var h = 0L
        var bIdx = 0
        while (bIdx < 7) { h = (h << 8) | (digest(bIdx) & 0xffL); bIdx += 1 }
        h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
        var j = 0
        while (j < 60) {
          votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) >= 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The fixed subword vocabulary for [[SubwordCountExpr]] — embedded in the
  * engine AND mirrored literally into the DuckDB oracle (the q95 SQL is
  * generated from this exact list), so both engines replay the identical
  * greedy longest-match. All 26 single letters guarantee progress on the
  * corpus charset; the multi-character pieces (max length 6) are common
  * English/corpus subwords so real words split into 1–4 pieces and
  * longest-match is genuinely exercised (a whole-word piece beats its own
  * prefixes, e.g. "window" over "wi"+"ndow"). Deterministic and seedless,
  * like the minhash permutation constants. */
object SubwordVocab {
  val pieces: Seq[String] =
    ("abcdefghijklmnopqrstuvwxyz".map(_.toString) ++ Seq(
      "the", "er", "in", "an", "or", "ar", "st", "ch", "sh", "ow", "ey",
      "ing", "ion", "ort", "ash", "oin", "can", "dow", "ndow", "atch",
      "ream", "able", "erge", "art", "all", "ta", "ba", "wi", "sma", "par",
      "window", "stream", "batch", "table", "order", "scan", "hash",
      "merge", "spark", "join", "sort")).toVector
  val maxLen: Int = pieces.map(_.length).max
  private val set = new java.util.HashSet[String](pieces.size * 2)
  pieces.foreach(set.add)

  /** Greedy longest-match token count of one word: at each position take
    * the longest vocab piece prefixing the remainder (fallback: consume
    * one character as one token — unreachable on [a-z] input since every
    * letter is a piece, but it keeps the kernel total on arbitrary
    * bytes, matching the oracle's `coalesce(match_len, 1)`). */
  def countWord(w: String): Int = {
    val len = w.length
    var pos = 0
    var n = 0
    while (pos < len) {
      var l = math.min(maxLen, len - pos)
      var step = 1
      while (l >= 1) {
        if (set.contains(w.substring(pos, pos + l))) { step = l; l = 0 }
        else l -= 1
      }
      n += 1
      pos += step
    }
    n
  }
}

/** Total greedy-subword token count of a word array — the token-true
  * budget for sequence packing (q95): `size(words)` counts WORDS, but a
  * training budget is in TOKENS, and a deterministic embedded-vocab
  * tokenizer makes the 2048 budget token-true while staying exactly
  * reproducible in the oracle (a learned BPE would not be). One tight
  * JIT-compiled loop per row, inside whole-stage codegen via
  * [[KernelInvokeCodegen]]; the vocab lookup is a shared static HashSet —
  * no per-row allocation beyond the word strings themselves. */
case class SubwordCountExpr(child: Expression)
    extends UnaryExpression with KernelInvokeCodegen {

  override def prettyName: String = "subword_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"subword_count needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        total += SubwordVocab.countWord(arr.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
