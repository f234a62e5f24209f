package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{BloomMightContainExpr, CharNgramsExpr,
  DotProductExpr, JaccardBpExpr, LongChunksExpr, MinHashBandsExpr,
  SignSketchBandsExpr, SignSketchExpr, SimHash128BandsExpr, SimHash60Expr,
  SubwordCountExpr, WordNgramsExpr}

/** Engine extension point — registers the native dedup kernels with the
  * session's function registry via the PUBLIC `SparkSessionExtensions` API
  * (the (c)-tier mechanism of the build guidance; no private Spark API).
  *
  * Activate with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` — [[graft.Sessions]]
  * does both-in-one at builder time. Once registered the kernels are
  * callable from SQL (`SELECT minhash_bands(sh, 192, 32, 6)`) and from the
  * Column API via `call_function` ([[graft.functions.Native]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "minhash_bands(shingles, k, bands, rows) takes 4 args")
        MinHashBandsExpr(args.head, intArg(args(1), "k"),
          intArg(args(2), "bands"), intArg(args(3), "rows"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles_ngram"),
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "shingles_ngram"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingles_ngram(words, n) takes 2 args")
        WordNgramsExpr(args.head, intArg(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgramsExpr].getName, "char_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "char_ngrams(str, n) takes 2 args")
        CharNgramsExpr(args.head, intArg(args(1), "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("subword_count"),
      new ExpressionInfo(classOf[SubwordCountExpr].getName, "subword_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "subword_count(words) takes 1 arg")
        SubwordCountExpr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes 2 args")
        DotProductExpr(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_chunks"),
      new ExpressionInfo(classOf[LongChunksExpr].getName, "long_chunks"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "long_chunks(x, nChunks, chunkBits) takes 3 args")
        LongChunksExpr(args.head, intArg(args(1), "nChunks"),
          intArg(args(2), "chunkBits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_sketch"),
      new ExpressionInfo(classOf[SignSketchExpr].getName, "sign_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sign_sketch(v, bits) takes 2 args")
        SignSketchExpr(args.head, intArg(args(1), "bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_sketch_bands"),
      new ExpressionInfo(classOf[SignSketchBandsExpr].getName,
        "sign_sketch_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "sign_sketch_bands(v, bits, nChunks) takes 3 args")
        SignSketchBandsExpr(args.head, intArg(args(1), "bits"),
          intArg(args(2), "nChunks"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "simhash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash60(words) takes 1 arg")
        SimHash60Expr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpr].getName,
        "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(bits, key) takes 2 args")
        BloomMightContainExpr(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_bp"),
      new ExpressionInfo(classOf[JaccardBpExpr].getName, "jaccard_bp"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaccard_bp(a, b) takes 2 args")
        JaccardBpExpr(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash128_bands"),
      new ExpressionInfo(classOf[SimHash128BandsExpr].getName,
        "simhash128_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash128_bands(words) takes 1 arg")
        SimHash128BandsExpr(args.head)
      }))
  }
}
