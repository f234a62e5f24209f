package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.functions.Text

/** q126/q127/q132 stage-level profile (r20): times each phase of the
  * span-dedup kernel in isolation — tokenize+gram build, the gram-domain
  * duplicate count, the position semi-join, islands, the span-text join +
  * election — so optimization lands on the dominant phase.
  *
  * Usage: runMain graft.tools.SpanDiag <sfDir>
  */
object SpanDiag {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-span-diag")
    s.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[spandiag] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val K = graft.operators.Documents.DupSpanK
    val docs0 = Tables.documents(s, d)
    docs0.count() // warm
    val docs = docs0
      .select(col("doc_id"), Text.toWords(col("text")).as("w"))
      .filter(size(col("w")) >= K)
    val nDocs = time("tokenize + count")(docs.count())
    val grams = docs
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - lit(K - 1))).as("pos"),
        col("w"))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("w"), col("pos"), lit(K)), " ").as("gram"))
    val nGrams = time("gram build + count")(grams.count())
    System.err.println(s"[spandiag] nDocs $nDocs nGrams $nGrams")
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("gram"))
    val nDup = time("dup groupBy(gram) + count")(dup.count())
    System.err.println(s"[spandiag] nDup $nDup")
    val dpos = grams.join(dup, Seq("gram"), "left_semi")
    val nDpos = time("position semi-join + count")(dpos.count())
    System.err.println(s"[spandiag] nDpos $nDpos")
    import org.apache.spark.sql.expressions.Window
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dpos
      .withColumn("isl", col("pos") - row_number().over(wIsl))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + lit(K - 1)).as("end_pos"))
    val nSpans = time("islands + count")(spans.count())
    System.err.println(s"[spandiag] nSpans $nSpans")
    // gram-HASH variant of the dup count: shuffle 16-byte keys, keep the
    // strings out of the exchange entirely; exactness would need the
    // min/max-gram collision repair (q127's election pattern)
    val gh = docs
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - lit(K - 1))).as("pos"),
        col("w"))
      .select(col("doc_id"), col("pos"),
        xxhash64(array_join(slice(col("w"), col("pos"), lit(K)), " ")).as("h"))
    val dupH = gh.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("h"))
    val nDupH = time("dup groupBy(hash) + count")(dupH.count())
    val nDposH = time("pos semi-join on hash + count")(
      gh.join(dupH, Seq("h"), "left_semi").count())
    System.err.println(s"[spandiag] nDupH $nDupH nDposH $nDposH")
    s.stop()
  }
}
