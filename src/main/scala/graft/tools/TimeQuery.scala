package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev harness: time one registered query (or all, with "all") at a given
  * SF dir and print the physical plan on request.
  *
  * Usage: runMain graft.tools.TimeQuery <queryName|all> [sfDir] [explain|repeatN] [nobc]
  * `repeat3` times the query 3× and prints every pass — pass 2+ are the
  * warm (JIT'd, footers-cached) numbers, the ones comparable across runs.
  * `nobc` disables auto-broadcast, showing the shuffle-join shape a small
  * SF would have at 100 TB (the same toggle PlanSpec's atScaleShape uses). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val doExplain = args.lift(2).contains("explain")
    val repeats = args.lift(2).flatMap("""repeat(\d+)""".r.findFirstMatchIn)
      .map(_.group(1).toInt).getOrElse(1)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-timequery")
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("nobc"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val targets =
      if (name == "all") SparkEntry.queries.toSeq
      else Seq(name -> SparkEntry.queries(name))
    targets.foreach { case (n, fn) =>
      if (doExplain) fn(spark, sfDir).explain("formatted")
      (1 to repeats).foreach { pass =>
        // fresh plan per pass: re-counting one RDD would let Spark reuse
        // the shuffle map outputs ("skipped stages") and time only the
        // final stage. Construction is INSIDE the timing, matching Bench —
        // iterative queries (q63's eager-checkpointed CC loop) do their
        // work at construction time
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).queryExecution.toRdd.count() // plan-as-written, no count pruning
        println(f"TIMEQ $n%-24s pass=$pass rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
