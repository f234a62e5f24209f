package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev harness: time one registered query (or all, with "all") at a given
  * SF dir and print the physical plan on request.
  *
  * Usage: runMain graft.tools.TimeQuery <queryName|all> [sfDir] [explain]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val doExplain = args.lift(2).contains("explain")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-timequery")
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (name == "all") SparkEntry.queries.toSeq
      else Seq(name -> SparkEntry.queries(name))
    targets.foreach { case (n, fn) =>
      val df = fn(spark, sfDir)
      if (doExplain) df.explain("formatted")
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count() // plan-as-written, no count pruning
      println(f"TIMEQ $n%-24s rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
