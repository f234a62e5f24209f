package graft

/** Whole-surface smoke: every registered query returns rows at sf0.001 and
  * has an oracle entry. An empty result would pass the oracle compare
  * trivially (both sides empty), so non-emptiness is asserted here instead. */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every query has an oracle and yields rows at sf0.001") {
    val missingOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missingOracle.isEmpty, s"queries without oracle SQL: $missingOracle")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.columns.forall(c => c == c.toLowerCase),
        s"$name has non-lowercase columns (oracle compare is name-sorted): " +
          df.columns.mkString(","))
      val n = df.queryExecution.toRdd.count()
      assert(n > 0, s"$name returned 0 rows at sf0.001 — vacuous oracle pass")
    }
  }

  test("entry() smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
