package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide invariants: every declared query runs at sf0.001,
  * returns rows, and its oracle contract is well-formed. The value-
  * level semantics are covered by the DuckDB gate (scripts/check.py);
  * this spec catches registration drift (a query without an oracle or
  * vice versa) and runtime regressions early. */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every query except declared no-oracle ops has an oracle") {
    val noOracle = Set("agg_approx_distinct", "agg_approx_percentile")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracle
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
