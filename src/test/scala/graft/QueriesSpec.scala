package graft

/** Driver-contract smoke: every SparkEntry query runs on sf0.001 and
  * the oracled ones return rows; the DuckDB value comparison itself is
  * driver-side (and replicated in CI by scripts/compare — see
  * COVERAGE.md).
  */
class QueriesSpec extends SparkTestBase {

  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has a queries entry with matching name") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (SparkEntry.oracleSql.contains(name)) assert(n > 0, s"$name returned 0 rows")
      // rows-only queries may legitimately be small but not error
      assert(n >= 0)
    }
  }
}
