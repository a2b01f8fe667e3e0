package graft

/** Cross-cutting invariants over the whole SparkEntry surface:
  * every declared query runs and returns rows at sf0.001 (the driver's
  * smoke gate), and the oracle map never references an unknown query.
  */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql without queries: $dangling")
  }

  test("every query has an oracle — no rows-only fallbacks") {
    // full oracle coverage is a property of this engine (every
    // operator is cross-engine checkable); a new query landing without
    // its DuckDB mirror must fail here, not silently downgrade to the
    // driver's weaker rows-only check
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty at sf0.001") {
      assert(fn(spark, Sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
