package graft

/** Driver-contract guards: the smoke entry must return rows, and every
  * oracle key must name a registered query — an orphaned oracle (typo'd
  * key) would silently drop its query from the correctness gate instead
  * of failing anything. */
class SparkEntrySpec extends SparkSpec {
  test("entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphaned oracles: ${os -- qs}")
    // and the registry is non-trivial (a refactor that drops a query
    // file from the registry should not pass silently)
    assert(qs.size >= 90, s"query registry shrank to ${qs.size}")
  }
}
