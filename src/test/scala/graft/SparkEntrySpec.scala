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

  test("every registered query analyzes against the smoke testdata") {
    // Catches testdata/type drift at `sbt test` time instead of at the
    // driver gate: round 8's regenerated parquet flipped events.ts to
    // TIMESTAMP_NTZ and 7 queries failed ANALYSIS (unix_micros type
    // mismatch) — schema resolution here is exactly that check. Queries
    // whose construction runs bounded driver actions (collected probes,
    // BPE merge loop) execute them; everything else stops at analysis.
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(dir).exists, s"smoke testdata missing at $dir")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).take(120))
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
