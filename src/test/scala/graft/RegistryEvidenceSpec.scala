package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-of-round evidence contract, automated (judge r12 task 3: the
  * registry↔evidence gap re-opened silently three rounds running —
  * r10, r11, r12 — precisely because closing it was a manual sweep).
  *
  * Every name in `SparkEntry.queries` must be evidenced in THREE
  * committed artifacts, or this suite is red and `sbt test` blocks the
  * round:
  *
  *  - PLANS.md        — a physical-plan audit row (`| name |`),
  *                      regenerated via `sbt "runMain graft.Explain
  *                      --audit-all"`;
  *  - bench_ledger.json — a committed quiet-run floor, so the bench's
  *                      ledger gate covers the query (an un-floored
  *                      query burns un-gated pass-1 budget);
  *  - COVERAGE.md     — at least a name-level mention tying the query
  *                      to the operator/capability it certifies.
  *
  * Additionally every query must either ship an oracle
  * (`SparkEntry.oracleSql`) or carry a declared-fast-path adjudication
  * row in COVERAGE.md's standing no-oracle table — a query with
  * neither would land as a NEW `no_oracle` in the driver artifact,
  * breaking the permanent-table invariant the judge checks.
  *
  * Byte-level greps on purpose: the contract is "the name appears in
  * the committed evidence file", nothing smarter — smart parsing is
  * how the manual sweep kept missing entries.
  */
class RegistryEvidenceSpec extends AnyFunSuite {

  private def read(path: String): String = {
    val f = new java.io.File(path)
    assert(f.isFile, s"evidence file missing: $path (run from repo root)")
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private lazy val names = SparkEntry.queries.keys.toSeq.sorted

  test("every registered query has a PLANS.md plan-audit row") {
    val plans = read("PLANS.md")
    val missing = names.filterNot(n => plans.contains(s"| $n "))
    assert(missing.isEmpty,
      s"""${missing.size} queries lack a PLANS.md row — regenerate with
         |  sbt "runMain graft.Explain --audit-all"
         |missing: ${missing.mkString(", ")}""".stripMargin)
  }

  test("every registered query has a committed bench_ledger.json floor") {
    val ledger = read("bench_ledger.json")
    val missing = names.filterNot(n => ledger.contains("\"" + n + "\""))
    assert(missing.isEmpty,
      s"""${missing.size} queries lack a quiet-run floor — regenerate with
         |  SPARK_GRAFT_BENCH_WRITE_LEDGER=1 sbt "runMain graft.Bench"
         |missing: ${missing.mkString(", ")}""".stripMargin)
  }

  test("every registered query is mentioned in COVERAGE.md") {
    val cov = read("COVERAGE.md")
    val missing = names.filterNot(cov.contains)
    assert(missing.isEmpty,
      s"${missing.size} queries have no COVERAGE.md mention: " +
        missing.mkString(", "))
  }

  test("every query is oracled or carries a standing no-oracle adjudication") {
    val unoracled = names.filterNot(SparkEntry.oracleSql.contains).toSet
    val adjudicated = SparkEntry.noOracleAdjudication.keySet
    assert(unoracled == adjudicated,
      s"""no-oracle adjudication out of sync with the registry:
         |  un-adjudicated (would land as NEW no_oracle rows): ${
        (unoracled -- adjudicated).toSeq.sorted.mkString(", ")}
         |  stale adjudications (oracled or unregistered): ${
        (adjudicated -- unoracled).toSeq.sorted.mkString(", ")}""".stripMargin)
  }

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(SparkEntry.queries.contains)
    assert(orphans.isEmpty,
      s"oracleSql entries with no matching query: ${orphans.mkString(", ")}")
  }
}
