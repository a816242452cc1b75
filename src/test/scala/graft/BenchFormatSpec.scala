package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-19 bench-contract helpers (judge r18 tasks 1/2): the
  * printed line must stay parseable inside the driver's 2000-char
  * stdout tail at ANY registry size, and the mandatory measured core
  * must deterministically pick the top-K committed floors. These are
  * pure functions — the one part of the emission path a unit test can
  * pin without running Spark. */
class BenchFormatSpec extends AnyFunSuite {

  private val registry234: Seq[(String, Option[Double])] =
    (1 to 234).map(i => f"family_query_name_$i%03d" -> Some(234.0 - i))

  test("cappedMapJson respects the byte budget at full registry size") {
    val (json, omitted) = Bench.cappedMapJson(registry234, 600)
    assert(json.length <= 600, s"map overflowed: ${json.length} bytes")
    assert(omitted > 0 && omitted < 234)
    // greedy head keeps the LARGEST entries (callers pass desc order)
    assert(json.contains("\"family_query_name_001\":233.0000"))
  }

  test("cappedMapJson renders failures as null and stays valid JSON") {
    val entries = Seq("broken_q" -> None, "ok_q" -> Some(1.5)):
      Seq[(String, Option[Double])]
    val (json, omitted) = Bench.cappedMapJson(entries, 1000)
    assert(omitted == 0)
    assert(json == """{"broken_q":null,"ok_q":1.5000}""")
  }

  test("cappedMapJson with a tiny budget degrades to an empty map, not a broken one") {
    val (json, omitted) = Bench.cappedMapJson(registry234, 10)
    assert(json == "{}")
    assert(omitted == 234)
  }

  test("a full compact line with two capped maps fits the driver tail") {
    // mirror of the Bench emission arithmetic: a ~900-byte scalar shell
    // plus two maps, each capped at (cap - shell - 24) / 2, can never
    // exceed the cap — the invariant that makes BENCH_rN parseable
    val cap = 1700
    val shell = 900
    val mapBudget = math.max(120, (cap - shell - 24) / 2)
    val (m1, _) = Bench.cappedMapJson(registry234, mapBudget)
    val (m2, _) = Bench.cappedMapJson(registry234, mapBudget)
    assert(shell + m1.length + m2.length + 24 - 4 <= cap)
  }

  test("mandatoryNames picks the top-K floors with a stable tie-break") {
    val ledger = Map("a" -> 5.0, "b" -> 3.0, "c" -> 3.0, "d" -> 9.0,
      "e" -> 0.2)
    val core = Seq("a", "b", "c", "d", "e", "nofloor")
    assert(Bench.mandatoryNames(core, ledger, 3) == Set("d", "a", "b"))
    // un-floored names never enter; k larger than the floor count is safe
    assert(Bench.mandatoryNames(core, ledger, 99) ==
      Set("a", "b", "c", "d", "e"))
    assert(Bench.mandatoryNames(core, ledger, 0) == Set.empty[String])
  }

  test("mandatoryNames ignores ledger entries outside the timed tier") {
    val ledger = Map("quiet_only" -> 99.0, "core_q" -> 1.0)
    assert(Bench.mandatoryNames(Seq("core_q"), ledger, 10) == Set("core_q"))
  }
}
