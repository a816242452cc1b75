package graft

import graft.ops.Checks

/** Deequ-style audit: metric math, thresholds, single-pass contract. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 1, Some("a"), 10.0),
    (1L, 2, Some("b"), 60.0),    // out of range
    (2L, 1, None, 20.0),         // null name
    (2L, 1, Some("z"), 30.0))    // duplicate key, value outside set
    .toDF("k1", "k2", "name", "x")

  test("audit computes completeness, uniqueness, range, accepted-values") {
    val out = Checks.audit(df, Seq(
      Checks.completeness("name"),
      Checks.uniqueness(Seq("k1", "k2")),
      Checks.inRange("x", 0, 50),
      Checks.inSet("name", Seq("a", "b"), threshold = 0.5)))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("completeness_name") == ((0.75, false)))
    assert(out("uniqueness_k1_k2") == ((0.75, false)))
    assert(out("range_x") == ((0.75, false)))
    assert(out("accepted_name") == ((0.5, true)))  // meets its 0.5 threshold
  }

  test("audit is one aggregation pass plus the distinct-count shuffle") {
    val plan = Checks.audit(df, Seq(
      Checks.completeness("name"), Checks.inRange("x", 0, 50)))
      .queryExecution.optimizedPlan.toString
    // no uniqueness declared -> exactly one Aggregate, no extra scans
    assert("Aggregate".r.findAllIn(plan).length == 1, plan)
  }

  test("a perfect column passes at threshold 1.0") {
    val out = Checks.audit(df, Seq(Checks.completeness("k1")))
      .as[(String, Double, Boolean)].collect().head
    assert(out == (("completeness_k1", 1.0, true)))
  }
}
