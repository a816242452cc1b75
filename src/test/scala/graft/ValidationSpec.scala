package graft

import org.apache.spark.sql.functions._
import graft.ops.Validation

/** TFDV-style learned-reference validation: numeric profile/validate,
  * categorical domain skew, Jensen–Shannon token drift. Hand-computed
  * oracles; the DuckDB hash-compare covers sf-scale.
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile: bounds, null fraction, null-only column") {
    val df = Seq((Some(1.0), Some(10L)), (Some(5.0), None),
        (None, Some(20L)), (Some(3.0), None))
      .toDF("x", "y")
    val p = Validation.numericProfile(df, Seq("x", "y"))
      .orderBy("column")
      .as[(String, Option[Double], Option[Double], Double)].collect().toSeq
    assert(p == Seq(("x", Some(1.0), Some(5.0), 0.25),
      ("y", Some(10.0), Some(20.0), 0.5)))
    val dead0 = Validation.numericProfile(
      Seq[Option[Double]](None, None).toDF("z"), Seq("z"))
    val dead = dead0
      .as[(String, Option[Double], Option[Double], Double)].collect().toSeq
    assert(dead == Seq(("z", None, None, 1.0)))
    // the dead-column alarm must be a BOOLEAN false, not NULL: a value
    // arriving where the reference had none breaches; nothing arriving
    // is trivially ok
    val alarm = Validation.validateNumeric(
        Seq(Some(5.0)).toDF("z"), dead0, Seq("z"))
      .orderBy("stat").select("stat", "ok")
      .as[(String, Boolean)].collect().toSeq
    // bounds breach (value where the reference had none); null_frac
    // DROPPING below the reference is not a breach
    assert(alarm == Seq(("max", false), ("min", false),
      ("null_frac", true)))
    val quiet = Validation.validateNumeric(
        Seq[Option[Double]](None).toDF("z"), dead0, Seq("z"))
      .select("ok").as[Boolean].collect().toSeq
    assert(quiet == Seq(true, true, true), "nothing arrived -> ok")
  }

  test("validateNumeric flags bound and null-fraction breaches") {
    val ref = Seq(1.0, 2.0, 3.0).toDF("x")
    val profile = Validation.numericProfile(ref, Seq("x"))
    // arriving: max breaches (5 > 3), min fine, null_frac breaches
    val arr = Seq(Some(2.0), Some(5.0), None).toDF("x")
    val v = Validation.validateNumeric(arr, profile, Seq("x"))
      .orderBy("stat").select("stat", "ok")
      .as[(String, Boolean)].collect().toSeq
    assert(v == Seq(("max", false), ("min", true), ("null_frac", false)))
    // tol widens the max bound: range = 2, tol 1.0 allows up to 5
    val vt = Validation.validateNumeric(arr, profile, Seq("x"), tol = 1.0,
        nullSlack = 0.5)
      .orderBy("stat").select("stat", "ok")
      .as[(String, Boolean)].collect().toSeq
    assert(vt == Seq(("max", true), ("min", true), ("null_frac", true)))
  }

  test("unseenCategories: anti-join against the stored domain") {
    val domain = Seq("a", "b").toDF("event_type")
    val arr = Seq("a", "c", "c", "b", "d").toDF("event_type")
    val u = Validation.unseenCategories(arr, domain, "event_type")
      .orderBy("value").as[(String, Long)].collect().toSeq
    assert(u == Seq(("c", 2L), ("d", 1L)))
  }

  test("jsDrift: 0 for identical, 1 for disjoint, asymmetric drift between") {
    val ref = Validation.tokenHistogram(
      Seq("a b", "a c").toDF("text"), "text") // p: a=.5 b=.25 c=.25
    // g1 identical distribution, g2 fully disjoint vocabulary
    val arr = Seq(("g1", "a b"), ("g1", "a c"), ("g2", "x y"), ("g2", "x z"))
      .toDF("grp", "text")
    val out = Validation.jsDrift(ref, arr, "grp", "text")
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("g1", "g2"))
    assert(out.forall(_._2 == 4L))
    assert(math.abs(out(0)._3) < 1e-12, "identical distributions -> JS 0")
    assert(math.abs(out(1)._3 - 1.0) < 1e-12, "disjoint vocab -> JS 1")
    // a partial shift lands strictly between
    val mid = Validation.jsDrift(ref,
        Seq(("g", "a x"), ("g", "a y")).toDF("grp", "text"), "grp", "text")
      .select("js").as[Double].head()
    assert(mid > 0.0 && mid < 1.0)
  }
}
