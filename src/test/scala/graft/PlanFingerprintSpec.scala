package graft

import org.apache.spark.sql.{Encoders, Row}

/** Pins the run-environment normalizations in [[Bench.planFingerprint]]
  * (judge r18 task 8 follow-up, r19): the ledger REPLACE rule keys on
  * the fingerprint, so any plan artifact that varies across JVMs or
  * core counts — typed-op lambda identities, env-adaptive repartition
  * counts — would let a contended pass REPLACE (ratchet up) floors of
  * untouched queries. Measured before the fix: 24 of 100 stamps flipped
  * between two runs of identical code. */
class PlanFingerprintSpec extends SparkSpec {

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Bench.planFingerprint(df, Seq("/root/testdata"))

  test("typed-op lambda identity does not change the fingerprint") {
    val base = spark.range(10).toDF("id")
    // two separate mapPartitions calls create two distinct lambda
    // OBJECTS (distinct identity hashes; across JVMs also distinct
    // class-load numbers) around identical logic
    def mapped() = base.mapPartitions(it => it.map(r => r.getLong(0) + 1))(
      Encoders.scalaLong).toDF("v")
    assert(fp(mapped()) === fp(mapped()))
  }

  test("repartition count is normalized (env-adaptive knob, not shape)") {
    val base = spark.range(10).toDF("id")
    assert(fp(base.repartition(4)) === fp(base.repartition(32)))
    import org.apache.spark.sql.functions.col
    assert(fp(base.repartition(4, col("id")))
      === fp(base.repartition(32, col("id"))))
  }

  test("a logical-shape change still flips the fingerprint") {
    val base = spark.range(10).toDF("id")
    import org.apache.spark.sql.functions._
    assert(fp(base.groupBy("id").count())
      !== fp(base.groupBy("id").agg(sum("id"))))
    assert(fp(base.filter(col("id") > 1)) !== fp(base.filter(col("id") > 2)))
  }

  test("commutative operand order and comparison flips do not change it") {
    // canonicalization sorts commutative chains by child hashCodes, and
    // chains embedding a java.lang.Class reference sort by IDENTITY
    // hashes that differ per JVM — the two lines below are the actual
    // pipe_curation flip observed between two full bench passes
    val a = "Filter (multicommutativeop(f(x), g(y), class Add) > greatest(h(z)))"
    val b = "Filter (greatest(h(z)) < multicommutativeop(g(y), f(x), class Add))"
    assert(Bench.md5Prefix16(Bench.normalizePlanText(a, Nil))
      === Bench.md5Prefix16(Bench.normalizePlanText(b, Nil)))
    // but adding/removing/altering a token still flips it
    val c = "Filter (multicommutativeop(f(x), g(w), class Add) > greatest(h(z)))"
    assert(Bench.md5Prefix16(Bench.normalizePlanText(a, Nil))
      !== Bench.md5Prefix16(Bench.normalizePlanText(c, Nil)))
  }

  test("SF paths normalize away") {
    // same logical source read under two different path spellings must
    // hash equal once both paths are normalized
    val a = spark.range(5).toDF("id")
    assert(Bench.planFingerprint(a, Seq("/x")) ===
      Bench.planFingerprint(a, Seq("/y")))
  }
}
