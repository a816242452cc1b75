package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Relational, Text}

/** Property tests for the operator invariants the reference pins with
  * table-driven cases (SURVEY.md §5): explode length contract, Jaccard
  * bounds, MinHash estimate behavior, upsert key-uniqueness. Raw
  * ScalaCheck generators with fixed seeds (the scalatest bridge artifact
  * is not in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).map(i => g.pureApply(params, Seed(seed + i)))
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"))

  test("explodeArrays: output rows = sum of array sizes; values aligned") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(0, 5)), 15).foreach { sizes =>
      val rows = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(_.toDouble), (0 until n).map(j => j * 10.0))
      }
      val df = rows.toDF("id", "x", "y")
      val out = Relational.explodeArrays(df, Seq("x", "y")).collect()
      assert(out.length == sizes.sum)
      out.foreach { r =>
        assert(r.getAs[Double]("y") == r.getAs[Double]("x") * 10.0)
      }
    }
  }

  test("jaccard is within [0,1], 1 on self, symmetric") {
    val cases = samples(Gen.zip(wordGen, wordGen), 15)
    val df = cases.toDF("a", "b")
    val out = df.select(
      Text.jaccard(col("a"), col("b")),
      Text.jaccard(col("b"), col("a")),
      Text.jaccard(col("a"), col("a")))
      .as[(Double, Double, Double)].collect()
    out.foreach { case (jab, jba, jaa) =>
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab == jba)
      assert(jaa == 1.0)
    }
  }

  test("as-of join: native equals a reference scan on random (key, time) data") {
    val pairGen = Gen.zip(Gen.chooseNum(0L, 6L), Gen.chooseNum(0L, 100L))
    (0 until 5).foreach { round =>
      val quotes = samples(pairGen, 60, seed = 1000L + round).distinct
        .map { case (k, t) => (k, t, k * 1000.0 + t) }
      val probes = samples(pairGen, 40, seed = 2000L + round).distinct
      val native = org.apache.spark.sql.graft.AsOfJoinApi.asOf(
        probes.toDF("k", "t"), quotes.toDF("k", "t", "v"),
        Seq("k"), "t", "v", "qv")
        .as[(Long, Long, Option[Double])].collect().toSet
      // reference semantics computed directly: max-time quote <= probe time
      val expected = probes.map { case (k, t) =>
        val q = quotes.filter(q => q._1 == k && q._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        (k, t, q)
      }.toSet
      assert(native == expected, s"round $round")
    }
  }

  test("minhash estimate: 1 on identical sets, 0 on disjoint sets") {
    val df = Seq(
      (Seq("a b", "b c", "c d"), Seq("a b", "b c", "c d")),
      (Seq("a b", "b c"), Seq("x y", "y z"))).toDF("s1", "s2")
    val out = df.select(
      Text.minhashJaccardEstimate(
        graft.functions.GraftExtensions.minhashSignature(col("s1"), 32),
        graft.functions.GraftExtensions.minhashSignature(col("s2"), 32)))
      .as[Double].collect()
    assert(out(0) == 1.0)
    assert(out(1) == 0.0)
  }

  test("upsert output is key-unique for arbitrary version collisions") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(1, 3)))
    samples(gen, 8).foreach { pairs =>
      val half = pairs.length / 2
      val t = pairs.take(half).map { case (k, v) => (k, v, "t") }
      val s = pairs.drop(half).map { case (k, v) => (k, v, "s") }
      if (t.nonEmpty && s.nonEmpty) {
        val out = graft.ops.MergeOps.upsert(
          t.toDF("k", "ver", "src"), s.toDF("k", "ver", "src"),
          Seq("k"), "ver")
        val keys = out.select("k").as[Int].collect()
        assert(keys.length == keys.distinct.length, "one row per key")
      }
    }
  }
}
