package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Sampling, Text}

/** Contracts for the stride-scheduled mixture interleave (round 15):
  * the two-phase bucketed domain rank equals the naive per-domain
  * window at several bucket widths, prefix domain shares track the
  * weights within one stride, resume-by-virtual-time is exact, and
  * missing/non-positive weights fail loudly. */
class StrideOrderSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Long, doms: Int) =
    (0L until n).map(i => ("d" + (i % doms), i)).toDF("dom", "id")

  test("seededDomainRank equals the naive per-domain window rank") {
    val d = docs(300, 3)
    val h = Text.portableHash(concat(lit("s1:"), col("id").cast("string")))
    val naive = d.withColumn("__h", h)
      .withColumn("r", row_number().over(
        Window.partitionBy("dom").orderBy(col("__h"), col("id"))))
      .select("dom", "id", "r")
      .as[(String, Long, Int)].collect()
      .map(x => (x._1, x._2) -> x._3.toLong).toMap
    for (b <- Seq(2, 8, 64)) {
      val got = Sampling.seededDomainRank(d, "dom", "id", "s1", buckets = b)
        .select("dom", "id", "mix_r")
        .as[(String, Long, Long)].collect()
        .map(x => (x._1, x._2) -> x._3).toMap
      assert(got == naive, s"bucketed rank must equal naive at B=$b")
    }
  }

  test("strideOrder: prefix domain shares track the weights") {
    // two domains, 80 docs each, weights 3:1 — in any prefix cut at a
    // virtual time T the stride schedule admits floor(T·w_d) docs of
    // each domain, so shares match the weights to within one stride
    val d = (0L until 160L).map(i => (if (i < 80) "a" else "b", i))
      .toDF("dom", "id")
    val w = Seq(("a", 0.75), ("b", 0.25)).toDF("dom", "wt")
    val ordered = Sampling.strideOrder(d, "dom", "id", w)
      .orderBy("mix_v", "dom", "id")
      .select("dom").as[String].collect()
    val firstForty = ordered.take(40)
    val aShare = firstForty.count(_ == "a")
    assert(aShare >= 29 && aShare <= 31,
      s"expected ~30 of 40 from domain a, got $aShare")
    // and the whole order interleaves rather than blocking: domain b
    // must appear within the first stride (1/0.25 = 4 positions)
    assert(ordered.take(4).contains("b"))
  }

  test("strideOrder: resume by virtual time is an exact suffix") {
    val d = docs(90, 3)
    val w = Seq(("d0", 0.5), ("d1", 0.3), ("d2", 0.2)).toDF("dom", "wt")
    val full = Sampling.strideOrder(d, "dom", "id", w)
      .select("dom", "id", "mix_v")
      .as[(String, Long, Double)].collect().sortBy(r => (r._3, r._1, r._2))
    // checkpoint at a consumed virtual time with no tie straddling it
    val v0 = full(29)._3
    assert(full(29)._3 != full(30)._3, "fixture: distinct-v boundary")
    val consumed = full.takeWhile(_._3 <= v0).map(r => (r._1, r._2)).toSet
    val resumed = Sampling.strideOrder(d, "dom", "id", w)
      .filter(col("mix_v") > v0)
      .select("dom", "id").as[(String, Long)].collect().toSet
    assert(resumed == full.map(r => (r._1, r._2)).toSet -- consumed)
  }

  test("strideOrder rejects a weights frame wider than (domain, weight)") {
    // doremiWeights' (domain, n_tokens, excess, weight) shape: reading
    // the weight positionally would silently schedule by n_tokens
    val d = docs(10, 2)
    val wide = Seq(("d0", 100L, 0.2, 0.5), ("d1", 900L, 0.1, 0.5))
      .toDF("dom", "n_tokens", "excess", "weight")
    val e = intercept[IllegalArgumentException] {
      Sampling.strideOrder(d, "dom", "id", wide)
    }
    assert(e.getMessage.contains("exactly (domain, weight)"))
  }

  test("strideOrder fails loudly on missing or non-positive weights") {
    val d = docs(10, 2)
    val missing = Seq(("d0", 0.5)).toDF("dom", "wt")
    val e1 = intercept[Exception] {
      Sampling.strideOrder(d, "dom", "id", missing).collect()
    }
    assert(e1.getMessage.contains("no weight") ||
      e1.getCause != null)
    val zero = Seq(("d0", 0.5), ("d1", 0.0)).toDF("dom", "wt")
    val e2 = intercept[Exception] {
      Sampling.strideOrder(d, "dom", "id", zero).collect()
    }
    assert(e2.getMessage != null)
  }
}
