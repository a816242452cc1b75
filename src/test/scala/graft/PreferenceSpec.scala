package graft

import org.apache.spark.sql.functions._
import graft.ops.Preference

/** Preference-data (RLHF/DPO) operators: pair assembly, pairwise games,
  * Bradley–Terry MM fit, exact best-of-n estimator. Hand-computed
  * oracles on tiny inputs; the DuckDB hash-compare covers sf-scale.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def pool(rows: (Long, Long, String, Double)*) =
    rows.toDF("pid", "id", "entity", "r")

  test("prefPairs picks extremes with deterministic tie-breaks") {
    val df = pool(
      // prompt 0: clear winner/loser
      (0L, 1L, "a", 0.9), (0L, 2L, "b", 0.5), (0L, 3L, "c", 0.1),
      // prompt 1: reward tie at the top -> lowest id chosen; tie at the
      // bottom -> highest id rejected
      (1L, 10L, "a", 0.8), (1L, 11L, "b", 0.8),
      (1L, 12L, "c", 0.2), (1L, 13L, "d", 0.2),
      // prompt 2: all tied -> no pair
      (2L, 20L, "a", 0.5), (2L, 21L, "b", 0.5),
      // prompt 3: single candidate -> no pair
      (3L, 30L, "a", 0.7))
    val out = Preference.prefPairs(df, "pid", "id", "r")
      .orderBy("prompt")
      .select("prompt", "n_cand", "chosen_id", "rejected_id", "margin")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 1L, 3L, 0.8),
      (1L, 4L, 10L, 13L, 0.6000000000000001)))
  }

  test("pairwiseGames drops same-entity and tied pairs") {
    val df = pool(
      (0L, 1L, "a", 0.9), (0L, 2L, "a", 0.1), // same entity: no game
      (0L, 3L, "b", 0.9),                     // ties doc 1: no game
      (1L, 4L, "a", 0.7), (1L, 5L, "b", 0.3))
    val games = Preference.pairwiseGames(df, "pid", "id", "entity", "r")
      .orderBy("winner", "loser")
      .as[(String, String)].collect().toSeq
    // doc1 vs doc3 tie drops; doc2(a,0.1) loses to doc3(b,0.9);
    // doc4(a,0.7) beats doc5(b,0.3)
    assert(games == Seq(("a", "b"), ("b", "a")))
  }

  test("btLeaderboard: two entities converge to wins/games exactly") {
    // a beats b 3 times, b beats a once: the 2-entity MM fixed point is
    // pi_a = w_a/n, reached after one round and stable under the next two
    val games = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"))
      .toDF("winner", "loser")
    val out = Preference.btLeaderboard(games, iters = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 3L, 4L, 0.75), ("b", 1L, 4L, 0.25)))
  }

  test("btLeaderboard: an unbeaten entity takes all the mass") {
    val games = Seq(("a", "b"), ("a", "b")).toDF("winner", "loser")
    val out = Preference.btLeaderboard(games, iters = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 2L, 2L, 1.0), ("b", 0L, 2L, 0.0)))
  }

  test("bestOfN: n=1 is the mean, n=N the max, monotone between") {
    val df = pool((0L, 1L, "a", 1.0), (0L, 2L, "b", 2.0), (0L, 3L, "c", 3.0))
    val out = Preference.bestOfN(df, "pid", "id", "r", ns = Seq(1, 2, 3))
      .orderBy("n").select("n", "n_cand", "bon")
      .as[(Int, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1, 2, 3))
    assert(out.forall(_._2 == 3L))
    assert(math.abs(out(0)._3 - 2.0) < 1e-12)         // mean
    // best-of-2 = (2*C(1,1) + 3*(C(2,1)... )) via weights 0, 1/3, 2/3
    assert(math.abs(out(1)._3 - (2.0 / 3 + 3.0 * 2 / 3)) < 1e-12)
    assert(math.abs(out(2)._3 - 3.0) < 1e-12)         // max
    assert(out(0)._3 <= out(1)._3 && out(1)._3 <= out(2)._3)
  }

  test("grpoAdvantage: standardized within pool, zero for all-tied") {
    val df = pool((0L, 1L, "a", 1.0), (0L, 2L, "b", 2.0), (0L, 3L, "c", 3.0),
      (1L, 10L, "a", 0.5), (1L, 11L, "b", 0.5))
    val out = Preference.grpoAdvantage(df, "pid", "r")
      .orderBy("id").select("id", "advantage")
      .as[(Long, Double)].collect().toSeq
    val e = 1.0 / math.sqrt(2.0 / 3.0) // (3-2)/sqrt(E[r^2]-4)
    assert(math.abs(out(0)._2 + e) < 1e-9)
    assert(math.abs(out(1)._2) < 1e-9)
    assert(math.abs(out(2)._2 - e) < 1e-9)
    assert(out(3)._2 == 0.0 && out(4)._2 == 0.0, "all-tied pool -> 0")
  }

  test("passAtK: closed-form cases, short-circuit, k > n omitted") {
    // pool 0: n=4, c=2 -> pass@1 = 1/2, pass@2 = 5/6, pass@4 -> 1
    // pool 1: n=2, c=0 -> 0 for k in {1, 2}; k=4 omitted
    val df = pool(
      (0L, 1L, "a", 1.0), (0L, 2L, "b", 1.0),
      (0L, 3L, "c", 0.0), (0L, 4L, "d", 0.0),
      (1L, 10L, "a", 0.0), (1L, 11L, "b", 0.0))
    val out = Preference.passAtK(df, "pid", col("r") > 0.5, ks = Seq(1, 2, 4))
      .orderBy("prompt", "k").select("prompt", "k", "pass_at_k")
      .as[(Long, Int, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2)) ==
      Seq((0L, 1), (0L, 2), (0L, 4), (1L, 1), (1L, 2)))
    assert(math.abs(out(0)._3 - 0.5) < 1e-12)
    assert(math.abs(out(1)._3 - 5.0 / 6) < 1e-12)
    assert(out(2)._3 == 1.0, "k > n - c with c > 0 short-circuits to 1")
    assert(out(3)._3 == 0.0 && out(4)._3 == 0.0, "no correct sample -> 0")
  }

  test("empty and singleton inputs degrade cleanly, never throw") {
    val empty = pool()
    assert(Preference.prefPairs(empty, "pid", "id", "r").count() == 0)
    assert(Preference.bestOfN(empty, "pid", "id", "r").count() == 0)
    assert(Preference.grpoAdvantage(empty, "pid", "r").count() == 0)
    assert(Preference.passAtK(empty, "pid", col("r") > 0.5).count() == 0)
    assert(Preference.btFromMatrix(
      Seq.empty[(String, String, Long)].toDF("winner", "loser", "w"))
      .count() == 0)
    val single = pool((0L, 1L, "a", 0.7))
    assert(Preference.prefPairs(single, "pid", "id", "r").count() == 0)
    val bon1 = Preference.bestOfN(single, "pid", "id", "r", ns = Seq(1, 2))
      .select("n", "bon").as[(Int, Double)].collect().toSeq
    assert(bon1 == Seq((1, 0.7)), "singleton pool: only n=1, bon = r")
    val adv1 = Preference.grpoAdvantage(single, "pid", "r")
      .select("advantage").as[Double].head()
    assert(adv1 == 0.0, "singleton pool: std 0 -> advantage 0")
  }

  test("bestOfN omits n > N and breaks reward ties by id") {
    val df = pool((0L, 1L, "a", 0.5), (0L, 2L, "b", 0.5))
    val out = Preference.bestOfN(df, "pid", "id", "r", ns = Seq(1, 2, 4))
      .orderBy("n").select("n", "bon")
      .as[(Int, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1, 2)) // n=4 impossible with N=2
    assert(out.forall(r => math.abs(r._2 - 0.5) < 1e-12))
  }
}
