package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Preference

/** Preference-data (RLHF/DPO) pipeline queries. Candidate pools are
  * synthesized deterministically from `documents`: prompt id =
  * `doc_id % 64` (64 pools of ~N/64 candidates each), entity = `source`
  * (the "model" that produced the candidate), reward = type-token ratio
  * (an exact integer-ratio double both engines compute bit-identically,
  * so strict-inequality game outcomes agree without tolerance).
  *
  * Published canon: DPO pair construction (Rafailov et al. 2023),
  * Bradley–Terry MM leaderboard (Hunter 2004), exact best-of-n reward
  * estimator (Nakano et al. 2021 appendix).
  */
object PrefQueries {

  /** Shared candidate-pool CTE: (pid, doc_id, source, r). */
  private val candSql =
    """c AS (SELECT doc_id % 64 AS pid, doc_id, source,
      |    len(list_distinct(string_split(text, ' ')))::DOUBLE
      |      / len(string_split(text, ' ')) AS r
      |  FROM documents)""".stripMargin

  private def candidates(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "documents")
      .select((col("doc_id") % 64).as("pid"), col("doc_id"), col("source"),
        Preference.ttrReward(col("text")).as("r"))

  val qs: Seq[Q] = Seq(

    // DPO preference-pair assembly: per prompt pool, chosen = best
    // reward (ties → lowest id), rejected = worst reward (ties →
    // highest id); all-tied pools drop. One max_by/min_by aggregation —
    // no window, no self-join. The margin is a PER-ROW difference of
    // exact integer-ratio doubles — token counts can be powers of two,
    // so the exact value can land on a 5th-decimal 5 (the
    // decimal-vs-binary rounding tie) — hence the tie-proof
    // floor(x·10⁴+0.5)/10⁴ form on both sides (identical scalars in
    // identical order ⇒ bit-portable).
    Q("pipe_pref_pairs",
      s"""WITH $candSql,
        |ch AS (SELECT pid, doc_id, r, row_number() OVER (PARTITION BY pid
        |    ORDER BY r DESC, doc_id) AS rn FROM c),
        |rj AS (SELECT pid, doc_id, r, row_number() OVER (PARTITION BY pid
        |    ORDER BY r, doc_id DESC) AS rn FROM c),
        |n AS (SELECT pid, COUNT(*)::BIGINT AS n_cand FROM c GROUP BY pid)
        |SELECT n.pid AS prompt, n.n_cand, ch.doc_id AS chosen_id,
        |  rj.doc_id AS rejected_id,
        |  FLOOR((ch.r - rj.r) * 10000.0 + 0.5) / 10000.0 AS margin
        |FROM n JOIN ch ON ch.pid = n.pid AND ch.rn = 1
        |  JOIN rj ON rj.pid = n.pid AND rj.rn = 1
        |WHERE n.n_cand >= 2 AND ch.r > rj.r
        |ORDER BY prompt""".stripMargin) { (s, dir) =>
      Preference.prefPairs(candidates(s, dir), "pid", "doc_id", "r")
        .select(col("prompt"), col("n_cand"), col("chosen_id"),
          col("rejected_id"),
          (floor(col("margin") * 10000.0 + 0.5) / 10000.0).as("margin"))
        .orderBy("prompt")
    },

    // Bradley–Terry leaderboard: within-pool pairwise games between
    // candidates of different sources (higher TTR wins; exact reward
    // ties drop), aggregated to the entity² win matrix, fitted with 3
    // unrolled Hunter-MM rounds from a uniform start, renormalized each
    // round. The oracle replays pool → games → matrix → 3 MM rounds in
    // SQL; only the fitted strength is float-summed (19 terms), so
    // round4+0 absorbs summation-order noise while wins/games stay
    // integer-exact. Ordered by entity (unique) — the leaderboard rank
    // is derivable from the strength column.
    Q("t_bt_fit",
      s"""WITH $candSql,
        |g AS (SELECT CASE WHEN a.r > b.r THEN a.source ELSE b.source END
        |    AS winner,
        |    CASE WHEN a.r > b.r THEN b.source ELSE a.source END AS loser
        |  FROM c a JOIN c b ON a.pid = b.pid AND a.doc_id < b.doc_id
        |    AND a.source <> b.source AND a.r <> b.r),
        |nm AS (SELECT winner AS e1, loser AS e2, COUNT(*)::BIGINT AS w
        |  FROM g GROUP BY 1, 2),
        |ents AS (SELECT DISTINCT e1 AS e FROM (
        |  SELECT e1 FROM nm UNION ALL SELECT e2 FROM nm)),
        |wt AS (SELECT ents.e, COALESCE(SUM(nm.w), 0)::BIGINT AS w
        |  FROM ents LEFT JOIN nm ON nm.e1 = ents.e GROUP BY ents.e),
        |nn AS (SELECT e1, e2, SUM(w)::BIGINT AS n FROM (
        |    SELECT e1, e2, w FROM nm
        |    UNION ALL SELECT e2 AS e1, e1 AS e2, w FROM nm)
        |  GROUP BY e1, e2),
        |p0 AS (SELECT e, 1.0 / (SELECT COUNT(*) FROM ents) AS p FROM ents),
        |r1 AS (SELECT nn.e1 AS e, MIN(wt.w) / SUM(nn.n / (pi.p + pj.p)) AS v
        |  FROM nn JOIN p0 pi ON pi.e = nn.e1 JOIN p0 pj ON pj.e = nn.e2
        |    JOIN wt ON wt.e = nn.e1 GROUP BY nn.e1),
        |p1 AS (SELECT e, v / (SELECT SUM(v) FROM r1) AS p FROM r1),
        |r2 AS (SELECT nn.e1 AS e, MIN(wt.w) / SUM(nn.n / (pi.p + pj.p)) AS v
        |  FROM nn JOIN p1 pi ON pi.e = nn.e1 JOIN p1 pj ON pj.e = nn.e2
        |    JOIN wt ON wt.e = nn.e1 GROUP BY nn.e1),
        |p2 AS (SELECT e, v / (SELECT SUM(v) FROM r2) AS p FROM r2),
        |r3 AS (SELECT nn.e1 AS e, MIN(wt.w) / SUM(nn.n / (pi.p + pj.p)) AS v
        |  FROM nn JOIN p2 pi ON pi.e = nn.e1 JOIN p2 pj ON pj.e = nn.e2
        |    JOIN wt ON wt.e = nn.e1 GROUP BY nn.e1),
        |p3 AS (SELECT e, v / (SELECT SUM(v) FROM r3) AS p FROM r3),
        |gm AS (SELECT e1 AS e, SUM(n)::BIGINT AS games FROM nn GROUP BY e1)
        |SELECT p3.e AS entity, wt.w AS wins, gm.games,
        |  ROUND(p3.p, 4) + 0 AS strength
        |FROM p3 JOIN wt ON wt.e = p3.e JOIN gm ON gm.e = p3.e
        |ORDER BY entity""".stripMargin) { (s, dir) =>
      val games = Preference.pairwiseGames(candidates(s, dir),
        "pid", "doc_id", "source", "r")
      Preference.btLeaderboard(games, iters = 3)
        .select(col("entity"), col("wins"), col("games"),
          (round(col("strength"), 4) + lit(0)).as("strength"))
        .orderBy("entity")
    },

    // GRPO group-relative advantage (Shao et al. 2024): per pool,
    // (r − mean)/std with the population std written as √(E[r²]−E[r]²)
    // on BOTH sides so the arithmetic is stated identically; all-tied
    // pools (std 0) score 0. One window — no join. Per-candidate rows,
    // ordered by the unique doc_id.
    Q("pipe_grpo_advantage",
      s"""WITH $candSql,
        |st AS (SELECT pid, AVG(r) AS m,
        |    sqrt(GREATEST(AVG(r * r) - AVG(r) * AVG(r), 0.0)) AS s
        |  FROM c GROUP BY pid)
        |SELECT c.pid AS prompt, c.doc_id,
        |  ROUND(CASE WHEN st.s > 0 THEN (c.r - st.m) / st.s
        |        ELSE 0.0 END, 4) + 0 AS advantage
        |FROM c JOIN st ON st.pid = c.pid
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Preference.grpoAdvantage(candidates(s, dir), "pid", "r")
        .select(col("pid").as("prompt"), col("doc_id"),
          (round(col("advantage"), 4) + lit(0)).as("advantage"))
        .orderBy("doc_id")
    },

    // Unbiased pass@k (Chen et al. 2021 §2.1): correct = reward above
    // the corpus-median TTR (0.5 — both pass and fail populated in
    // every pool size), pass@k = 1 − Π (n−c−j)/(n−j) as the paper's
    // stable product form; k > n−c short-circuits to 1, k > n rows
    // omitted on both sides. pass@k values can be EXACT binary
    // fractions that tie at the 4th decimal (n=32, c odd ⇒ c/32 =
    // x.xxx25/…125 forms incl. 0.03125), where decimal-aware and
    // binary-double rounding diverge — so this query uses the
    // tie-proof floor(x·10⁴+0.5)/10⁴ form on BOTH sides (the
    // t_domain_overlap pattern): the per-row product is built from
    // identical scalars in identical order on both engines, so the
    // floored value is bit-portable.
    Q("t_pass_at_k",
      s"""WITH $candSql,
        |a AS (SELECT pid, COUNT(*)::BIGINT AS n,
        |    SUM(CASE WHEN r > 0.5 THEN 1 ELSE 0 END)::BIGINT AS c
        |  FROM c GROUP BY pid),
        |e AS (SELECT pid, n, c, t.k FROM a, unnest([1, 2, 4]) AS t(k)
        |  WHERE t.k <= n)
        |SELECT pid AS prompt, k, n, c,
        |  FLOOR((CASE WHEN c > 0 AND k > n - c THEN 1.0
        |    ELSE 1.0 - list_product([(n - c - j) / CAST(n - j AS DOUBLE)
        |      FOR j IN generate_series(0, k - 1)]) END)
        |    * 10000.0 + 0.5) / 10000.0 AS pass_at_k
        |FROM e ORDER BY prompt, k""".stripMargin) { (s, dir) =>
      Preference.passAtK(candidates(s, dir), "pid", col("r") > 0.5,
          ks = Seq(1, 2, 4))
        .select(col("prompt"), col("k"), col("n"), col("c"),
          (floor(col("pass_at_k") * 10000.0 + 0.5) / 10000.0)
            .as("pass_at_k"))
        .orderBy("prompt", "k")
    },

    // Exact best-of-n estimator: per pool, E[max reward of n uniform
    // draws without replacement] via the order-statistics identity
    // Σ_i r_(i)·(C(i,n)−C(i−1,n))/C(N,n), the binomial ratios computed
    // as ≤n-factor products (no gamma, no overflow) — n=1 is the pool
    // mean, n=N the pool max, the curve between is the best-of-n
    // scaling diagnostic. n > N rows are omitted on both sides.
    Q("pipe_best_of_n",
      s"""WITH $candSql,
        |rk AS (SELECT pid, r,
        |    row_number() OVER (PARTITION BY pid ORDER BY r, doc_id) AS i,
        |    COUNT(*) OVER (PARTITION BY pid) AS nc
        |  FROM c),
        |e AS (SELECT pid, r, i, nc, t.n FROM rk, unnest([1, 2, 4, 8])
        |    AS t(n) WHERE t.n <= nc)
        |SELECT pid AS prompt, n, MAX(nc)::BIGINT AS n_cand,
        |  ROUND(SUM(r * (
        |    (CASE WHEN i < n THEN 0.0 ELSE list_product(
        |      [(i - k) / CAST(nc - k AS DOUBLE)
        |       FOR k IN generate_series(0, n - 1)]) END) -
        |    (CASE WHEN i - 1 < n THEN 0.0 ELSE list_product(
        |      [(i - 1 - k) / CAST(nc - k AS DOUBLE)
        |       FOR k IN generate_series(0, n - 1)]) END))), 4) + 0 AS bon
        |FROM e GROUP BY pid, n ORDER BY prompt, n""".stripMargin) { (s, dir) =>
      Preference.bestOfN(candidates(s, dir), "pid", "doc_id", "r",
          ns = Seq(1, 2, 4, 8))
        .select(col("prompt"), col("n"), col("n_cand"),
          (round(col("bon"), 4) + lit(0)).as("bon"))
        .orderBy("prompt", "n")
    }
  )
}
