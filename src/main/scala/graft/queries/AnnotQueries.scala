package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Annotate, Text}

/** Annotation / label-quality queries (round 15): the crowd-label half
  * of the preference-data pipeline — majority vote, Fleiss' kappa,
  * pairwise Cohen's kappa, Dawid–Skene EM aggregation, gold-question
  * scoring.
  *
  * Fixture: a deterministic synthetic crowd over `documents`. Item =
  * doc_id; true class index ci = portableHash("cls:"+id) % 3 (classes
  * c0/c1/c2); five workers w0..w4 with error rates 5/10/20/30/45 %,
  * each covering ~70% of items (coverage hash); an erring worker picks
  * a deterministic wrong class (ci + 1 + hash%2, mod 3). Every hash is
  * the portable md5-prefix form, so the whole labelling process replays
  * bit-identically in DuckDB. */
object AnnotQueries {

  /** DuckDB portable-hash snippet (Text.portableHash's SQL twin). */
  private def ph(x: String) =
    s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** Shared fixture CTEs: worker roster `wk(wid, err)`, true classes
    * `tru(item, ci)`, labels `lab(item, wid, lab)`. */
  private val labSql = {
    val hl = ph("'lab:' || w.wid || ':' || t.item::VARCHAR")
    s"""wk AS (SELECT * FROM (VALUES ('w0', 5), ('w1', 10), ('w2', 20),
       |    ('w3', 30), ('w4', 45)) v(wid, err)),
       |tru AS (SELECT doc_id AS item,
       |    ${ph("'cls:' || doc_id::VARCHAR")} % 3 AS ci FROM documents),
       |lab AS (SELECT t.item, w.wid,
       |    CASE WHEN $hl % 100 < w.err
       |      THEN 'c' || ((t.ci + 1 + $hl % 2) % 3)::VARCHAR
       |      ELSE 'c' || t.ci::VARCHAR END AS lab
       |  FROM tru t CROSS JOIN wk w
       |  WHERE ${ph("'cov:' || w.wid || ':' || t.item::VARCHAR")} % 10 < 7)"""
      .stripMargin
  }

  /** Spark twin of [[labSql]] — identical hash inputs, so both engines
    * synthesize the same label table. The worker roster is a 5-row
    * literal (broadcast cross join — per-item fan-out by a bounded
    * constant, no shuffle). */
  private[queries] def labels(s: SparkSession, dir: String): DataFrame = {
    val workers = s.createDataFrame(Seq(
      ("w0", 5), ("w1", 10), ("w2", 20), ("w3", 30), ("w4", 45)))
      .toDF("wid", "err")
    val hl = Text.portableHash(concat(lit("lab:"), col("wid"), lit(":"),
      col("item").cast("string")))
    val cov = Text.portableHash(concat(lit("cov:"), col("wid"), lit(":"),
      col("item").cast("string")))
    tru(s, dir).crossJoin(broadcast(workers))
      .filter(cov % 10 < 7)
      .select(col("item"), col("wid"),
        when(hl % 100 < col("err"),
          concat(lit("c"), ((col("ci") + 1 + hl % 2) % 3).cast("string")))
          .otherwise(concat(lit("c"), col("ci").cast("string"))).as("lab"))
  }

  /** (item, ci): the hidden true class index per document. */
  private def tru(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(col("doc_id").as("item"),
      (Text.portableHash(concat(lit("cls:"), col("doc_id").cast("string")))
        % 3).as("ci"))

  /** Gold subset: every 10th item's true class is audited. */
  private val goldSql =
    """gold AS (SELECT item, 'c' || ci::VARCHAR AS g FROM tru
      |  WHERE item % 10 = 0)""".stripMargin
  private def gold(s: SparkSession, dir: String): DataFrame =
    tru(s, dir).filter(col("item") % 10 === 0)
      .select(col("item"), concat(lit("c"), col("ci").cast("string")).as("g"))

  /** One Dawid–Skene EM round as SQL CTEs (mechanical generation, the
    * wordpieceCtes / UL2 pattern): from posterior table t$p build
    * prior `pr$r`, dense confusion `cf$r`, and the next posterior
    * `t$r`. α = 0.01, K = 3 ⇒ Kα = 0.03. The per-item normalization
    * window is bounded: exactly K = 3 class rows per item partition. */
  private def dsRound(r: Int): String = {
    val p = r - 1
    s"""s$r AS (SELECT c.cls, COALESCE(SUM(t.t), 0) AS s
       |  FROM cl c LEFT JOIN t$p t ON t.cls = c.cls GROUP BY c.cls),
       |pr$r AS (SELECT cls,
       |    (s + 0.01) / ((SELECT SUM(s) FROM s$r) + 0.03) AS pi FROM s$r),
       |nm$r AS (SELECT l.wid, t.cls, l.lab, SUM(t.t) AS num
       |  FROM lab l JOIN t$p t USING (item) GROUP BY l.wid, t.cls, l.lab),
       |dn$r AS (SELECT wid, cls, SUM(num) AS den FROM nm$r
       |  GROUP BY wid, cls),
       |cf$r AS (SELECT g.wid, g.cls, g.lab,
       |    (COALESCE(n.num, 0) + 0.01) / (COALESCE(d.den, 0) + 0.03) AS e
       |  FROM (SELECT w.wid, c1.cls, c2.cls AS lab FROM wkr w
       |      CROSS JOIN cl c1 CROSS JOIN cl c2) g
       |  LEFT JOIN nm$r n ON n.wid = g.wid AND n.cls = g.cls
       |    AND n.lab = g.lab
       |  LEFT JOIN dn$r d ON d.wid = g.wid AND d.cls = g.cls),
       |sc$r AS (SELECT l.item, c.cls, SUM(LN(c.e)) AS ll
       |  FROM lab l JOIN cf$r c ON c.wid = l.wid AND c.lab = l.lab
       |  GROUP BY l.item, c.cls),
       |p$r AS (SELECT s.item, s.cls, EXP(s.ll + LN(p.pi)) AS p
       |  FROM sc$r s JOIN pr$r p USING (cls)),
       |t$r AS (SELECT item, cls, p / SUM(p) OVER (PARTITION BY item) AS t
       |  FROM p$r)""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // Majority vote with a deterministic tie-break (most votes, ties →
    // smallest label). Two map-side-combinable aggregations; the oracle
    // replays the synthetic crowd and ranks per item.
    Q("t_majority_vote",
      s"""WITH $labSql,
        |cnt AS (SELECT item, lab, COUNT(*)::BIGINT AS v FROM lab
        |  GROUP BY item, lab),
        |nw AS (SELECT item, SUM(v)::BIGINT AS n_workers FROM cnt
        |  GROUP BY item),
        |r AS (SELECT item, lab, v, row_number() OVER (PARTITION BY item
        |    ORDER BY v DESC, lab) AS rn FROM cnt)
        |SELECT r.item, r.lab AS label, r.v AS n_votes, nw.n_workers
        |FROM r JOIN nw USING (item) WHERE rn = 1
        |ORDER BY item""".stripMargin) { (s, dir) =>
      Annotate.majorityVote(labels(s, dir), "item", "wid", "lab")
        .orderBy("item")
    },

    // Fleiss' kappa (1971), generalized unequal-raters form over the
    // item×class table: one agreement scalar for the whole crowd.
    // Entirely scalar aggregates + broadcast totals — no window.
    Q("t_fleiss_kappa",
      s"""WITH $labSql,
        |nij AS (SELECT item, lab, COUNT(*)::BIGINT AS v FROM lab
        |  GROUP BY item, lab),
        |per AS (SELECT item, SUM(v) AS n_i,
        |    (SUM(v * v) - SUM(v))::DOUBLE
        |      / (SUM(v) * (SUM(v) - 1))::DOUBLE AS p_i
        |  FROM nij GROUP BY item HAVING SUM(v) >= 2),
        |tot AS (SELECT COUNT(*)::BIGINT AS n_items,
        |    SUM(n_i)::BIGINT AS n_rated, AVG(p_i) AS p_bar FROM per),
        |pe AS (SELECT SUM((vc / nr) * (vc / nr)) AS p_e FROM (
        |  SELECT SUM(n.v)::DOUBLE AS vc,
        |      MIN((SELECT n_rated FROM tot))::DOUBLE AS nr
        |    FROM nij n JOIN per p USING (item) GROUP BY n.lab))
        |SELECT n_items, n_rated, ROUND(p_bar, 4) + 0 AS p_bar,
        |  ROUND(p_e, 4) + 0 AS p_e,
        |  ROUND((p_bar - p_e) / (1 - p_e), 4) + 0 AS kappa
        |FROM tot CROSS JOIN pe""".stripMargin) { (s, dir) =>
      Annotate.fleissKappa(labels(s, dir), "item", "lab")
        .select(col("n_items"), col("n_rated"),
          (round(col("p_bar"), 4) + lit(0)).as("p_bar"),
          (round(col("p_e"), 4) + lit(0)).as("p_e"),
          (round(col("kappa"), 4) + lit(0)).as("kappa"))
    },

    // Cohen's kappa per annotator pair over their shared items — the
    // rater-level agreement matrix (workers²-bounded output). The
    // fixture's per-pair p_e < 1 always (3 classes, mixed labels), but
    // the NULL-on-degenerate contract is mirrored on both sides.
    Q("t_pairwise_kappa",
      s"""WITH $labSql,
        |j AS (SELECT a.wid AS w_a, b.wid AS w_b, a.lab AS la, b.lab AS lb
        |  FROM lab a JOIN lab b ON a.item = b.item AND a.wid < b.wid),
        |base AS (SELECT w_a, w_b, COUNT(*)::BIGINT AS n_shared,
        |    AVG(CASE WHEN la = lb THEN 1.0 ELSE 0.0 END) AS p_o
        |  FROM j GROUP BY w_a, w_b),
        |ma AS (SELECT w_a, w_b, la, COUNT(*)::BIGINT AS ca FROM j
        |  GROUP BY w_a, w_b, la),
        |mb AS (SELECT w_a, w_b, lb, COUNT(*)::BIGINT AS cb FROM j
        |  GROUP BY w_a, w_b, lb),
        |pe AS (SELECT ma.w_a, ma.w_b, SUM(ma.ca * mb.cb) AS sprod
        |  FROM ma JOIN mb ON ma.w_a = mb.w_a AND ma.w_b = mb.w_b
        |    AND ma.la = mb.lb
        |  GROUP BY ma.w_a, ma.w_b)
        |SELECT b.w_a, b.w_b, b.n_shared, ROUND(b.p_o, 4) + 0 AS p_o,
        |  ROUND(pe.sprod::DOUBLE / (b.n_shared * b.n_shared)::DOUBLE, 4)
        |    + 0 AS p_e,
        |  CASE WHEN pe.sprod::DOUBLE / (b.n_shared * b.n_shared)::DOUBLE
        |      < 1.0 THEN
        |    ROUND((b.p_o - pe.sprod::DOUBLE
        |        / (b.n_shared * b.n_shared)::DOUBLE)
        |      / (1.0 - pe.sprod::DOUBLE
        |        / (b.n_shared * b.n_shared)::DOUBLE), 4) + 0 END AS kappa
        |FROM base b JOIN pe ON pe.w_a = b.w_a AND pe.w_b = b.w_b
        |ORDER BY b.w_a, b.w_b""".stripMargin) { (s, dir) =>
      Annotate.pairwiseKappa(labels(s, dir), "item", "wid", "lab")
        .select(col("w_a"), col("w_b"), col("n_shared"),
          (round(col("p_o"), 4) + lit(0)).as("p_o"),
          (round(col("p_e"), 4) + lit(0)).as("p_e"),
          (round(col("kappa"), 4) + lit(0)).as("kappa"))
        .orderBy("w_a", "w_b")
    },

    // Dawid–Skene (1979) EM, 2 unrolled rounds from the vote-proportion
    // start, α = 0.01 smoothing on the dense workers×K² confusion grid.
    // The oracle regenerates both EM rounds as CTEs (mechanical
    // generation, the UL2 pattern) and reduces to the MAP label per
    // item. Certifies that a consistently-wrong worker is down-weighted
    // below the careful ones without any gold supervision.
    Q("t_dawid_skene",
      s"""WITH $labSql,
        |cl AS (SELECT * FROM (VALUES ('c0'), ('c1'), ('c2')) v(cls)),
        |wkr AS (SELECT DISTINCT wid FROM lab),
        |ni AS (SELECT item, COUNT(*)::BIGINT AS n_i FROM lab
        |  GROUP BY item),
        |t0 AS (SELECT l.item, l.lab AS cls,
        |    COUNT(*)::DOUBLE / MIN(n.n_i)::DOUBLE AS t
        |  FROM lab l JOIN ni n USING (item) GROUP BY l.item, l.lab),
        |${dsRound(1)},
        |${dsRound(2)},
        |fin AS (SELECT item, cls, t, row_number() OVER (PARTITION BY item
        |    ORDER BY t DESC, cls) AS rn FROM t2)
        |SELECT item, cls AS label, ROUND(t, 4) + 0 AS posterior
        |FROM fin WHERE rn = 1 ORDER BY item""".stripMargin) { (s, dir) =>
      Annotate.dawidSkene(labels(s, dir), "item", "wid", "lab",
          Seq("c0", "c1", "c2"), iters = 2, alpha = 0.01)
        .select(col("item"), col("label"),
          (round(col("posterior"), 4) + lit(0)).as("posterior"))
        .orderBy("item")
    },

    // Gold-question scoring: per-worker accuracy on the audited subset.
    // The Spark side exercises the SPLIT the way production runs it —
    // two label batches' counts appended un-aggregated to the store,
    // accuracy refit on read (the winMatrix / btFromMatrix additive
    // convention) — while the oracle computes the same totals directly.
    Q("t_worker_gold",
      s"""WITH $labSql,
        |$goldSql
        |SELECT l.wid, COUNT(*)::BIGINT AS n_gold,
        |  SUM(CASE WHEN l.lab = g.g THEN 1 ELSE 0 END)::BIGINT
        |    AS n_correct,
        |  ROUND(SUM(CASE WHEN l.lab = g.g THEN 1 ELSE 0 END)::DOUBLE
        |    / COUNT(*)::DOUBLE, 4) + 0 AS acc
        |FROM lab l JOIN gold g USING (item)
        |GROUP BY l.wid ORDER BY wid""".stripMargin) { (s, dir) =>
      val lab = labels(s, dir)
      val g = gold(s, dir)
      // append-accumulated store: batch counts unioned without
      // re-aggregation; accFromGoldCounts re-aggregates on read
      val store = Annotate.goldCounts(lab.filter(col("item") % 2 === 0),
          g, "item", "wid", "lab", "item", "g")
        .unionAll(Annotate.goldCounts(lab.filter(col("item") % 2 =!= 0),
          g, "item", "wid", "lab", "item", "g"))
      Annotate.accFromGoldCounts(store)
        .select(col("wid"), col("n_gold"), col("n_correct"),
          (round(col("acc"), 4) + lit(0)).as("acc"))
        .orderBy("wid")
    })
}
