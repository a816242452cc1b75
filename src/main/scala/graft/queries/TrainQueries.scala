package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Sampling, Similarity, Text}

/** Training-data pipeline operators, wave 2: exact duplicated-span
  * detection, corpus-trained bigram-LM perplexity, temperature-weighted
  * domain mixing, sliding-window chunking, heavy hitters, weighted
  * reservoir sampling, and distributed PCA (covariance + power
  * iteration). Every query here is fully oracled — the hash-keyed and
  * stochastic parts use the portable md5 hash family so DuckDB re-derives
  * the identical values.
  */
object TrainQueries {

  /** Power-iteration oracle, unrolled: DuckDB lacks aggregates in
    * recursive CTEs, so the fixed-iteration loop is GENERATED as a CTE
    * chain (q_t = C·p_{t−1}, p_t = q_t / ‖q_t‖) — the same trick a
    * macro would do, and it keeps Spark and the oracle on the exact same
    * arithmetic sequence. Every step is AS MATERIALIZED: the norm
    * subquery references q_t twice, so inlined CTEs would re-expand the
    * whole chain 2^iters times (observed: fd exhaustion from re-opened
    * parquet scans). */
  private val pcaIters = 20

  private val pcaPowerSql: String = {
    val base =
      """WITH v AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
        |m AS MATERIALIZED (SELECT i, AVG(x) AS m, COUNT(*) AS n FROM v GROUP BY i),
        |cm AS MATERIALIZED (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy
        |  FROM v a JOIN v b USING (vec_id) GROUP BY a.i, b.i),
        |cv AS MATERIALIZED (SELECT cm.i, cm.j, cm.sxy / ma.n - ma.m * mb.m AS c
        |  FROM cm JOIN m ma ON ma.i = cm.i JOIN m mb ON mb.i = cm.j),
        |p0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(64.0) AS val FROM m)""".stripMargin
    val steps = (1 to pcaIters).map { t =>
      s""",
         |q$t AS MATERIALIZED (SELECT cv.i AS i, SUM(cv.c * p${t - 1}.val) AS val
         |  FROM cv JOIN p${t - 1} ON p${t - 1}.i = cv.j GROUP BY cv.i),
         |p$t AS MATERIALIZED (SELECT i, val / (SELECT sqrt(SUM(val * val)) FROM q$t) AS val
         |  FROM q$t)""".stripMargin
    }.mkString
    val fin =
      s""",
         |qf AS MATERIALIZED (SELECT cv.i AS i, SUM(cv.c * p$pcaIters.val) AS val
         |  FROM cv JOIN p$pcaIters ON p$pcaIters.i = cv.j GROUP BY cv.i),
         |eig AS MATERIALIZED (SELECT SUM(p$pcaIters.val * qf.val) AS e
         |  FROM p$pcaIters JOIN qf USING (i))
         |SELECT p$pcaIters.i - 1 AS i, ROUND(p$pcaIters.val, 4) + 0.0 AS loading,
         |  ROUND((SELECT e FROM eig), 4) + 0.0 AS eigval
         |FROM p$pcaIters ORDER BY i""".stripMargin
    base + steps + fin
  }

  def qs: Seq[Q] = Seq(

    // Exact duplicated-span detection (Lee et al.'s substring dedup at
    // fixed 5-token granularity): a span is "duplicated" when it occurs
    // in ≥2 distinct documents. Only 8-byte span hashes ever shuffle.
    Q("dedup_span_ngrams",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sp AS (SELECT doc_id,
        |    ('0x' || substr(md5(array_to_string(
        |      list_slice(toks, i, i + 4), ' ')), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, toks,
        |      unnest(generate_series(1, len(toks) - 4)) AS i FROM t)),
        |dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM sp GROUP BY doc_id),
        |dd AS (SELECT doc_id, COUNT(*) AS n_dup_spans
        |  FROM sp JOIN dup USING (h) GROUP BY doc_id)
        |SELECT tot.doc_id, tot.n_spans, COALESCE(dd.n_dup_spans, 0) AS n_dup_spans,
        |  ROUND(CAST(COALESCE(dd.n_dup_spans, 0) AS DOUBLE) / tot.n_spans, 4)
        |    AS dup_ratio
        |FROM tot LEFT JOIN dd USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        Text.duplicatedSpanStats(Tables(s, dir, "documents"),
            "doc_id", "text", k = 5)
          .orderBy("doc_id")
    },

    // Corpus-trained add-one bigram-LM negative log-likelihood per doc —
    // the perplexity quality gate. The LM "training" IS the c2 aggregate.
    Q("t_lm_perplexity",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b2
        |  FROM (SELECT doc_id, toks,
        |      unnest(generate_series(1, len(toks) - 1)) AS i FROM t)),
        |c2 AS (SELECT a, b2, COUNT(*) AS n2 FROM bg GROUP BY a, b2),
        |c1 AS (SELECT a, SUM(n2) AS n1 FROM c2 GROUP BY a),
        |vv AS (SELECT COUNT(DISTINCT tok) AS v FROM
        |  (SELECT a AS tok FROM c2 UNION SELECT b2 FROM c2))
        |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(-AVG(LN(CAST(c2.n2 + 1 AS DOUBLE)
        |    / (c1.n1 + (SELECT v FROM vv)))), 4) AS nll
        |FROM bg JOIN c2 USING (a, b2) JOIN c1 USING (a)
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin) { (s, dir) =>
      Text.bigramNll(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Temperature-weighted domain mixture (α = 0.5 upsamples small
    // sources) with deterministic hash-based sampling at the computed
    // per-domain rates; budget 200 docs.
    Q("pipe_domain_mix",
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        |tw AS (SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS tw FROM c),
        |r AS (SELECT source, n_docs,
        |    sqrt(CAST(n_docs AS DOUBLE)) / (SELECT tw FROM tw) AS p,
        |    LEAST(1.0, 200.0 * (sqrt(CAST(n_docs AS DOUBLE)) / (SELECT tw FROM tw))
        |      / n_docs) AS rate
        |  FROM c),
        |smp AS (SELECT d.source, COUNT(*) AS n_sampled
        |  FROM documents d JOIN r USING (source)
        |  WHERE ((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      + 1) / power(2.0, 60)) < r.rate
        |  GROUP BY d.source)
        |SELECT r.source, r.n_docs, ROUND(r.p, 6) AS p, ROUND(r.rate, 6) AS rate,
        |  COALESCE(smp.n_sampled, 0) AS n_sampled
        |FROM r LEFT JOIN smp USING (source) ORDER BY source""".stripMargin) {
      (s, dir) =>
        val docs = Tables(s, dir, "documents")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        val rates = Sampling.mixtureRates(counts, "n_docs", alpha = 0.5,
          budget = 200)
        val sampled = Sampling
          .mixtureSample(docs.select("source", "doc_id"), "source", "doc_id", rates)
          .groupBy("source").agg(count(lit(1)).as("n_sampled"))
        rates.join(sampled, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            round(col("p"), 6).as("p"), round(col("rate"), 6).as("rate"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy("source")
    },

    // Sliding-window chunking: 40-token windows, stride 30 (10-token
    // overlap) — the fixed-context pre-tokenization step.
    Q("pipe_chunk_overlap",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |x AS (SELECT doc_id, toks, len(toks) AS n,
        |    unnest(generate_series(0, CASE WHEN len(toks) <= 40 THEN 0
        |      ELSE (len(toks) - 40 + 29) // 30 END)) AS c
        |  FROM t)
        |SELECT doc_id, c AS chunk_id, LEAST(n - c * 30, 40) AS chunk_tokens,
        |  md5(array_to_string(list_slice(toks, c * 30 + 1, c * 30 + 40), ' '))
        |    AS chunk_md5
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(Text.chunkTokens(split(col("text"), " ", -1),
            window = 40, stride = 30)).as("c"))
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.chunk_tokens").as("chunk_tokens"),
          md5(col("c.chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    },

    // Corpus heavy hitters: exact token top-20 (deterministic
    // tie-break). One map-side-combinable aggregate + a 20-row limit.
    Q("t_heavy_hitters",
      """SELECT token, COUNT(*) AS n FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ", -1)).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(20)
    },

    // Weighted sample without replacement: Efraimidis–Spirakis top-3 per
    // language, weight = n_chars, deterministic via the md5 uniform.
    Q("ext_weighted_sample",
      """WITH k AS (SELECT lang, doc_id,
        |    LN(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
        |      / power(2.0, 60))) / n_chars AS es_key
        |  FROM documents),
        |r AS (SELECT lang, doc_id, es_key,
        |    row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id)
        |      AS rk
        |  FROM k)
        |SELECT lang, doc_id, ROUND(es_key, 4) + 0.0 AS es_key, rk
        |FROM r WHERE rk <= 3 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      Sampling.weightedSample(Tables(s, dir, "documents"),
          "lang", "doc_id", "n_chars", k = 3)
        .select(col("lang"), col("doc_id"),
          // + 0.0 normalizes a rounded -0.0 (es_key is always negative,
          // so a near-zero key rounds to -0.0) — oracle applies the same
          (round(col("es_key"), 4) + lit(0.0)).as("es_key"), col("rk"))
        .orderBy("lang", "rk")
    },

    // Covariance matrix of the embedding column — ONE distributed pass,
    // d²-sized shuffle regardless of N (see Similarity.covarianceMatrix).
    Q("sim_pca_cov",
      """WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings),
        |m AS (SELECT i, AVG(x) AS m, COUNT(*) AS n FROM v GROUP BY i),
        |c AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy
        |  FROM v a JOIN v b USING (vec_id) GROUP BY a.i, b.i)
        |SELECT c.i - 1 AS i, c.j - 1 AS j,
        |  ROUND(c.sxy / ma.n - ma.m * mb.m, 6) + 0.0 AS cov
        |FROM c JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j
        |ORDER BY i, j""".stripMargin) { (s, dir) =>
      Similarity.covarianceMatrix(Tables(s, dir, "embeddings"), "embedding",
          dim = 64)
        .select(col("i"), col("j"),
          // + 0.0: off-diagonal covariances are signed, a tiny negative
          // rounds to -0.0 — normalize exactly as the oracle does
          (round(col("cov"), 6) + lit(0.0)).as("cov"))
        .orderBy("i", "j")
    },

    // Top principal component by power iteration: the d×d covariance is
    // data-size-independent, so the iteration runs on collected driver
    // state (32 KB) — the distributed work is the single covariance pass.
    Q("sim_pca_power", pcaPowerSql) { (s, dir) =>
      val covRows = Similarity
        .covarianceMatrix(Tables(s, dir, "embeddings"), "embedding", dim = 64)
        .collect()
      val c = Array.ofDim[Double](64, 64)
      covRows.foreach(r => c(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
      val (v, eig) = Similarity.powerIteration(c, pcaIters)
      // HALF_UP == both engines' ROUND; "+ 0.0" normalizes -0.0 (the
      // oracle applies the same) so near-zero loadings hash identically
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      import s.implicits._
      v.zipWithIndex.toSeq.map { case (l, i) => (i, r4(l), r4(eig)) }
        .toDF("i", "loading", "eigval").orderBy("i")
    }
  )
}
