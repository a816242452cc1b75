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

  /** Portable (md5-family) minhash component j over a shingle array. */
  private def mdComp(sh: Column, j: Int): Column =
    aggregate(sh, lit(Long.MaxValue), (acc, sgl) =>
      least(acc, conv(substring(md5(concat(lit(s"$j "), sgl)), 1, 15), 16, 10)
        .cast("long")))

  /** `(id, sh)` (distinct shingle array) → `(id, j, bh)` LSH band hashes
    * of the md5 signature family — the ONE definition both [[flags]] and
    * [[mdCandidatePairs]] share, so the family cannot silently diverge
    * from the DuckDB twins that re-derive it. */
  private def bandHashes(withShingles: DataFrame, idCol: String,
                         numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val comps = (0 until numHashes).map(j => mdComp(col("sh"), j))
    withShingles.select(col(idCol), array(comps: _*).as("cs"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), j =>
          md5(concat_ws(",", transform(
            slice(col("cs"), j * r + 1, lit(r)), _.cast("string"))))))
          .as(Seq("j", "bh")))
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
    val dropped = banded.groupBy("j", "bh")
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
    val buckets = banded.groupBy("j", "bh")
      .agg(sort_array(collect_set(id)).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
    val pairFan = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    buckets.select(explode(pairFan).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
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
}
