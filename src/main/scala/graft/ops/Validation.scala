package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TFDV-style data validation with a LEARNED reference (the train/serve
  * split of [[Checks]]' fixed declarative constraints): profile a
  * reference batch once into a stored, model-sized artifact, then
  * validate every arriving batch against the store — schema-stats skew
  * (per-column bounds / null fraction / unseen category values) and
  * token-distribution drift (Jensen–Shannon divergence against a stored
  * reference histogram).
  *
  * Published canon: TensorFlow Data Validation's skew/drift comparators
  * (Polyzotis et al., "Data Validation for Machine Learning", MLSys
  * 2019); JS divergence as the symmetric bounded drift measure.
  *
  * Scale shape: the profile is one wide aggregation pass (column-count
  * many aggregates over one scan — map-side combinable, like
  * [[Checks.audit]]); the stored artifacts are model-sized (columns ×
  * stats; vocabulary histogram). Validation is the same one-pass
  * aggregate on the arriving batch plus a broadcast-sized comparison
  * join; drift is one token explode + a vocab×groups-bounded term grid.
  * Nothing scales with reference-corpus size at serving time.
  */
object Validation {

  /** Per-column numeric profile of a reference batch — the STORED
    * SCHEMA: `(column, ref_min, ref_max, ref_null_frac)` one row per
    * column, from ONE aggregation pass. Null-only columns profile as
    * (null, null, 1.0) and any arriving non-null value then reads as a
    * bound breach — the desired alarm for a dead reference column. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        avg(when(col(c).isNull, 1.0).otherwise(0.0)).as(s"__nf_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(lit(c).as("column"),
      col(s"__min_$c").as("ref_min"), col(s"__max_$c").as("ref_max"),
      col(s"__nf_$c").as("ref_null_frac")))
    wide.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** Validate an arriving batch against a stored [[numericProfile]]:
    * re-profiles the batch with the same one-pass aggregate, joins the
    * two model-sized profiles on column, and emits one row per
    * (column, stat) with the reference value, arriving value, and an ok
    * flag — `min`/`max` must stay inside the reference bounds widened
    * by `tol` × the reference range (TFDV's range slack), `null_frac`
    * must not exceed the reference fraction by more than `nullSlack`.
    * Exactly-equal bounds pass at tol = 0. */
  def validateNumeric(arriving: DataFrame, profile: DataFrame,
                      cols: Seq[String], tol: Double = 0.0,
                      nullSlack: Double = 0.0): DataFrame = {
    val arr = numericProfile(arriving, cols)
      .withColumnRenamed("ref_min", "arr_min")
      .withColumnRenamed("ref_max", "arr_max")
      .withColumnRenamed("ref_null_frac", "arr_null_frac")
    val j = profile.join(arr, Seq("column"))
      .withColumn("__range", col("ref_max") - col("ref_min"))
    // a NULL comparison (null-only reference column, or an arriving
    // batch with no values) must still produce a BOOLEAN verdict: a
    // value arriving where the reference had none is the documented
    // alarm (ok = false), and no arriving values is trivially ok —
    // both covered by coalescing to "did nothing arrive?"
    def row(stat: String, ref: Column, a: Column, ok: Column) =
      struct(lit(stat).as("stat"), ref.as("ref_value"), a.as("arr_value"),
        coalesce(ok, a.isNull).as("ok"))
    j.select(col("column"), explode(array(
        row("min", col("ref_min"), col("arr_min"),
          col("arr_min") >= col("ref_min") - lit(tol) * col("__range")),
        row("max", col("ref_max"), col("arr_max"),
          col("arr_max") <= col("ref_max") + lit(tol) * col("__range")),
        row("null_frac", col("ref_null_frac"), col("arr_null_frac"),
          col("arr_null_frac") <= col("ref_null_frac") + lit(nullSlack))
      )).as("e"))
      .select(col("column"), col("e.stat").as("stat"),
        col("e.ref_value").as("ref_value"), col("e.arr_value").as("arr_value"),
        col("e.ok").as("ok"))
  }

  /** Categorical domain skew: values of `c` in the arriving batch that
    * the stored reference domain has never seen, with their row counts —
    * TFDV's unseen-category alarm. The domain is a distinct-values
    * table (model-sized for a true categorical column); the check is
    * one broadcast anti-join. */
  def unseenCategories(arriving: DataFrame, domain: DataFrame,
                       c: String): DataFrame =
    arriving.groupBy(col(c).as("value")).agg(count(lit(1)).as("n_rows"))
      .join(broadcast(domain.select(col(domain.columns.head).as("value"))),
        Seq("value"), "left_anti")

  /** Token histogram of a corpus slice — the stored reference for
    * [[jsDrift]]: `(token, cnt)`, vocabulary-bounded. */
  def tokenHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ", -1)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Per-group Jensen–Shannon divergence (base 2, in [0, 1]) between
    * each arriving group's token distribution and the stored reference
    * histogram: JS = ½ Σ p·log₂(2p/(p+q)) + ½ Σ q·log₂(2q/(p+q)) with
    * absent-side terms p=0 / q=0 contributing their closed-form limits.
    * The term grid is (union vocabulary × groups) — both model-sized —
    * built as reference-vocab × groups LEFT-joined with the arriving
    * counts UNIONed with arriving-only tokens (q>0, p=0), so no term is
    * silently dropped on either side. One token pass over the arriving
    * batch; the reference corpus is never rescanned. */
  def jsDrift(refHist: DataFrame, arriving: DataFrame, groupCol: String,
              textCol: String): DataFrame = {
    // The reference total stays IN-PLAN (advisor r14: the former eager
    // `agg().head` at plan-construction plus the lazy rescan computed
    // an inline-built reference histogram twice per invocation, against
    // the pipe_schema_validate 'no eager count' convention): one scalar
    // aggregate broadcast-crossed back — the X4 pattern. NOT a
    // whole-table window: refHist is raw vocabulary. The
    // empty-reference guard moves in-plan too, riding the per-group
    // `total` value every output row consumes (the explodeArrays
    // guard-inside-a-consumed-expression rule, so column pruning cannot
    // drop it): an empty reference raises loudly at execution instead
    // of silently scoring every arriving token as novel.
    val tot = refHist.agg(sum("cnt").cast("double").as("__reftot"))
    val ref = refHist.crossJoin(broadcast(tot))
      .select(col("token"), (col("cnt") / col("__reftot")).as("p"))
    val arrCnt = arriving
      .select(col(groupCol).as("grp"),
        explode(split(col(textCol), " ", -1)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("grp", "token").agg(count(lit(1)).as("cnt"))
    val arrTotals = arrCnt.groupBy("grp").agg(sum("cnt").as("__t"))
      .crossJoin(broadcast(tot))
      .select(col("grp"),
        when(col("__reftot") > 0, col("__t"))
          .otherwise(raise_error(
            lit("jsDrift: reference histogram is empty")).cast("long"))
          .as("total"))
    val arr = arrCnt.join(arrTotals, "grp")
      .select(col("grp"), col("token"),
        (col("cnt") / col("total")).as("q"), col("total"))
    // grid part 1: every (group, ref-vocab token), arriving q where
    // present; part 2: arriving-only tokens (absent from the reference)
    val grid1 = arrTotals.select(col("grp"), col("total"))
      .crossJoin(broadcast(ref))
      .join(arr.select(col("grp"), col("token"), col("q")),
        Seq("grp", "token"), "left")
      .na.fill(0.0, Seq("q"))
    val grid2 = arr.join(broadcast(ref.select("token")), Seq("token"),
        "left_anti")
      .select(col("grp"), col("token"), lit(0.0).as("p"), col("q"),
        col("total"))
    val terms = grid1.select(col("grp"), col("token"), col("p"), col("q"),
        col("total"))
      .unionByName(grid2)
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .withColumn("term",
        when(col("p") > 0, col("p") * log2(col("p") / col("m")) / 2.0)
          .otherwise(0.0) +
        when(col("q") > 0, col("q") * log2(col("q") / col("m")) / 2.0)
          .otherwise(0.0))
    terms.groupBy("grp")
      .agg(max("total").as("n_tokens"), sum("term").as("js"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("js"))
  }
}
