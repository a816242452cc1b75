package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared full-computation consumer for measurement mains (Bench,
  * ScaleCheck, profilers): hashing a struct of EVERY output column pins
  * every column-producing operator in the measured plan — a bare
  * `.count()` lets Catalyst prune unreferenced projections (and with
  * them entire window/compute stages; see PERF standing-rule-4 and the
  * round-9 bench note). Limitation, stated rather than hidden: the
  * query's final ORDER BY can still be elided — EliminateSorts removes
  * a sort under an order-insensitive aggregate — so measured cost is
  * "compute everything", not "compute and globally sort"; presentation
  * order is the one plan stage this harness does not charge for. */
object Measure {
  def consume(df: DataFrame): Long =
    // the % bounds each addend so the ANSI-mode sum can't overflow
    df.select((xxhash64(struct(df.columns.map(col): _*)) % 1000003L).as("__h"))
      // collect-bound: single aggregate row (the consume hash)
      .agg(sum("__h"), count(lit(1))).collect()(0).getLong(1)

  /** Full between-queries storage release for the measurement mains:
    * the SQL cache clear alone leaves RDD-level blocks behind —
    * localCheckpoint() blocks (pipe_pretrain_e2e's packing guard, the
    * CC frontier of whatever ran last) are NOT CacheManager entries,
    * so across a 234-query run (or repeat samples of one query in a
    * profiler JVM) they accumulate in block storage until driver GC
    * happens to collect the RDD — squeezing execution memory and
    * inflating later queries' spill. Measured (r18): four back-to-back
    * pipe_pretrain_e2e samples in one JVM read executor CPU
    * 63 → 152 → 162 → 157 s with only the SQL-cache clear; flat with
    * this release. Sequential call sites only (a concurrent clear
    * would release another thread's in-flight handle — the pre-warm
    * pool deliberately skips it, same as the old clearCache note).
    *
    * Contract on checkpointed RDDs (advisor r18): this unpersists
    * locally-checkpointed RDDs too, whose lineage is TRUNCATED — a
    * handle that survived into a LATER query would fail with
    * missing-block errors rather than recompute. That is deliberate
    * and safe under the registry convention the call sites enforce:
    * every query's persists/checkpoints are consumed within that
    * query's own consume() (nothing spans two registry queries — the
    * t_scrub_spans handle rule), so at call time every released block
    * is dead. Spark's per-RDD "cannot be recomputed after
    * unpersisting" WARNs at these sites are expected noise, not a
    * fault (quietKnownWarnings drops them in the profilers). */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
