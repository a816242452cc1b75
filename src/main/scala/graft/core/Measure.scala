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
}
