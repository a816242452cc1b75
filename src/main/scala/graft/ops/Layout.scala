package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional physical layout: Z-ORDER (Morton) clustering, the
  * public Delta/Iceberg `OPTIMIZE ZORDER BY` lever re-expressed as a
  * plain Spark write-time job. A linear sort prunes file scans only on
  * its LEADING column; interleaving the bits of rank-quantized columns
  * gives every z-ordered column locality, so a range predicate on ANY
  * of them maps to a small fraction of the written files (min/max file
  * stats or partition ranges skip the rest).
  *
  * Scale shape: ONE approx-percentile sketch pass to learn per-column
  * bucket thresholds (driver state = cols × 2^bits doubles, data-size
  * independent — the `quantileBuckets` pattern), then a map-only
  * bucket+interleave expression and one range repartition on the
  * z-value. No window, no explode, no per-row driver involvement; the
  * range exchange is the same single shuffle any rewrite pays. */
object Layout {

  /** Quantile-rank bucket of `c` given ascending `thresholds` (the
    * 1/L..(L−1)/L cut points): the count of thresholds ≤ c — a pure
    * per-row fold over a literal array (codegen-friendly, no join).
    * Nulls land in bucket 0 (they sort first, clustered together). */
  def quantileBucket(c: Column, thresholds: Seq[Double]): Column =
    aggregate(lit(thresholds.toArray), lit(0L),
      (acc, t) => acc + when(t <= c, 1L).otherwise(0L))

  /** Morton z-value: interleave the low `bits` bits of each bucket
    * column, bit i of column c landing at position `i*ncols + c` (LSB
    * first). Pure integer arithmetic — stays in whole-stage codegen. */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1 && n * bits <= 63,
      s"z-value needs 1..63 total bits, got $n cols x $bits")
    buckets.zipWithIndex.flatMap { case (b, c) =>
      (0 until bits).map { i =>
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + c))
      }
    }.reduce(_ + _)
  }

  /** Cluster `df` for multi-dimensional scan pruning: learn per-column
    * quantile thresholds in one sketch pass, bucket each row, Morton-
    * interleave, then range-repartition + sort on the z-value. Write
    * the result as-is; each output file then covers a small z-range =
    * a small hyper-rectangle of the column space, so min/max file
    * skipping works for predicates on every z-ordered column.
    * `outPartitions` defaults to the session shuffle parallelism. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
               outPartitions: Int = 0): DataFrame = {
    val levels = 1 << bits
    val probs = (1 until levels).map(_.toDouble / levels)
    val thRow = df.select(cols.map(c =>
      percentile_approx(col(c).cast("double"),
        lit(probs.toArray), lit(10000)).as(c)): _*).head()
    val buckets = cols.indices.map { i =>
      quantileBucket(col(cols(i)).cast("double"), thRow.getSeq[Double](i))
    }
    val np =
      if (outPartitions > 0) outPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", zValue(buckets, bits))
      .repartitionByRange(np, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
