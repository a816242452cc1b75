package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A11 `fit_line` as a typed Aggregator (reference:
  * cosmo/monitor_helpers.py:28–32, np.polyfit deg 1) — the
  * `Aggregator[IN, BUF, OUT]` route from SURVEY.md §7.3 for when a typed
  * Dataset pipeline wants the fit without dropping to SQL expressions.
  * Accumulates the five OLS moments; merge is associative, so partial
  * (map-side) aggregation applies like any builtin.
  *
  * The declarative route (`Stats.linFit` via regr_slope/regr_intercept)
  * stays the default — this exists for the typed API surface and as the
  * pattern to extend for fits Spark lacks (weighted, robust).
  */
object LinFitAggregator
    extends Aggregator[(Double, Double), LinFitBuffer, LinFitResult] {

  override def zero: LinFitBuffer = LinFitBuffer(0L, 0.0, 0.0, 0.0, 0.0)

  override def reduce(b: LinFitBuffer, xy: (Double, Double)): LinFitBuffer = {
    val (x, y) = xy
    LinFitBuffer(b.n + 1, b.sx + x, b.sy + y, b.sxx + x * x, b.sxy + x * y)
  }

  override def merge(a: LinFitBuffer, b: LinFitBuffer): LinFitBuffer =
    LinFitBuffer(a.n + b.n, a.sx + b.sx, a.sy + b.sy,
      a.sxx + b.sxx, a.sxy + b.sxy)

  override def finish(b: LinFitBuffer): LinFitResult = {
    val det = b.n * b.sxx - b.sx * b.sx
    if (b.n < 2 || det == 0.0) LinFitResult(b.n, None, None)
    else {
      val slope = (b.n * b.sxy - b.sx * b.sy) / det
      val intercept = (b.sy - slope * b.sx) / b.n
      LinFitResult(b.n, Some(slope), Some(intercept))
    }
  }

  override def bufferEncoder: Encoder[LinFitBuffer] = Encoders.product
  override def outputEncoder: Encoder[LinFitResult] = Encoders.product
}

final case class LinFitBuffer(n: Long, sx: Double, sy: Double,
                              sxx: Double, sxy: Double)
final case class LinFitResult(n: Long, slope: Option[Double],
                              intercept: Option[Double])
