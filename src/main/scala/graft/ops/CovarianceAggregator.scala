package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass covariance-matrix aggregator — the CPU-shape fast path beside
  * [[Similarity.covarianceMatrix]]'s oracled posexplode formulation.
  *
  * The explode path fans every row out into d² (pos, x·y) rows before the
  * partial hash aggregate; correct and oracle-portable, but at 100 TB the
  * fan-out itself is the dominant CPU cost. This Aggregator accumulates
  * the same moments (n, Σx_i, Σx_i·x_j upper triangle) in a primitive
  * double[] buffer instead. Because the buffer is a non-flat product
  * type, Catalyst plans it through ObjectHashAggregateExec, where the
  * buffer stays a LIVE OBJECT between updates (TypedImperativeAggregate
  * semantics) — each input row is one tight j≥i loop over primitive
  * arrays, no per-row serialization, no row fan-out, and partial
  * aggregation (map-side combine) applies like any builtin. Only the
  * merged ~(d²/2+d+1)-double buffers cross the wire: one per partition.
  *
  * Input rows must have exactly `dim` elements. Upper triangle only is
  * accumulated (x_i·x_j = x_j·x_i); `finish` mirrors it and applies the
  * biased (÷N) covariance formula, emitting the d² row-major matrix.
  * Summation order differs from the explode path across partitions, so
  * agreement is to FP round-off (~1e-13 relative), not bit-exact — this
  * is the rows-only twin; `sim_pca_cov` stays the hash-checked oracle.
  */
final class CovarianceAggregator(dim: Int)
    extends Aggregator[Array[Double], CovBuffer, Array[Double]] {

  override def zero: CovBuffer =
    CovBuffer(0L, new Array[Double](dim), new Array[Double](dim * (dim + 1) / 2))

  // triangular index of (i, j) with j >= i, row-major over the upper
  // triangle: rows before i contribute dim + (dim-1) + ... = i*dim - i(i-1)/2
  @inline private def tri(i: Int, j: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)

  override def reduce(b: CovBuffer, a: Array[Double]): CovBuffer = {
    require(a.length == dim,
      s"covariance input has length ${a.length}, expected $dim")
    val sums = b.sums; val prods = b.prods
    var i = 0
    var t = 0 // running triangular index == tri(i, i)
    while (i < dim) {
      val xi = a(i)
      sums(i) += xi
      var j = i
      while (j < dim) { prods(t) += xi * a(j); j += 1; t += 1 }
      i += 1
    }
    CovBuffer(b.n + 1, sums, prods)
  }

  override def merge(x: CovBuffer, y: CovBuffer): CovBuffer = {
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    var t = 0
    while (t < x.prods.length) { x.prods(t) += y.prods(t); t += 1 }
    CovBuffer(x.n + y.n, x.sums, x.prods)
  }

  override def finish(b: CovBuffer): Array[Double] = {
    val n = b.n.toDouble
    val out = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      val mi = b.sums(i) / n
      var j = i
      while (j < dim) {
        val c = b.prods(tri(i, j)) / n - mi * (b.sums(j) / n)
        out(i * dim + j) = c
        out(j * dim + i) = c
        j += 1
      }
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[CovBuffer] = Encoders.product[CovBuffer]
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

final case class CovBuffer(n: Long, sums: Array[Double], prods: Array[Double])
