package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream (Cormode & Muthukrishnan): a
  * `depth × width` grid of counters where row j counts occurrences in
  * slot hash_j(token) mod width; the estimate for a token is the MIN over
  * rows of its slot counters — always ≥ the true count, over-counting
  * only by hash collisions (ε ≈ e/width of the stream length with
  * probability 1 − e^−depth).
  *
  * The 100 TB shape: the sketch is `depth·width` rows REGARDLESS of
  * corpus size — the groupBy partial-aggregates map-side and ships
  * sketch-sized partials, the same scale contract as the KMV/HLL
  * entries; estimates then need only a broadcast of the sketch. The
  * salted-md5 hash family is the repo's portable family, so an external
  * SQL engine re-derives the entire sketch and every estimate exactly.
  */
object Sketches {

  private def slots(tok: org.apache.spark.sql.Column, depth: Int, width: Int) = {
    require(depth >= 1 && width >= 1,
      s"cms needs depth, width >= 1 (got $depth x $width)")
    array((0 until depth).map { j =>
      struct(lit(j).as("j"),
        (Text.portableHash(concat(lit("cms" + j + ":"), tok)) % width)
          .cast("int").as("slot"))
    }: _*)
  }

  /** Build the sketch: one (j, slot) → count row per non-empty counter
    * (absent counters are zero). Input: one row per token OCCURRENCE. */
  def cmsSketch(df: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(slots(col(tokCol), depth, width)).as("__e"))
      .groupBy(col("__e.j").as("j"), col("__e.slot").as("slot"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for a set of DISTINCT tokens: min over the sketch
    * rows of the token's slot counter. The sketch side broadcasts
    * (depth·width rows); the token side stays distributed. */
  def cmsEstimate(tokens: DataFrame, tokCol: String, sketch: DataFrame,
                  depth: Int, width: Int): DataFrame =
    tokens.select(col(tokCol), explode(slots(col(tokCol), depth, width)).as("__e"))
      .select(col(tokCol), col("__e.j").as("j"), col("__e.slot").as("slot"))
      .join(broadcast(sketch), Seq("j", "slot"))
      .groupBy(tokCol).agg(min("c").as("cms_est"))
}
