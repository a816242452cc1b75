package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality audit: declarative per-table constraints
  * (completeness, uniqueness, range, accepted values) evaluated in ONE
  * aggregation pass and reported as metric rows with pass/fail against a
  * threshold. The validation step a training-data pipeline runs before
  * consuming a corpus — and the shape matters at 100 TB: every metric is
  * an aggregate over the same scan, so `audit` is a single map-side-
  * combinable aggregation regardless of how many checks are declared
  * (uniqueness adds the one distinct-count shuffle).
  */
object Checks {

  /** One declared constraint: metric name, aggregate producing a double
    * in [0, 1] (or any score), and the minimum passing value. */
  final case class Check(metric: String, agg: Column, threshold: Double)

  /** Fraction of non-null values. */
  def completeness(c: String, threshold: Double = 1.0): Check =
    Check(s"completeness_$c",
      avg(when(col(c).isNotNull, 1.0).otherwise(0.0)), threshold)

  /** Distinct fraction of a (possibly composite) key: 1.0 = unique.
    * Composite keys count distinct STRUCT values — no separator encoding
    * (concatenation collides on embedded separators and silently skips
    * null components), and rows with null key parts still count as
    * values. The SQL twin is `COUNT(DISTINCT (a, b, ...))`. */
  def uniqueness(cols: Seq[String], threshold: Double = 1.0): Check =
    Check(s"uniqueness_${cols.mkString("_")}",
      countDistinct(struct(cols.map(col): _*)).cast("double") /
        count(lit(1)).cast("double"), threshold)

  /** Fraction of values inside [lo, hi]; nulls count as violations. */
  def inRange(c: String, lo: Double, hi: Double,
              threshold: Double = 1.0): Check =
    Check(s"range_$c",
      avg(when(col(c).between(lo, hi), 1.0).otherwise(0.0)), threshold)

  /** Fraction of values in the accepted set; nulls count as violations. */
  def inSet(c: String, values: Seq[String], threshold: Double = 1.0): Check =
    Check(s"accepted_$c",
      avg(when(col(c).isInCollection(values), 1.0).otherwise(0.0)), threshold)

  /** Evaluate all checks in one aggregation; returns
    * `(metric, value, passed)` rows ordered by metric. The single wide
    * agg row is unpivoted driver-free with a literal metric array +
    * posexplode. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    // two checks with one name (e.g. warn + error thresholds on the same
    // column) would make the unpivot's column references ambiguous —
    // construct Check directly with distinct metric names for that
    val dup = checks.groupBy(_.metric).collect { case (m, cs) if cs.size > 1 => m }
    require(dup.isEmpty,
      s"duplicate metric names: ${dup.mkString(", ")} — give each Check a distinct name")
    val wide = df.agg(checks.head.agg.as(checks.head.metric),
      checks.tail.map(c => c.agg.as(c.metric)): _*)
    val packed = array(checks.map(c =>
      struct(lit(c.metric).as("metric"),
        round(col(c.metric), 4).as("value"),
        (col(c.metric) >= c.threshold).as("passed"))): _*)
    wide.select(explode(packed).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"),
        col("m.passed").as("passed"))
      .orderBy("metric")
  }
}
