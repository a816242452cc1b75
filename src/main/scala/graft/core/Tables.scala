package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated star-schema tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. At 100 TB scale these
  * would be partitioned directories; the API is identical
  * (`spark.read.parquet` over a path), so nothing here changes.
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark's vectorized reader refuses ([PARQUET_TYPE_ILLEGAL]). We read
  * nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and convert
  * to a micros TimestampType with integer division — double-precision
  * division would lose precision on ~1e18 nanosecond epochs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.filter(f => f.name == "ts" && f.dataType == LongType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000"))))
  }

  /** Number of scan splits a table yields: parquet files under the path
    * (each test table is one single-row-group file → 1). Feeds
    * `Relational.fanOut` so CPU-dense stages repartition only when the
    * source genuinely under-splits. Filesystem metadata only — no Spark
    * planning. */
  def splitCount(dir: String, name: String): Int = {
    val p = new java.io.File(s"$dir/$name.parquet")
    if (p.isDirectory)
      Option(p.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(1).max(1)
    else 1
  }

  /** Load + fan out in one call for CPU-dense pipelines. */
  def fannedOut(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.ops.Relational.fanOut(apply(spark, dir, name), splitCount(dir, name))
}
