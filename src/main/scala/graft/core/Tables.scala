package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star-schema tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. At 100 TB scale these
  * would be partitioned directories; the API is identical
  * (`spark.read.parquet` over a path), so nothing here changes.
  *
  * Timestamp normalization: the generator has shipped `events.ts` both as
  * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader refuses with
  * [PARQUET_TYPE_ILLEGAL] — read as raw longs via
  * `spark.sql.legacy.parquet.nanosAsLong`, then integer-divide to micros;
  * double division would lose precision on ~1e18 nanosecond epochs) and as
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
  * TIMESTAMP_NTZ and which `unix_micros`/interval arithmetic reject. The
  * session timezone is pinned to UTC everywhere in this engine, so casting
  * NTZ → TIMESTAMP is a semantic no-op and keeps results byte-identical to
  * the DuckDB oracle (which treats the same column as a plain timestamp).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }
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
