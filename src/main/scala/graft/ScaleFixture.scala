package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized scale-fixture writer (judge r16 task 2): the
  * 10×/30×/100× ScaleCheck basis used to be an X-branch UNION of
  * key-shifted sf-table scans built lazily inside every entry — at
  * 100× each driver action re-paid 100 parquet scan setups, a stated
  * confound on every time exponent at the third scale point (PERF.md
  * r16). This main writes the SAME shifted union ONCE as a single
  * partitioned parquet table per source table; ScaleCheck then reads
  * the one table when `SPARK_GRAFT_SCALE_FIXTURE_DIR` points here
  * (falling back to the inline union otherwise), so measured walls
  * carry one scan setup like any production table. Row VALUES are
  * identical to the union basis by construction (same shift
  * transforms), so scale-stable outputs (winnow cluster counts, ann
  * cluster counts) must reproduce exactly — that equality is the
  * fixture's own correctness check, asserted in the journal runs.
  * This is also the production shape: a corpus is materialized once
  * and scanned many times, never re-derived per query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ScaleFixture <X> <outDir>
  * Writes <outDir>/{documents,embeddings,orders,lineitem}_x<X>.
  * Plain repartitioned parquet, NOT [[ops.Layout.writeBucketed]]: the
  * fixture's consumers are text/vector pipelines keyed on exploded
  * features, not equi-joins on the id — bucketing would buy zero
  * exchanges nowhere and cost a metastore table. */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <scaleX> <outDir>")
    val scaleX = args(0).toInt
    val outDir = args(1)
    require(scaleX >= 1, s"scaleX must be >= 1, got $scaleX")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    core.Logs.quietKnownWarnings()

    // the exact ScaleCheck shift transforms — the fixture IS the union,
    // materialized; any drift here would silently change every
    // downstream cluster count (the journal runs assert reproduction)
    def xN(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until scaleX).map(i => shift(df, i)).reduce(_.unionByName(_))

    def write(df: DataFrame, name: String): Unit = {
      val path = s"$outDir/${name}_x$scaleX"
      // 32 files at any X: one task per core on the read side; row
      // counts here stay well under what would need more ILP per file
      df.repartition(32).write.mode("overwrite").parquet(path)
      System.err.println(s"[fixture] wrote $path")
    }

    write(xN(core.Tables.fannedOut(spark, sfDir, "documents")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }, "documents")
    write(xN(core.Tables(spark, sfDir, "embeddings")) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .withColumn("label", col("label") + lit(i * 1000))
    }, "embeddings")
    write(xN(core.Tables.fannedOut(spark, sfDir, "orders")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
    }, "orders")
    write(xN(core.Tables.fannedOut(spark, sfDir, "lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
    }, "lineitem")
    spark.stop()
  }
}
