package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for `s8_sms_report_parse`'s round-over-round drift
  * (judge r12 what's-wrong 4): the query is synthesis (fanOut +
  * format_string behind the EvalBarrier) → 16-field regex parse →
  * grouped agg. Times each prefix so the drift attributes to a stage
  * instead of a guess. Usage: SPARK_GRAFT_SF_DIR=… runMain
  * graft.ProfileSms */
object ProfileSms {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    core.Logs.quietKnownWarnings()
    spark.range(1000000).selectExpr("sum(id)").collect()

    def lines = Tables_lines(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val samples = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f
        spark.sharedState.cacheManager.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[sms] $label%-28s ${samples.map(_._1).min}%6.2f s  (${samples.head._2} rows)")
    }
    time("synthesis only") { core.Measure.consume(lines) }
    time("synthesis+parse") {
      core.Measure.consume(ingest.SmsIngest.parseLines(lines))
    }
    time("full query (parse+agg)") {
      core.Measure.consume(queries.Registry.byName("s8_sms_report_parse")(
        spark, sfDir))
    }
    spark.stop()
  }

  private def Tables_lines(s: SparkSession, dir: String) =
    core.Tables.fannedOut(s, dir, "orders")
      .select(graft.functions.GraftExtensions.evalBarrier(format_string(
        "l%07d %05d TARGET%04d  AAA %02d 01 01 %s  %s %6.1f 2024.%03d:01:02:03 %s PSA  %s   1105  0     87  20735",
        col("o_orderkey") % 10000000, col("o_custkey") % 100000,
        col("o_custkey") % 10000, col("o_orderkey") % 100,
        when(col("o_orderkey") % 2 === 0, "FUV").otherwise("NUV"),
        when(col("o_orderkey") % 3 === 0, "TIME-TAG").otherwise("ACCUM   "),
        (col("o_totalprice") % 1000).cast("int").cast("double"),
        col("o_orderkey") % 365 + 1,
        when(col("o_orderkey") % 2 === 0, "HVNom ").otherwise("      "),
        when(col("o_orderkey") % 2 === 0, "G140L    -----  ")
          .otherwise("NCM1     MIRRORB"))).as("value"))
      .withColumn("filename", lit("/sms/123456aa.txt"))
}
