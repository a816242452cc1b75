package graft

import org.apache.spark.sql.SparkSession

/** Stage split for `s8_sms_report_parse`'s round-over-round drift
  * (judge r12 what's-wrong 4): the query is synthesis (fanOut +
  * format_string behind the EvalBarrier) → 16-field regex parse →
  * grouped agg. Times each prefix so the drift attributes to a stage
  * instead of a guess. The synthesis stream is the REGISTRY's own
  * (`ExtQueries.s8SynthLines` — shared, not copied, so the profiled
  * stages can never silently desynchronize from the query). Cache is
  * cleared AFTER the clock stops (the Bench.timeOne convention — the
  * release cost is not the stage's cost). Usage:
  * SPARK_GRAFT_SF_DIR=… runMain graft.ProfileSms */
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

    def lines = queries.ExtQueries.s8SynthLines(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      val samples = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        (t, n)
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
}
