package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * and flags the scale-critical properties — parquet filter pushdown,
  * column-pruned scans, broadcast joins, whole-stage codegen spans.
  * Usage: runMain graft.Explain [queryName ...] (default: headline set)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_project", "q1_agg", "j1_broadcast_join", "p9_anti_join",
        "j11_asof_lookup", "w1_rolling_mean_7d", "dedup_minhash_lsh")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val checks = Seq(
        "PushedFilters: [" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "WholeStageCodegen" -> plan.contains("WholeStageCodegen"),
        "full-column scan (no ReadSchema prune)" -> !plan.contains("ReadSchema"))
      println(s"---- audit[$name]: " + checks.collect { case (k, true) => k }.mkString(" | "))
    }
    spark.stop()
  }
}
