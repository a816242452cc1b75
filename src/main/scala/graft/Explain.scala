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
    if (args.headOption.contains("--audit-all")) {
      // one summary line per registered query: the shuffle/broadcast/scan
      // shape a reviewer needs to judge 100 TB readiness at a glance
      println("| query | exchanges | broadcasts | scans | pushed filters | full plan ok |")
      println("|---|---|---|---|---|---|")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          // tree nodes print as "Name (id)"; details as "(id) Name" —
          // match the tree form only so each operator counts once
          val nEx = "Exchange \\(\\d+\\)".r.findAllIn(plan).length
          val nBc = "BroadcastExchange \\(\\d+\\)".r.findAllIn(plan).length
          val nScan = "Scan parquet\\s+\\(\\d+\\)".r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).nonEmpty
          println(s"| $name | $nEx | $nBc | $nScan | $pushed | true |")
        } catch {
          case e: Throwable => println(s"| $name | - | - | - | - | ERROR ${e.getClass.getSimpleName} |")
        }
      }
      spark.stop(); return
    }
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
