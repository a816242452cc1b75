package graft

import org.apache.spark.sql.SparkSession

/** Per-query cost split: CONSTRUCTION (building the DataFrame — for
  * trainer-style queries this runs the bounded eager jobs: Lloyd
  * rounds, BPE/unigram merges, PCA power iteration, BM25 ranking
  * collects) vs EXECUTION (consuming the final plan). Distinguishes
  * "the input is re-scanned / the plan is heavy" (execution-side) from
  * "fixed driver-synchronous stage latency in the training loop"
  * (construction-side, amortizes at scale — the PageRank argument).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfileQ name [name…]
  * Each name runs `repeats` times (default 3, SPARK_GRAFT_PROFILE_N);
  * min of each phase is reported (cache cleared between runs, so every
  * sample is self-contained like a Bench number).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_PROFILE_N", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // registry-sized codegen cache (see Bench) — repeats run compile-free
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    core.Logs.quietKnownWarnings()
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          val samples = (1 to repeats).map { _ =>
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val t1 = System.nanoTime()
            core.Measure.consume(df)
            val t2 = System.nanoTime()
            core.Measure.releaseAll(spark)
            ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
          }
          val c = samples.map(_._1).min
          val e = samples.map(_._2).min
          println(f"[profile] $name%-28s construct $c%6.2f s  execute $e%6.2f s  (min of $repeats)")
      }
    }
    spark.stop()
  }
}
