package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  * local[32] with 32 shuffle partitions to match the driver environment;
  * AQE (on by default) coalesces small shuffles at runtime. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up: JVM/codegen init is not a query cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    // per-query time = min over three INTERLEAVED full passes (pass 1 runs
    // every query, then pass 2, then pass 3) PLUS one back-to-back repeat.
    // Host-level noise on this VM is ±30-100%; back-to-back repeats of one
    // query all land inside the same contention window, interleaved passes
    // don't — and the per-pass totals expose contention directly: a quiet
    // host gives near-equal pass totals (noise ≈ 1), a contended one a
    // visibly skewed ratio, so a noisy snapshot self-identifies instead of
    // reading as a regression. The back-to-back repeat exists because the
    // registry (112+ queries) is larger than Spark's fixed 100-entry
    // generated-class cache: an interleaved pass cycles the cache and every
    // query pays codegen COMPILATION again, inflating all three interleaved
    // timings by the compile cost. The repeat runs immediately after its
    // own pass-3 execution, so its generated classes are still cached and
    // the timing is pure execution; min over all four keeps whichever
    // measurement was quietest. A query that throws is reported as null
    // (never a near-zero elapsed time that would silently deflate the
    // total) and logged to stderr.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getMessage}")
          false
      }
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    val passes = (1 to 3).map { _ =>
      names.map { case (name, fn) => name -> timeOne(name, fn) }
    }
    // back-to-back pass: run each query twice IN A ROW and keep the second
    // timing — the first run re-compiles (the cache was cycled by the other
    // 111 queries since this query last ran), the second hits the cache
    val warmPass = names.map { case (name, fn) =>
      timeOne(name, fn) // prime: pays the recompile
      name -> timeOne(name, fn) // measure: generated classes still cached
    }
    val results = names.map { case (name, _) =>
      val times = passes.map(_.find(_._1 == name).get._2) :+
        warmPass.find(_._1 == name).get._2
      name -> (if (times.forall(_._1)) Some(times.map(_._2).min) else None)
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => k }
    val total = results.flatMap(_._2).sum
    val passTotals = passes.map(_.map(_._2._2).sum)
    // noise ratio over the WARM passes only (pass 1 also pays per-query
    // plan + codegen compilation, which is systematic, not contention)
    val warm = passTotals.drop(1)
    val noise = warm.max / warm.min
    val passJson = passTotals.map(t => f"$t%.3f").mkString("[", ",", "]")
    val errs =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errs,""" +
      f""""pass_totals":$passJson,"noise_ratio":$noise%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
