package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  * local[32] with 32 shuffle partitions to match the driver environment;
  * AQE (on by default) coalesces small shuffles at runtime.
  *
  * Measurement design (round 9 — budget-aware):
  *
  * Per-query time = min over up to two INTERLEAVED full passes (pass 1 runs
  * every query, then pass 2) PLUS, for queries whose interleaved min
  * exceeds WARM_CUTOFF, one back-to-back prime+measure repeat. Host-level
  * noise on this VM is ±30-100%; back-to-back repeats of one query all
  * land inside the same contention window, interleaved passes don't.
  * The back-to-back repeat exists because the registry (148+ queries) is
  * larger than Spark's fixed 100-entry generated-class cache: an
  * interleaved pass cycles the cache and every query pays codegen
  * COMPILATION again, inflating interleaved timings by the compile cost.
  * The repeat's prime run recompiles; the measure run immediately after
  * hits the still-warm cache, so its timing is pure execution. Sub-cutoff
  * queries skip the repeat: when a query's TOTAL (execution + compile) is
  * already under ~0.3 s, the compile share cannot distort the round
  * aggregate, and at 148 queries the repeats are the wall-clock majority.
  *
  * The whole run is TIME-BOXED (env SPARK_GRAFT_BENCH_BUDGET, seconds,
  * default 360): pass 1 always completes (every query needs at least one
  * timing — a missing number would read as a failure), but pass-2 queries
  * and the warm repeats are skipped per query from the moment the
  * cumulative measured wall exceeds the budget. Degrading precision beats
  * rc=124 with no numbers: round 8 lost its official perf signal exactly
  * that way. The emitted JSON records pass2_queries / warm_repeats /
  * budget so a degraded run is self-identifying.
  *
  * A query that throws is reported as null (never a near-zero elapsed time
  * that would silently deflate the total) and logged to stderr.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "360").toDouble
    val warmCutoff = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM_CUTOFF", "0.3").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    core.Logs.quietKnownWarnings()
    // session warm-up: JVM/codegen init is not a query cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    val benchStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchStart) / 1e9

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

    // Pass 1: mandatory, full registry — every query needs at least one
    // timing (a missing number would read as a failure downstream).
    val pass1 = names.map { case (name, fn) => name -> timeOne(name, fn) }
    val pass1Ok = pass1.collect { case (n, (true, _)) => n }.toSet
    // Pass 2: time-boxed PER QUERY — on a contended host pass 1 alone can
    // eat most of the budget, and a check only at the pass boundary would
    // still overshoot by a whole pass; queries cut here keep their pass-1
    // timing, so worst-case wall is pass1 + one query, not 2 × pass1.
    // Pass-1 failures are excluded: their result is null regardless (one
    // failed run poisons the min), so re-paying a slow failure's latency
    // would only eat budget that a healthy query's timing could use.
    val pass2 = names.flatMap { case (name, fn) =>
      if (elapsedSec >= budgetSec || !pass1Ok(name)) None
      else Some(name -> timeOne(name, fn))
    }

    def interleavedRuns(name: String): Seq[(Boolean, Double)] =
      (pass1 ++ pass2).collect { case (`name`, r) => r }

    // Warm repeats: slowest-first so if the budget cuts us off we spent the
    // remaining time where the compile-share distortion is largest.
    val interleavedMin: Map[String, Option[Double]] = names.map { case (name, _) =>
      val ts = interleavedRuns(name)
      name -> (if (ts.forall(_._1)) Some(ts.map(_._2).min) else None)
    }.toMap
    val warmCandidates = names
      .filter { case (n, _) => interleavedMin(n).exists(_ > warmCutoff) }
      .sortBy { case (n, _) => -interleavedMin(n).get }
    // Each candidate is admitted only if its PREDICTED pair cost (2× its
    // interleaved min — prime + measure) still fits the budget: checking
    // only "budget not yet spent" would admit the slowest query at
    // budget−ε and overshoot by two executions of it (slowest-first
    // maximizes exactly that). A skipped candidate doesn't stop the
    // loop — later, cheaper candidates may still fit.
    var warmDone = 0
    val warmPass: Map[String, (Boolean, Double)] = warmCandidates.flatMap {
      case (name, fn) =>
        if (elapsedSec + 2 * interleavedMin(name).get > budgetSec) None
        else {
          timeOne(name, fn) // prime: pays the recompile
          warmDone += 1
          Some(name -> timeOne(name, fn)) // measure: classes still cached
        }
    }.toMap

    val results = names.map { case (name, _) =>
      val times = interleavedRuns(name) ++ warmPass.get(name)
      name -> (if (times.forall(_._1)) Some(times.map(_._2).min) else None)
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => k }
    val total = results.flatMap(_._2).sum
    // noise ratio over the queries both passes measured: pass 1
    // additionally pays first-plan + codegen, so this ratio UPPER-bounds
    // contention (quiet host ≈ compile share only). The ratio compares
    // the same common subset so a budget-truncated pass 2 stays honest;
    // pass_totals reports the FULL pass-1 wall plus pass 2's (possibly
    // partial — see pass2_queries) wall.
    // null (not 1.0) when the budget expired before any pass-2 query: a
    // run with no second sample is exactly the one that must not read as
    // "perfectly quiet".
    val common = pass2.map(_._1).toSet
    val p1common = pass1.filter(kv => common(kv._1)).map(_._2._2).sum
    val p2sum = pass2.map(_._2._2).sum
    val noiseJson =
      if (p1common > 0 && p2sum > 0)
        f"${math.max(p1common, p2sum) / math.min(p1common, p2sum)}%.3f"
      else "null"
    val passTotals = Seq(pass1.map(_._2._2).sum) ++
      (if (pass2.nonEmpty) Seq(p2sum) else Seq.empty)
    val passJson = passTotals.map(t => f"$t%.3f").mkString("[", ",", "]")
    val errs =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errs,""" +
      s""""pass_totals":$passJson,"noise_ratio":$noiseJson,""" +
      s""""pass2_queries":${pass2.size},"warm_repeats":$warmDone,""" +
      s""""warm_candidates":${warmCandidates.size},""" +
      f""""budget_s":$budgetSec%.0f,"wall_s":$elapsedSec%.1f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
