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
    // per-query time = min of three runs (host-level noise on this VM is
    // ±30-100% between runs; the min approximates the uncontended cost).
    // A query that throws is reported as null (never a near-zero elapsed
    // time that would silently deflate the total) and logged to stderr.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAILURE $name: ${e.getMessage}")
            false
        }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      name -> (if (times.forall(_._1)) Some(times.map(_._2).min) else None)
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => k }
    val total = results.flatMap(_._2).sum
    val errs =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
