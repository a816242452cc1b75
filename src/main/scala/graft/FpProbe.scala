package graft

import org.apache.spark.sql.SparkSession

/** Plan-fingerprint stability probe (dev tool, r19): prints each named
  * query's [[Bench.planFingerprint]] twice — once fresh at session
  * start and once after consuming a mix of other queries the way the
  * bench would — so a fingerprint that depends on anything besides the
  * query's logical shape (JVM lambda identity, core-count-derived
  * partition counts, cache/session residue) shows up as a DIFF without
  * running a full WRITE_LEDGER pass. This is the tool that isolated
  * the 24-of-100 unstable stamps behind the r19 normalization fix;
  * keep it next to the fingerprint so a future stamp churn in
  * `bench_detail.json` `fp_changed` can be triaged in one run.
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   runMain graft.FpProbe name [name...]  (run twice, diff output)
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = args.toSeq
    def fpOf(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val s = Bench.planFingerprint(df, Seq(sfDir))
      core.Measure.releaseAll(spark)
      s
    }
    val fresh = targets.map(n => n -> fpOf(n)).toMap
    // consume a small mix, as the bench would between measurements
    Seq("q1_agg", "t_tfidf").foreach { n =>
      core.Measure.consume(SparkEntry.queries(n)(spark, sfDir))
      core.Measure.releaseAll(spark)
    }
    targets.foreach { n =>
      val again = fpOf(n)
      println(s"[fp] $n fresh=${fresh(n)} after=$again " +
        (if (fresh(n) == again) "SAME" else "DIFF"))
    }
    spark.stop()
  }
}
