package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Text

/** Dev-only: isolate the t_lm_interp 10× ScaleCheck entry (is the 50 s
  * reading real or run-order contention?). */
object ProfileLm2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def consume(df: DataFrame): Long = graft.core.Measure.consume(df)
    def x10(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 10).map(i => shift(df, i)).reduce(_.unionByName(_))
    val docs10 = x10(Tables.fannedOut(spark, dir, "documents")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val n = consume(Text.trigramNll(docs10, "doc_id", "text"))
      println(f"PASS $pass t_lm_interp 10x: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
