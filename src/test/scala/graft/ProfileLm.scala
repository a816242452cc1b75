package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Text

/** Dev-only stage profiler for the bigram LM chain. */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, dir, "documents")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("scan only")(docs.count())
      time("split size")(docs.select(size(split(col("text"), " ", -1))).agg(sum("size(split(text,  , -1))")).collect())
      val bg = docs.select(col("doc_id"),
        explode(Text.bigrams(split(col("text"), " ", -1))).as("b"))
        .select(col("doc_id"), col("b.a").as("a"), col("b.b").as("bb"))
      time("explode count")(bg.count())
      val dt = bg.groupBy(col("doc_id"), col("a"), col("bb"))
        .agg(count(lit(1)).as("n"))
        .withColumn("h2", xxhash64(col("a"), col("bb")))
        .withColumn("ha", xxhash64(col("a")))
      time("per-doc preagg")(dt.count())
      val c2 = dt.groupBy("h2").agg(sum("n").as("c2"),
        first("ha").as("ha"), first("a").as("a"), first("bb").as("bb"))
      time("c2")(c2.count())
      val c1 = c2.groupBy("ha").agg(sum("c2").as("c1"))
      val vocab = c2.select(explode(array(col("a"), col("bb"))).as("t"))
        .agg(countDistinct("t").as("v"))
      val model = c2.join(c1, Seq("ha")).crossJoin(broadcast(vocab))
        .select(col("h2"), log((col("c2") + 1).cast("double")
          / (col("c1") + col("v"))).as("lp"))
      time("model")(model.count())
      val out = dt.select(col("doc_id"), col("h2"), col("n"))
        .join(model, Seq("h2"))
        .groupBy("doc_id")
        .agg(sum("n").as("n_bigrams"),
          round(-(sum(col("n") * col("lp")) / sum("n")), 4).as("nll"))
      time("full")(out.count())
    }
    spark.stop()
  }
}
