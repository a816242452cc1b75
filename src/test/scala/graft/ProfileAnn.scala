package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Dev-only stage profiler for dedup_ann_e2e — not a spec. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.persist(); e.count()
    val planes = Similarity.portablePlanes(nBits = 8, dim = 64)
    val banded = e.select(col("vec_id"),
        explode(Similarity.lshBands(col("v"), planes, bandBits = 4,
          dotRound = 6)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("vec_id"))
    time("banded (md5 planes)")(banded.count())
    val planesN = Similarity.hyperplanes(nBits = 8, dim = 64)
    val bandedN = e.select(col("vec_id"),
        explode(Similarity.lshBands(col("v"), planesN, bandBits = 4))
          .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("vec_id"))
    time("banded (native planes)")(bandedN.count())
    val cand = banded.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("vec_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val nc = time("cand pairs")(cand.count())
    println(s"n_cand=$nc")
    val pairs = cand
      .join(e.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .filter(round(Similarity.cosine(col("va"), col("vb")), 3) >= 0.35)
      .select("id_a", "id_b")
    val np = time("verified pairs")(pairs.count())
    println(s"n_pairs=$np")
    val labeled = graft.ops.Graph.connectedComponents(pairs, "id_a", "id_b")
    time("connected components")(labeled.count())
    val exploded = labeled
      .join(e.select(col("vec_id").as("node"), col("v")), "node")
      .select(col("cluster"), col("node"), posexplode(col("v")).as(Seq("pos", "x")))
    val cent = exploded.groupBy("cluster", "pos").agg(avg("x").as("c"))
    val ctr = exploded.join(cent, Seq("cluster", "pos"))
      .groupBy("node", "cluster")
      .agg(sum(col("x") * col("c")).as("dotp"))
    time("centrality")(ctr.count())
    spark.stop()
  }
}
