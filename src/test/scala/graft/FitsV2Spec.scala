package graft

import org.apache.spark.sql.functions._
import graft.ingest.Fits

/** DataSourceV2 FITS source over the reference's REAL data products:
  * row counts, value agreement with the per-file reader, column pruning
  * into the scan, per-file partitions. */
class FitsV2Spec extends SparkSpec {
  import spark.implicits._

  private val data = "/root/reference/tests/data"
  private val lampGlob = s"$data/*lampflash*"

  test("fits source reads one row per BINTABLE row across gzipped files") {
    val df = spark.read.format("fits")
      .option("hdu", 1).load(lampGlob)
    // 11 lampflash files (the reference's pinned count)
    assert(df.select("_file").distinct().count() == 11)
    // per-file row count equals that file's NAXIS2
    val first = df.filter(col("_file").endsWith("lb4c10niq_lampflash.fits.gz"))
    val bytes = Fits.gunzipIfNeeded(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$data/lb4c10niq_lampflash.fits.gz")))
    val n2 = Fits.parseHdus(bytes)(1).header("NAXIS2").toInt
    assert(first.count() == n2)
  }

  test("values agree with the per-file array reader") {
    val df = spark.read.format("fits")
      .option("hdu", 1).load(s"$data/lb4c10niq_lampflash.fits.gz")
    val v2 = df.select("SEGMENT", "SHIFT_DISP")
      .as[(String, Double)].collect()
    val legacy = Fits.exposures(spark, s"$data/lb4c10niq_lampflash.fits.gz",
      headerReq = Map.empty, tableReq = Map(1 -> Seq("SEGMENT", "SHIFT_DISP")))
      .select("SEGMENT", "SHIFT_DISP").head()
    val segs = legacy.getSeq[String](0)
    val shifts = legacy.getSeq[Double](1)
    assert(v2.map(_._1).toSeq == segs)
    assert(v2.map(_._2).toSeq == shifts)
  }

  test("column pruning reaches the scan; primary headers attach as columns") {
    val df = spark.read.format("fits")
      .option("hdu", 1).option("headers", "ROOTNAME,DETECTOR")
      .load(lampGlob)
      .select("SEGMENT", "SHIFT_DISP")
    val plan = df.queryExecution.executedPlan.toString
    // the scan description lists exactly the decoded columns
    assert(plan.contains("columns=[SEGMENT,SHIFT_DISP]"), plan)
    assert(!plan.contains("TIME"), plan)
    // header columns come back typed as strings per file
    val hdr = spark.read.format("fits")
      .option("hdu", 1).option("headers", "ROOTNAME,DETECTOR")
      .load(s"$data/lb4c10niq_lampflash.fits.gz")
      .select("ROOTNAME", "DETECTOR").distinct()
      .as[(String, String)].collect()
    assert(hdr.toSeq == Seq(("lb4c10niq", "NUV"))) // lb4c10niq is an NUV exposure
  }

  test("one input partition per file: scan parallelism matches file count") {
    val df = spark.read.format("fits")
      .option("hdu", 1).load(lampGlob)
    assert(df.rdd.getNumPartitions == 11)
  }

  test("file-level filter pushdown prunes whole files before decode") {
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.ingest.FitsScan]
      }.get
    val base = spark.read.format("fits")
      .option("hdu", 1).option("headers", "ROOTNAME,DETECTOR")
      .load(lampGlob)
    // _file predicate: only the named file's partition survives
    val one = base.filter(col("_file").endsWith("lb4c10niq_lampflash.fits.gz"))
    assert(scanOf(one).prunedPaths.size == 1)
    assert(one.rdd.getNumPartitions == 1)
    // header predicate: only FUV files' partitions survive, and results
    // match the unpruned row-level filter exactly
    val fuv = base.filter(col("DETECTOR") === "FUV")
    val scan = scanOf(fuv)
    assert(scan.pushed.nonEmpty, "header filter should push down")
    val nFuv = scan.prunedPaths.size
    assert(nFuv > 0 && nFuv < 11, s"pruned to $nFuv of 11")
    val viaPrune = fuv.groupBy("ROOTNAME").count().collect().toSet
    val viaRows = base.collect().filter(_.getAs[String]("DETECTOR") == "FUV")
      .groupBy(_.getAs[String]("ROOTNAME")).map { case (r, xs) =>
        org.apache.spark.sql.Row(r, xs.length.toLong) }.toSet
    assert(viaPrune == viaRows)
  }

  test("the v2 scan feeds the OSM shift pipeline end-to-end") {
    val perRow = spark.read.format("fits")
      .option("hdu", 1).option("headers", "ROOTNAME,DETECTOR,EXPSTART,OPT_ELEM")
      .load(lampGlob)
    // rebuild the per-exposure arrays relationally, then segment-diff
    val diffs = graft.ops.Relational.segmentDiff(
      perRow.filter(col("DETECTOR") === "FUV")
        .groupBy("ROOTNAME", "SEGMENT")
        .agg(first("SHIFT_DISP").as("v")),
      Seq("ROOTNAME"), "SEGMENT", "v", "FUVA", "FUVB")
    assert(diffs.count() > 0)
    assert(diffs.filter(col("seg_diff").isNull).count() == 0)
  }
}
