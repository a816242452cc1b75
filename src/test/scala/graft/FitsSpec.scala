package graft

import org.apache.spark.sql.functions._
import graft.ingest.Fits

/** FITS reader against the reference repo's real exposure products.
  * Golden values below were extracted INDEPENDENTLY (byte-level struct
  * parse of the public files), not copied from the reference's tests. */
class FitsSpec extends SparkSpec {
  import spark.implicits._

  private val lampflash = "/root/reference/tests/data/lb4c10niq_lampflash.fits.gz"

  test("header + binary-table parse matches independent byte-level values") {
    val bytes = Fits.gunzipIfNeeded(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(lampflash)))
    val hdus = Fits.parseHdus(bytes)
    assert(hdus.head.header("ROOTNAME") == "lb4c10niq")
    assert(hdus.head.header("DETECTOR") == "NUV")
    assert(hdus.head.header("OPT_ELEM") == "G230L")
    assert(math.abs(hdus(1).header("EXPSTART").toDouble - 55202.48302439) < 1e-6)

    val specs = Fits.tableCols(hdus(1)).map(s => s.name -> s).toMap
    val seg = Fits.columnValues(bytes, hdus(1), specs("SEGMENT"))
    assert(seg == IndexedSeq("NUVA", "NUVB", "NUVC", "NUVA", "NUVB", "NUVC"))
    val time = Fits.columnValues(bytes, hdus(1), specs("TIME")).map(_.asInstanceOf[Double])
    assert(math.abs(time.head - 4.320000171661377) < 1e-12)
    assert(math.abs(time.last - 2404.35205078125) < 1e-9)
    val sd = Fits.columnValues(bytes, hdus(1), specs("SHIFT_DISP")).map(_.asInstanceOf[Float])
    assert(math.abs(sd.head - (-23.672340393066406)) < 1e-5)
    assert(math.abs(sd(2) - (-24.23033332824707)) < 1e-5)
  }

  test("exposures: one row per file, header scalars + column arrays, via Spark") {
    val df = Fits.exposures(spark,
      "/root/reference/tests/data/*lampflash*",
      headerReq = Map(0 -> Seq("ROOTNAME", "DETECTOR", "OPT_ELEM"), 1 -> Seq("EXPSTART")),
      tableReq = Map(1 -> Seq("TIME", "SHIFT_DISP", "SHIFT_XDISP", "SEGMENT")))
    // the reference's dataset has 11 lampflash files (tests pin this count)
    assert(df.count() == 11)
    val row = df.filter(col("ROOTNAME") === "lb4c10niq").head()
    assert(row.getAs[String]("DETECTOR") == "NUV")
    assert(row.getSeq[String](row.fieldIndex("SEGMENT")).toSeq ==
      Seq("NUVA", "NUVB", "NUVC", "NUVA", "NUVB", "NUVC"))
    assert(row.getSeq[Float](row.fieldIndex("SHIFT_DISP")).length == 6)
    // arrays feed the standard pipeline: explode + size checks work
    val exploded = graft.ops.Relational.explodeArrays(
      df.select("ROOTNAME", "TIME", "SHIFT_DISP", "SEGMENT"),
      Seq("TIME", "SHIFT_DISP", "SEGMENT"))
    assert(exploded.count() > 11)
  }

  test("end-to-end OSM pipeline on real FITS lampflash + derived SMS rows") {
    val lamp = Fits.exposures(spark,
      "/root/reference/tests/data/*lampflash*",
      headerReq = Map(0 -> Seq("ROOTNAME", "DETECTOR", "OPT_ELEM"), 1 -> Seq("EXPSTART")),
      tableReq = Map(1 -> Seq("TIME", "SHIFT_DISP", "SHIFT_XDISP", "SEGMENT")))
      .withColumn("EXPSTART", col("EXPSTART").cast("double"))
    // SMS fixture: rootnames sans trailing 'q' (J2 derived-key contract)
    val sms = lamp.select(expr("substring(ROOTNAME, 1, length(ROOTNAME)-1)")
      .as("ROOTNAME"))
      .withColumn("TSINCEOSM1", lit(100.0))
    val out = graft.monitors.Monitors.osmShiftData(lamp, sms)
    assert(out.count() > 0)
    assert(out.columns.contains("sample_ts") && out.columns.contains("flash"))
    // every surviving row is FUV (the NUV file above is filtered out)
    assert(out.select("DETECTOR").distinct().as[String].collect().toSeq == Seq("FUV"))
  }
}
