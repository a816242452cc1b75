package graft

import org.apache.spark.sql.functions._
import graft.monitors.{MonitorCatalog, Monitors, Runner}

/** The full 12-monitor reference suite as registered jobs: every monitor
  * runs end-to-end on representative inputs, and the composed semantics
  * (stripe pairs, drift rates) are spot-checked exactly. */
class MonitorCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def lampflash = Seq(
    ("la1q", 59000.0, "FUV", "G160M",
      Seq(0.0, 10.0), Seq(1.0, 2.0), Seq(0.1, 0.2), Seq("FUVA", "FUVB")),
    ("la2q", 59001.0, "FUV", "G130M",
      Seq(0.0, 5.0), Seq(20.0, 2.0), Seq(0.3, 0.4), Seq("FUVA", "FUVB")),
    ("na1q", 59002.0, "NUV", "G185M",
      Seq(0.0, 1.0, 2.0), Seq(1.0, 2.0, 3.0), Seq(0.1, 0.2, 0.3),
      Seq("NUVA", "NUVB", "NUVC")))
    .toDF("ROOTNAME", "EXPSTART", "DETECTOR", "OPT_ELEM",
      "TIME", "SHIFT_DISP", "SHIFT_XDISP", "SEGMENT")

  private def sms = Seq(
    ("la1", 100.0, 1000.0), ("la2", 200.0, 2000.0), ("na1", 300.0, 3000.0))
    .toDF("ROOTNAME", "TSINCEOSM1", "TSINCEOSM2")

  private def acq = Seq(
    // ACQ/IMAGE rows passing every V2V3 quality cut
    ("ACQ/IMAGE", "F1", 58000.0, 0.3, 0.4, "Success", "Open",
      "IMAGING", 3000L, 600L, "NO", "1.1", "FUV", 3, "PSA", 200.0),
    ("ACQ/IMAGE", "F1", 58100.0, 0.4, 0.5, "Success", "Open",
      "IMAGING", 3000L, 600L, "NO", "2.1", "FUV", 3, "PSA", 205.0),
    ("ACQ/IMAGE", "F1", 58200.0, 0.5, 0.6, "Success", "Open",
      "IMAGING", 3000L, 600L, "NO", "3.1", "NUV", 1, "BOA", -100.0),
    // peak acquisitions, one outlier each
    ("ACQ/PEAKD", "F2", 58000.0, 1.5, 0.0, "Success", "Open",
      "SPECTROSCOPIC", 100L, 0L, "NO", "1.1", "FUV", 3, "PSA", 0.0),
    ("ACQ/PEAKD", "F2", 58001.0, 0.2, 0.0, "Success", "Open",
      "SPECTROSCOPIC", 100L, 0L, "NO", "1.1", "FUV", 3, "PSA", 0.0),
    ("ACQ/PEAKXD", "F3", 58002.0, 0.0, -1.2, "Success", "Open",
      "SPECTROSCOPIC", 100L, 0L, "NO", "1.1", "NUV", 2, "PSA", 0.0))
    .toDF("EXPTYPE", "FGS", "EXPSTART", "ACQSLEWX", "ACQSLEWY", "ACQSTAT",
      "SHUTTER", "OBSTYPE", "NEVENTS", "LAMPEVNT", "EXTENDED", "LINENUM",
      "DETECTOR", "LIFE_ADJ", "APERTURE", "APERYPOS")

  private def breakpoints =
    Seq(("F1", None: Option[Double], None: Option[Double]))
      .toDF("FGS", "lo_mjd", "hi_mjd")

  test("all 12 registered reference monitors run without error") {
    Runner.clear()
    MonitorCatalog.register(MonitorCatalog.Sources(lampflash, sms, acq, breakpoints))
    val results = Runner.runAll(spark, "monthly")
    assert(results.length == 12, results.map(_.name).mkString(", "))
    val failed = results.filter(_.error.isDefined)
    assert(failed.isEmpty, failed.mkString("; "))
    val byName = results.map(r => r.name -> r.rowCount).toMap
    assert(byName("fuv_osm_shift1") == 2)  // la1q, la2q diffs
    assert(byName("nuv_osm_shift1") == 2)  // B-C and C-A for na1q
    assert(byName("acq_peakd") == 2 && byName("acq_peakxd") == 1)
    // every FUV acq row (2 image + 2 peakd, all LP3/PSA) joins the LP
    // dimension; both NUV rows (LP1/BOA, LP2/PSA) do too
    assert(byName("fuv_aperture_shift") == 4 && byName("nuv_aperture_shift") == 2)
    Runner.clear()
  }

  test("extended catalog: dark regions, telemetry, jitter run under their own cadence") {
    Runner.clear()
    val dark = Seq(
      ("FUVA", "d1", 2000.0, 500.0, 10, 0.0),
      ("FUVB", "d2", 2000.0, 500.0, 10, 0.0),
      ("N/A", "d3", 100.0, 100.0, 0, 0.0))
      .toDF("SEGMENT", "ROOTNAME", "XCORR", "YCORR", "PHA", "TIME")
    val telem = Seq((58800.0, 1.0), (58801.0, 2.0), (58802.0, 3.0), (58803.0, 4.0))
      .toDF("MJD", "Data")
    val probes = Seq(Tuple1(58801.5)).toDF("MJD")
    val jitter = Seq(("e1", 59000.0, Seq(0.0f, 10.0f),
      Seq(1.0f, 2.0f), Seq(0.1f, 0.2f), Seq(3.0f, 4.0f), Seq(0.3f, 0.4f)))
      .toDF("EXPNAME", "EXPSTART", "Seconds",
        "SI_V2_AVG", "SI_V2_RMS", "SI_V3_AVG", "SI_V3_RMS")
    MonitorCatalog.registerExtended(
      MonitorCatalog.ExtendedSources(dark, telem, probes, jitter))
    val results = Runner.runAll(spark, "extended")
    assert(results.length == 5, results.map(_.name).mkString(", "))
    assert(results.forall(_.error.isEmpty), results.filter(_.error.isDefined))
    val byName = results.map(r => r.name -> r.rowCount).toMap
    assert(byName("dark_fuva_regions") == 1L && byName("dark_nuv") == 1L)
    assert(byName("jitter_traces") == 4L) // 2 samples x 2 axes
    // and the faithful monthly group is untouched by the extended cadence
    assert(Runner.registered("monthly").isEmpty)
    Runner.clear()
  }

  test("NUV stripe pairs compute B-C and C-A exactly") {
    val out = Monitors.nuvStripeDiffs(
      Monitors.osmShiftData(lampflash, sms, detector = "NUV"), "SHIFT_DISP")
      .select("ROOTNAME", "pair", "seg_diff")
      .as[(String, String, Double)].collect().toSet
    assert(out == Set(("na1q", "B-C", -1.0), ("na1q", "C-A", 2.0)))
  }

  test("OSM drift: relative-to-first shifts, drift rates, OSM-move offsets") {
    val out = Monitors.osmDriftData(lampflash, sms, "FUV")
      .select("ROOTNAME", "TIME", "REL_SHIFT_DISP", "SHIFT1_DRIFT",
        "REL_TSINCEOSM1", "REL_TSINCEOSM2")
      .as[(String, Double, Double, Double, Double, Double)].collect().toSet
    assert(out == Set(
      ("la1q", 10.0, 1.0, 0.1, 110.0, 1010.0),   // (2-1)/10
      ("la2q", 5.0, -18.0, -3.6, 205.0, 2005.0))) // (2-20)/5
  }
}
