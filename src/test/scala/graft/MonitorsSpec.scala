package graft

import org.apache.spark.sql.functions._
import graft.core.TimeFns
import graft.monitors.Monitors

class MonitorsSpec extends SparkSpec {
  import spark.implicits._

  // lampflash fixture: per-exposure arrays, FUVA/FUVB flash pairs
  private def lampflash = Seq(
    ("la1q", 59000.0, "FUV", "G160M",
      Seq(0.0, 10.0), Seq(1.0, 2.0), Seq(0.1, 0.2), Seq("FUVA", "FUVB")),
    ("la2q", 59001.0, "FUV", "G130M",
      Seq(0.0, 5.0), Seq(20.0, 2.0), Seq(0.3, 0.4), Seq("FUVA", "FUVB")),
    ("la3q", 59002.0, "NUV", "G185M",
      Seq(0.0), Seq(9.0), Seq(0.5), Seq("NUVA")),
    ("la4q", 59003.0, "FUV", "G160M",
      Seq.empty[Double], Seq.empty[Double], Seq.empty[Double], Seq.empty[String]))
    .toDF("ROOTNAME", "EXPSTART", "DETECTOR", "OPT_ELEM",
      "TIME", "SHIFT_DISP", "SHIFT_XDISP", "SEGMENT")

  private def sms = Seq(
    ("la1", 100.0), ("la2", 200.0), ("la3", 300.0), ("la4", 400.0))
    .toDF("ROOTNAME", "TSINCEOSM1")

  test("osmShiftData joins SMS on derived key, keeps FUV, explodes flashes") {
    val out = Monitors.osmShiftData(lampflash, sms)
    val rows = out.select("ROOTNAME", "flash", "SEGMENT", "SHIFT_DISP", "TSINCEOSM1")
      .as[(String, Int, String, Double, Double)].collect().toSet
    assert(rows == Set(
      ("la1q", 0, "FUVA", 1.0, 100.0), ("la1q", 1, "FUVB", 2.0, 100.0),
      ("la2q", 0, "FUVA", 20.0, 200.0), ("la2q", 1, "FUVB", 2.0, 200.0)))
    // absolute time: EXPSTART MJD + TIME seconds
    val ts = out.filter(col("ROOTNAME") === "la1q" && col("flash") === 1)
      .select(unix_micros(col("sample_ts"))).as[Long].head()
    val expected = ((59000.0 - 40587.0) * 86400.0 + 10.0) * 1e6
    assert(math.abs(ts - expected) < 1e3)
  }

  test("segment diff + X3 outlier threshold reproduce the shift1 rule") {
    val exploded = Monitors.osmShiftData(lampflash, sms)
    val diffs = Monitors.segmentDiff(exploded, "SHIFT_DISP")
    val outliers = Monitors.segmentDiffOutliers(diffs, 10.0)
      .select("ROOTNAME").as[String].collect().toSeq
    assert(outliers == Seq("la2q")) // |20-2| = 18 > 10; |1-2| = 1 is fine
  }

  test("segment diff pairs multi-flash exposures flash-for-flash") {
    // two flashes per segment, segments concatenated in the arrays —
    // the real lampflash layout (compute_segment_diff subtracts the
    // sequences elementwise: osm_shift_monitors.py:55–86)
    val multi = Seq(
      ("mf1q", 59000.0, "FUV", "G160M",
        Seq(0.0, 10.0, 0.0, 10.0), Seq(5.0, 30.0, 1.0, 2.0),
        Seq(0.1, 0.2, 0.3, 0.4), Seq("FUVA", "FUVA", "FUVB", "FUVB")))
      .toDF("ROOTNAME", "EXPSTART", "DETECTOR", "OPT_ELEM",
        "TIME", "SHIFT_DISP", "SHIFT_XDISP", "SEGMENT")
    val exploded = Monitors.osmShiftData(multi,
      Seq(("mf1", 0.0)).toDF("ROOTNAME", "TSINCEOSM1"))
    val diffs = Monitors.segmentDiff(exploded, "SHIFT_DISP")
      .select("ROOTNAME", "seg_idx", "seg_diff")
      .as[(String, Int, Double)].collect().toSet
    // flash 1: 5-1=4, flash 2: 30-2=28 — one diff PER FLASH PAIR
    assert(diffs == Set(("mf1q", 1, 4.0), ("mf1q", 2, 28.0)))
    // lamp_time comes from the FUVA flash (EXPSTART + its TIME offset)
    val ts = Monitors.segmentDiff(exploded, "SHIFT_DISP")
      .filter(col("seg_idx") === 2)
      .select(unix_micros(col("lamp_time"))).as[Long].head()
    val expected = ((59000.0 - 40587.0) * 86400.0 + 10.0) * 1e6
    assert(math.abs(ts - expected) < 1e3)
  }

  test("acqImageTrack fits slew distance per FGS within breakpoint epochs") {
    // distance grows linearly with time: slope recoverable per FGS
    val acq = (0 until 10).map { i =>
      ("ACQ/IMAGE", "F1", 58000.0 + i * 100, 3.0 + i * 0.1, 4.0 + i * 0.1,
        "Success", "Open")
    }.toDF("EXPTYPE", "FGS", "EXPSTART", "ACQSLEWX", "ACQSLEWY", "ACQSTAT", "SHUTTER")
    val breaks = Seq(("F1", None: Option[Double], None: Option[Double]))
      .toDF("FGS", "lo_mjd", "hi_mjd")
    val fit = Monitors.acqImageTrack(acq, breaks)
      .select("FGS", "n", "slope").as[(String, Long, Double)].collect()
    assert(fit.length == 1)
    val (fgs, n, slope) = fit.head
    assert(fgs == "F1" && n == 10L)
    assert(slope > 0, s"slew distance drifts upward, slope=$slope")
  }

  test("acqImageV2V3Track fits NEGATED slews since each FGS's last breakpoint") {
    // slews grow with time; the reference fits -slew (acq_monitors.py:
    // 243-244), so the recovered slope must be NEGATIVE — and only the
    // 5 rows at or after the last break (58500) enter the fit
    val acq = (0 until 10).map { i =>
      ("F1", 58000.0 + i * 100, 0.1 * i, 0.0, "Success", "Open",
        "IMAGING", 3000L, 600L, "NO", "1.1")
    }.toDF("FGS", "EXPSTART", "ACQSLEWX", "ACQSLEWY", "ACQSTAT",
      "SHUTTER", "OBSTYPE", "NEVENTS", "LAMPEVNT", "EXTENDED", "LINENUM")
    val breaks = Seq(
      ("F1", None: Option[Double], Some(58500.0)),
      ("F1", Some(58500.0), None: Option[Double]))
      .toDF("FGS", "lo_mjd", "hi_mjd")
    val fits = Monitors.acqImageV2V3Track(acq, breaks)
      .select("axis", "n", "slope").as[(String, Long, Double)].collect()
    assert(fits.length == 2)
    fits.foreach { case (axis, n, slope) =>
      assert(n == 5L, s"$axis fit over rows since last break, n=$n")
      assert(slope < 0, s"$axis slope of negated growing slew, slope=$slope")
    }
  }

  test("apertureShift: 3-axis LP lookup, LP<1 dropped, SHIFT_APERY computed") {
    val df = Seq(
      ("r1", 3, "PSA", "FUV", 200.0),   // LP3/PSA/FUV -> std 181
      ("r2", 1, "BOA", "NUV", -100.0),  // LP1/BOA/NUV -> std -153
      ("r3", -1, "PSA", "FUV", 50.0),   // LP<1 -> dropped
      ("r4", 10, "WCA", "FUV", 210.0))  // LP10/WCA/FUV -> std 206
      .toDF("ROOTNAME", "LIFE_ADJ", "APERTURE", "DETECTOR", "APERYPOS")
    val out = graft.monitors.Monitors.apertureShift(df)
      .select("ROOTNAME", "SHIFT_APERY").as[(String, Double)].collect().toMap
    assert(out == Map("r1" -> 19.0, "r2" -> 53.0, "r4" -> 4.0))
  }

  test("telemetryTrack: boxcar, central band, and as-of probe values") {
    val samples = Seq(
      (58849.0, 1.0), (58850.0, 2.0), (58851.0, 3.0), (58852.0, 100.0),
      (58853.0, 4.0), (58854.0, 5.0)).toDF("MJD", "Data")
    val probes = Seq(58851.5, 58840.0, 58860.0).toDF("MJD")
    val (smoothed, band, probeVals) =
      graft.monitors.Monitors.telemetryTrack(samples, probes)
    assert(smoothed.count() == 6)
    val (lo, hi) = band.as[(Double, Double)].head()
    assert(lo >= 1.0 && lo < 2.0 && hi > 5.0 && hi <= 100.0)
    val pv = probeVals.select("MJD", "value_at")
      .as[(Double, Option[Double])].collect().toMap
    assert(pv(58851.5).contains(3.0))  // last sample at or before
    assert(pv(58840.0).isEmpty)        // before first sample
    assert(pv(58860.0).contains(5.0))  // after last sample
  }

  test("darkRate bins events into time buckets within region and PHA cuts") {
    val events = Seq(
      ("d1", 100.0, 100.0, 10, 0.0), ("d1", 110.0, 110.0, 12, 10.0),
      ("d1", 120.0, 120.0, 13, 30.0),
      ("d1", 5000.0, 100.0, 10, 1.0),  // outside x region
      ("d1", 100.0, 100.0, 30, 2.0))   // outside PHA band
      .toDF("ROOTNAME", "XCORR", "YCORR", "PHA", "TIME")
    val out = Monitors.darkRate(events, 0, 1000, 0, 1000, 2, 23,
      binSeconds = 25.0, npix = 100.0)
      .select("tbin", "n_events").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 2L), (1L, 1L)))
  }

  test("darkRateRegions: per-region tagging with the reference's FUVA boxes") {
    val events = Seq(
      ("d1", 2000.0, 500.0, 10, 0.0),   // inner (1260-15119, 375-660)
      ("d1", 2000.0, 300.0, 10, 0.0),   // bottom (1060-15250, 296-375)
      ("d1", 1100.0, 400.0, 10, 0.0),   // left AND bottom? y=400 -> left only
      ("d1", 2000.0, 500.0, 30, 0.0))   // PHA outside band -> dropped
      .toDF("ROOTNAME", "XCORR", "YCORR", "PHA", "TIME")
    val out = Monitors.darkRateRegions(events, Monitors.DarkRegions.fuva)
      .select("region", "n_events").as[(String, Long)].collect().toSet
    assert(out == Set(("inner", 1L), ("bottom", 1L), ("left", 1L)))
    // npix normalization: inner box is (15119-1260)x(660-375)
    val rate = Monitors.darkRateRegions(events, Monitors.DarkRegions.fuva)
      .filter(col("region") === "inner").select("dark_rate").as[Double].head()
    assert(math.abs(rate - 1.0 / ((15119.0 - 1260) * (660.0 - 375)) / 25.0) < 1e-15)
    // NUV path has no PHA column at all
    val nuvEvents = Seq(("n1", 100.0, 100.0, 0.0))
      .toDF("ROOTNAME", "XCORR", "YCORR", "TIME")
    val nuv = Monitors.darkRateRegions(nuvEvents, Monitors.DarkRegions.nuv,
      filterPha = false)
    assert(nuv.select("n_events").as[Long].head() == 1L)
  }
}
