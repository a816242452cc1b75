package graft

import org.apache.spark.sql.functions._
import graft.ingest.Fits

/** S5/S6/S7 on the reference's real products: per-extension jitter rows,
  * SPT sibling join with FGS derivation, and the correlated
  * jitter→exposure EXPSTART lookup with coalesced defaults. */
class FitsJitterAcqSpec extends SparkSpec {
  import spark.implicits._

  private val data = "/root/reference/tests/data"

  test("S6: jitter reader emits one row per jit extension with arrays") {
    val jit = Fits.perExtensionTable(spark, s"$data/*jit*",
      extName = "jit",
      primaryKeys = Seq("ROOTNAME"),
      extKeys = Seq("EXPNAME"),
      tableColumns = Seq("Seconds", "SI_V2_AVG", "SI_V3_AVG"))
    // 3 jitter files; the association file alone holds 4 jit extensions
    assert(jit.count() >= 4)
    val assoc = jit.filter(col("path").contains("ldxe02010"))
    assert(assoc.count() == 4)
    assert(assoc.select("EXPNAME").distinct().count() == 4)
    val row = assoc.filter(col("EXPNAME") === "ldxe02svj").head()
    assert(row.getSeq[Float](row.fieldIndex("Seconds")).length == 268)
  }

  test("jitter traces: avg +/- rms band per axis over the real jit files") {
    val jit = Fits.perExtensionTable(spark, s"$data/*jit*",
      extName = "jit",
      primaryKeys = Seq("EXPSTART"),
      extKeys = Seq("EXPNAME"),
      tableColumns = Seq("Seconds", "SI_V2_AVG", "SI_V2_RMS",
        "SI_V3_AVG", "SI_V3_RMS"))
      .withColumn("EXPSTART", col("EXPSTART").cast("double"))
    val traces = graft.monitors.Monitors.jitterTraces(jit)
    val perAxis = traces.groupBy("axis").count()
      .as[(String, Long)].collect().toMap
    assert(perAxis.keySet == Set("V2", "V3"))
    assert(perAxis("V2") == perAxis("V3") && perAxis("V2") > 0)
    // band envelope is consistent: lo <= avg <= hi everywhere
    assert(traces.filter(col("lo") > col("avg") || col("avg") > col("hi"))
      .count() == 0)
  }

  test("S5: SPT sibling join on ROOTNAME; FGS derived from DGESTAR tail") {
    val acq = Fits.exposures(spark, s"$data/*rawacq*",
      headerReq = Map(0 -> Seq("ROOTNAME", "EXPTYPE", "ACQSLEWX", "ACQSLEWY",
        "ACQSTAT", "SHUTTER"), 1 -> Seq("EXPSTART")),
      tableReq = Map.empty)
    val spt = Fits.exposures(spark, s"$data/*spt*",
      headerReq = Map(0 -> Seq("ROOTNAME", "DGESTAR")), tableReq = Map.empty)
      .withColumnRenamed("path", "spt_path")
    assert(acq.count() == 9)
    val joined = acq.join(spt, Seq("ROOTNAME"), "left")
      // FGS from the dominant-guide-star suffix (reference:
      // cosmo/monitors/data_models.py:19-22, DGESTAR[-2:])
      .withColumn("FGS", substring(col("DGESTAR"), -2, 2))
    assert(joined.count() == 9)
    val fgs = joined.select("FGS").distinct().as[String].collect()
    assert(fgs.nonEmpty && fgs.forall(f => f != null && f.startsWith("F")))
  }

  test("S7: jitter -> exposure EXPSTART lookup with coalesced defaults") {
    val jit = Fits.perExtensionTable(spark, s"$data/*jit*",
      extName = "jit", primaryKeys = Seq(), extKeys = Seq("EXPNAME"),
      tableColumns = Seq())
    val acq = Fits.exposures(spark, s"$data/*rawacq*",
      headerReq = Map(0 -> Seq("ROOTNAME", "EXPTYPE"), 1 -> Seq("EXPSTART")),
      tableReq = Map.empty)
    // derived key: jitter EXPNAME stem + 'q' = exposure ROOTNAME
    // (reference: cosmo/filesystem.py:228-247)
    val joined = jit
      .withColumn("ROOTNAME",
        concat(expr("substring(EXPNAME, 1, length(EXPNAME)-1)"), lit("q")))
      .join(acq.select("ROOTNAME", "EXPSTART", "EXPTYPE"), Seq("ROOTNAME"), "left")
      .withColumn("EXPSTART", coalesce(col("EXPSTART").cast("double"), lit(0.0)))
      .withColumn("EXPTYPE", coalesce(col("EXPTYPE"), lit("N/A")))
    assert(joined.count() == jit.count())
    // the rawacq set does not cover the jitter exposures -> defaults applied
    val defaults = joined.filter(col("EXPSTART") === 0.0 && col("EXPTYPE") === "N/A")
    assert(defaults.count() > 0)
    // matched rows (if any) carry a real MJD
    joined.filter(col("EXPSTART") =!= 0.0).select("EXPSTART").as[Double]
      .collect().foreach(v => assert(v > 50000 && v < 70000))
  }
}
