package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S10/S11/S17 — CSV and whitespace-delimited sources and the CSV sink
  * (reference: cosmo/monitor_helpers.py:152–154 ancillary CSV;
  * telemetry_monitors.py:104–119 whitespace (MJD, value) telemetry;
  * acq_monitors.py:472–475 outlier CSV sink). */
class CsvSourceSpec extends SparkSpec {
  import spark.implicits._

  test("header CSV source round-trips through the CSV sink") {
    val dir = Files.createTempDirectory("csv").toString
    val src = s"$dir/ancillary.csv"
    Files.writeString(java.nio.file.Paths.get(src),
      "ROOTNAME,PROP_TYP,APERXPOS\nlaaa01xy,GO,12.5\nlaaa02ab,SNAP,-3.25\n")
    val df = spark.read.option("header", "true").option("inferSchema", "true").csv(src)
    assert(df.columns.toSeq == Seq("ROOTNAME", "PROP_TYP", "APERXPOS"))
    val row = df.filter(col("ROOTNAME") === "laaa02ab").head()
    assert(row.getAs[Double]("APERXPOS") == -3.25)

    val out = s"$dir/out"
    df.coalesce(1).write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.orderBy("ROOTNAME").collect().toSeq ==
      df.orderBy("ROOTNAME").collect().toSeq)
  }

  test("whitespace-delimited telemetry source: (MJD, value) pairs") {
    val dir = Files.createTempDirectory("tlm").toString
    val src = s"$dir/mnemonic.txt"
    Files.writeString(java.nio.file.Paths.get(src),
      "58849.0   1.25\n58850.5   2.5\n58852.0   -1.0\n")
    val df = spark.read.text(src)
      .select(split(trim(col("value")), "\\s+").as("parts"))
      .select(element_at(col("parts"), 1).cast("double").as("MJD"),
        element_at(col("parts"), 2).cast("double").as("Data"))
    assert(df.count() == 3)
    assert(df.agg(sum("Data")).as[Double].head() == 2.75)
    // MJD joins straight into the time axis
    val withTs = df.select(graft.core.TimeFns.mjdToTs(col("MJD")).as("ts"))
    assert(withTs.filter(year(col("ts")) === 2020).count() == 3)
  }
}
