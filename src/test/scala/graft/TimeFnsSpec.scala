package graft

import org.apache.spark.sql.functions._
import graft.core.TimeFns
import graft.ops.{Multimodal, Stats}

class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("mjd <-> timestamp round trip at microsecond precision") {
    val df = Seq(40587.0, 59000.5, 60000.123456).toDF("mjd")
    val out = df.select(col("mjd"),
      round(TimeFns.tsToMjd(TimeFns.mjdToTs(col("mjd"))), 9).as("rt"))
      .as[(Double, Double)].collect()
    out.foreach { case (mjd, rt) => assert(math.abs(mjd - rt) < 1e-8) }
  }

  test("mjd epoch anchors: 40587 = unix epoch") {
    val ts = Seq(1).toDF("x")
      .select(date_format(TimeFns.mjdToTs(lit(40587.0)), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(ts == "1970-01-01 00:00:00")
  }

  test("besselian year matches the Lieske epoch formula") {
    // B = 1900 + (JD - 2415020.31352)/365.242198781; MJD 58849 (2020-01-01)
    // -> B2020.000336
    val by = Seq(1).toDF("x")
      .select(TimeFns.besselianYear(lit(58849.0))).as[Double].head()
    assert(math.abs(by - 2020.000336) < 1e-5, s"byear=$by")
  }

  test("doy format parse: 2024.032:10:30:00") {
    val out = Seq("2024.032:10:30:00").toDF("s")
      .select(date_format(TimeFns.doyToTs(col("s")), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(out == "2024-02-01 10:30:00")
  }

  test("arrayStat std matches sample std (ddof=1)") {
    val df = Seq(Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)).toDF("a")
    val (mean, std) = df.select(
      Stats.arrayStat(col("a"), "mean"), Stats.arrayStat(col("a"), "std"))
      .as[(Double, Double)].head()
    assert(mean == 5.0)
    assert(math.abs(std - 2.13809) < 1e-4) // numpy std(ddof=1)
  }

  test("multimodal decode stub: deterministic metadata, per-partition batching") {
    val df = Seq(("a", "payload-bytes-1"), ("b", ""), ("c", "xy"))
      .toDF("id", "s")
      .withColumn("payload", col("s").cast("binary"))
    val out = Multimodal.withDecodedMeta(df, "payload")
    val metas = out.select(col("id"), col("media_meta.width"),
      col("media_meta.format")).as[(String, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // deterministic: 'p' = 0x70 -> width 16 + 0x70 = 128
    assert(metas("a")._1 == 128)
    assert(metas("b") == ((0, "empty")))
    assert(metas("c")._1 == 16 + 'x'.toInt)
    // frame sampling over the struct
    val frames = out.filter(col("id") === "a")
      .select(Multimodal.sampleFrameIndices(col("media_meta"), 2))
      .as[Seq[Int]].head()
    assert(frames.forall(_ % 2 == 0) && frames.nonEmpty)
    // zero-frame payload (empty bytes) samples NO frames, not [0]
    val empty = out.filter(col("id") === "b")
      .select(Multimodal.sampleFrameIndices(col("media_meta"), 2))
      .as[Seq[Int]].head()
    assert(empty.isEmpty)
  }

  test("multimodal feature extraction + resize keep schema and metadata consistent") {
    val df = Seq(("a", "payload-bytes-1"), ("b", ""), ("c", "xyzw"))
      .toDF("id", "s")
      .withColumn("payload", col("s").cast("binary"))
    // features: fixed dim, deterministic, empty payload -> zero vector
    val feats = Multimodal.withFeatures(df, "payload", dim = 16)
      .select(col("id"), col("features")).as[(String, Seq[Float])]
      .collect().toMap
    assert(feats.values.forall(_.length == 16))
    assert(feats("b").forall(_ == 0.0f))
    assert(feats("a") == feats("a") && feats("a") != feats("c"))
    // values bounded to the documented [-1, 1) scaling
    assert(feats.values.flatten.forall(v => v >= -1.0f && v < 1.0f))
    // resize: payload length and metadata both reflect the target dims
    val resizedDf = Multimodal.resized(
      Multimodal.withDecodedMeta(df, "payload"), "payload", "media_meta",
      targetW = 64, targetH = 32)
    val r = resizedDf.filter(col("id") === "a")
      .select(col("media_meta.width"), col("media_meta.height"),
        octet_length(col("payload"))).as[(Int, Int, Int)].head()
    assert(r == ((64, 32, 64 * 32 / 256)))
    assert(resizedDf.schema == Multimodal.withDecodedMeta(df, "payload").schema)
  }
}
