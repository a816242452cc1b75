package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run per-partition so a real codec would amortize its init cost across
  * a batch of rows (the Scala analogue of `mapInPandas` batching).
  *
  * The decode itself is STUBBED (this container ships no image/audio
  * codecs): [[decodeStub]] derives deterministic fake dimensions from the
  * payload bytes. The Spark-side contract — schema, partitioning, batch
  * shape, null handling — is real and tested.
  */
object Multimodal {

  /** Schema of the decoded-metadata struct a real decoder would emit. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Deterministic fake decode: dimensions derived from payload bytes.
    * A real implementation keeps this exact signature and replaces the
    * body with the codec call. */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    if (payload == null || payload.isEmpty) (0, 0, 0, "empty")
    else {
      val w = 16 + (payload(0) & 0x7f)
      val h = 16 + (payload(payload.length / 2) & 0x7f)
      val f = 1 + (payload.length % 30)
      (w, h, f, if (payload.length % 2 == 0) "rgb" else "gray")
    }
  }

  /** Attach decoded metadata to a DataFrame with a binary `payloadCol`.
    * Runs per-partition (codec init once per partition, not per row) and
    * preserves all input columns. */
  def withDecodedMeta(df: DataFrame, payloadCol: String,
                      outCol: String = "media_meta"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, mediaMetaSchema))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // real codec: initialize decoder HERE, once per partition
      rows.map { r =>
        val (w, h, f, fmt) = fakeDecode(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, f, fmt))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: indices of every `stride`-th frame given the decoded
    * frame count — pure column expression over the metadata struct. A
    * zero-frame payload (empty/undecodable media) yields an empty array,
    * not a phantom index 0. */
  def sampleFrameIndices(meta: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column = {
    val nFrames = meta.getField("n_frames")
    when(nFrames > 0,
      filter(sequence(lit(0), nFrames - 1), i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
  }
}
