package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
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
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, mediaMetaSchema))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    // typed Dataset.mapPartitions (not df.rdd): keeps the op inside the
    // Dataset plan — no ExistingRDD barrier, AQE and reuse still apply —
    // while preserving the once-per-partition codec-init contract.
    df.mapPartitions { rows =>
      // real codec: initialize decoder HERE, once per partition
      rows.map { r =>
        val (w, h, f, fmt) = fakeDecode(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, f, fmt))
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic fake feature extractor: a `dim`-component float vector
    * derived from payload bytes (strided byte reads, centered/scaled).
    * A real model keeps the signature and batch shape; only the body
    * changes. Empty payload → zero vector (valid input downstream). */
  private[graft] def fakeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload != null && payload.nonEmpty) {
      var i = 0
      while (i < dim) {
        out(i) = ((payload((i * 31) % payload.length) & 0xff) - 128) / 128.0f
        i += 1
      }
    }
    out
  }

  /** Attach a feature vector extracted from the binary payload — the
    * embed step of a multimodal pipeline. Per-partition so a real model
    * loads once per partition and infers over a batch of rows (the Scala
    * analogue of `mapInPandas` batching); output feeds the Similarity
    * ops directly (`ArrayType(FloatType)`). */
  def withFeatures(df: DataFrame, payloadCol: String, dim: Int = 64,
                   outCol: String = "features"): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // real model: load weights HERE, once per partition, infer batched
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ fakeFeatures(r.getAs[Array[Byte]](payloadIdx), dim).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize step: rewrite the payload to the target dimensions and patch
    * the metadata struct to match — fake body (byte truncate/pad keyed to
    * the target size), real contract: payload column AND metadata stay
    * consistent, per-partition batching, all other columns preserved. */
  def resized(df: DataFrame, payloadCol: String, metaCol: String,
              targetW: Int, targetH: Int): DataFrame = {
    val inSchema = df.schema
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val metaIdx = inSchema.fieldIndex(metaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = r.getAs[Row](metaIdx)
        val targetLen = math.max(1, (targetW * targetH) / 256)
        val newPayload =
          if (payload == null || payload.isEmpty) Array.emptyByteArray
          else java.util.Arrays.copyOf(payload, targetLen)
        val newMeta = Row(targetW, targetH, meta.getInt(2), meta.getString(3))
        val vals = r.toSeq.toArray
        vals(payloadIdx) = newPayload
        vals(metaIdx) = newMeta
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(Encoders.row(inSchema))
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
