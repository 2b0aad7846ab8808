package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition in bounded batches.
  *
  * The actual codec step is a clearly marked STUB (no image/audio libraries
  * in this environment): `decodeStub` produces a deterministic fake feature
  * vector from the payload bytes. Everything AROUND the stub — the schema
  * contract, partition-level batching, the mapPartitions signature, output
  * schema binding — is the real distributed plumbing and is tested.
  * At 100 TB: payloads stay columnar (parquet binary), decode parallelism
  * is per-file-split, and nothing ever collects to the driver.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB codec: a real implementation would decode the payload (JPEG/PCM/
    * container) and run a vision/audio encoder. Deterministic fake: feature
    * f(i) derived from a rolling hash of the payload bytes — stable across
    * runs/partitions so tests can assert exact values. */
  private[graft] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // FNV-ish rolling hash
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    var s = h
    while (j < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L // LCG step
      out(j) = ((s >>> 33).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Feature extraction over a media table: per-partition batched decode →
    * (`media_id`, `modality`, `n_bytes`, `features: array<float>`).
    * mapPartitions keeps the decode loop off the driver and amortizes any
    * per-partition codec setup (model load, in a real impl). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "modality", "payload")
      .mapPartitions { it =>
        // per-partition setup happens here once (codec/model init in a
        // real implementation)
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), r.getString(1), payload.length.toLong,
            decodeStub(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Video frame sampling stub: emits every `stride`-th frame index with a
    * per-frame payload slice (a real impl would demux the container). Keeps
    * the explode-shape plumbing (one row in → many frame rows out). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val frames = media
      .filter(col("modality") === "video")
      .select(col("media_id"), col("payload"),
        coalesce(col("meta.duration_ms"), lit(0L)).as("dur"))
      // STUB frame count: 25 fps equivalent — 1 frame per 40ms of duration
      .withColumn("n_frames", greatest((col("dur") / 40).cast("int"), lit(1)))
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("payload"))
      .filter(col("frame_idx") % stride === 0)
    frames.select(col("media_id"), col("frame_idx"),
      // STUB decode: slice of payload bytes stands in for the frame
      expr("substring(payload, CAST(frame_idx % 32 + 1 AS INT), 8)")
        .as("frame_bytes"))
  }
}
