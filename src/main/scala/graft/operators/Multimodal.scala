package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode kernels are STUBS (no media libs in this environment) —
  * `fakeDecode` derives deterministic pseudo-features from the bytes so
  * the Spark-side contract (schema, batch shape, partition parallelism,
  * metadata propagation) is real and tested; swap the kernel for an
  * actual codec (JNI/FFI) in production. `mapPartitions` amortizes any
  * per-partition codec init across the batch, mirroring how a Pandas-UDF
  * / Arrow-batch pipeline would behave.
  */
object Multimodal {

  case class MediaMeta(media_type: String, width: Int, height: Int, sample_rate: Int)
  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(id: Long, media_type: String, n_bytes: Int,
                           checksum: Long, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("sample_rate", IntegerType))))))

  /** STUB decode kernel: a real implementation calls the codec here
    * (??? in production until wired); this deterministic fake folds the
    * payload bytes into a fixed-size feature vector so tests can assert
    * exact values.
    */
  def fakeDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  private def checksum(payload: Array[Byte]): Long =
    payload.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xff)) * 1099511628211L)

  /** Feature extraction over a media Dataset: per-partition batch loop,
    * codec init once per partition (simulated), constant memory per row.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would happen HERE (amortized)
      rows.map { r =>
        MediaFeatures(r.id, r.meta.media_type, r.payload.length,
          checksum(r.payload), fakeDecode(r.payload, dim))
      }
    }
  }

  /** Resize stub: recompute metadata, pass payload through (a real kernel
    * transcodes). Shows metadata-typed transforms stay columnar.
    */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.media_type"), lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate")))

  /** Frame-sample stub for video payloads: pick every k-th chunk of the
    * byte stream as a "frame" — the partitioning/array-output shape of a
    * real frame sampler.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyK: Int)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.map { r =>
      val frames = r.payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, idx) if idx % everyK == 0 => chunk }
        .toArray
      (r.id, frames.length, frames.map(c => c.length))
    }.toDF("id", "n_frames", "frame_sizes")
  }
}
