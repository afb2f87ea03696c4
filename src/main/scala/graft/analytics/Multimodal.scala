package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted per-media features (the output schema of the decode stage). */
final case class MediaFeature(
    doc_id: Long,
    n_bytes: Long,
    byte_checksum: Long,
    feature: Array[Float],
    batch_size: Int)

/** Output of the frame-sampling stage (video-ish stub). */
final case class FrameSample(
    doc_id: Long,
    n_frames: Int,
    frame_checksum: Long)

/** Output of the audio frame-energy stage (audio-ish stub). */
final case class AudioEnergy(
    doc_id: Long,
    n_frames: Long,
    max_energy: Long,
    energy_digest: Long)

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * batched per-partition stage.
  *
  * The Spark-side mechanics here are real and tested — schema, partition
  * flow, batch shaping (`mapPartitions` with fixed-size batches, the Scala
  * analog of a Pandas-UDF `mapInPandas` iterator-of-batches contract).
  * The actual codec call is STUBBED (`decodeStub`): this container has no
  * image/audio libraries, so the "decode" is a deterministic fake that
  * stands where a JNI/FFI codec call would go.
  */
object Multimodal {

  /** Attach a binary media column + typed metadata to the documents table.
    * Stand-in for ingesting real media blobs: the bytes are the UTF-8 text
    * (deterministic), the metadata struct is what a real pipeline carries
    * (format / nominal dims / size).
    */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: where a real implementation would call an image/audio
    * codec on the byte buffer, this computes a deterministic fake — byte
    * checksum + an 8-dim "embedding" from the first bytes. Signature and
    * batch shape match the real thing.
    */
  private def decodeStub(bytes: Array[Byte]): (Long, Array[Float]) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val feat = Array.tabulate(8)(j =>
      if (j < bytes.length) (bytes(j) & 0xff).toFloat / 255f else 0f)
    (sum, feat)
  }

  /** STUB resize: where a real pipeline would decode, resize, and re-encode
    * the image, this halves the nominal dimensions and crops the byte
    * buffer to a quarter (deterministic — the Spark-side shape is what's
    * real: a projection over (binary, metadata struct), no shuffle, fully
    * codegen'd including the binary `substring`).
    */
  def resizeStub(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      expr("CAST(meta.width div 2 AS INT)").as("new_width"),
      expr("CAST(meta.height div 2 AS INT)").as("new_height"),
      expr("(meta.n_bytes + 3) div 4").as("crop_bytes"),
      sha2(expr("substring(media, 1, CAST((meta.n_bytes + 3) div 4 AS INT))"), 256)
        .as("crop_sha"))

  /** Batched feature extraction over the binary column: each partition's
    * rows are consumed in fixed-size batches (`batchSize`), mirroring how a
    * vectorized decode stage (Arrow batches / GPU inference) consumes
    * input. Runs fully parallel per partition — no shuffle, no driver data.
    */
  /** STUB frame sampling: treat the byte buffer as a "video" and keep every
    * `stride`-th byte as a "frame" (a real build would demux + decode key
    * frames). Same batched `mapPartitions` contract as [[extractFeatures]]
    * — the iterator-of-batches shape a vectorized decoder consumes.
    */
  def frameSample(spark: SparkSession, media: DataFrame, stride: Int = 16,
      batchSize: Int = 64): Dataset[FrameSample] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            var sum = 0L
            var n = 0
            var i = 0
            while (i < bytes.length) {
              sum = (sum * 131 + (bytes(i) & 0xff)) % 1000000007L
              n += 1
              i += stride
            }
            FrameSample(id, n, sum)
          }
        }
      }
  }

  /** STUB audio analysis: treat the byte buffer as 8-bit PCM, frame it
    * into fixed windows, and compute per-frame RMS energy (scaled to an
    * integer — `floor(sqrt(ssq/frame)·1000 + 0.5)`; sqrt is exactly
    * rounded in IEEE 754 so the value is bit-portable to the SQL oracle,
    * unlike a libm `log`). A real build would decode the container and
    * window PCM samples — the batched `mapPartitions` contract, framing,
    * and aggregate outputs (frame count, peak, order-sensitive digest)
    * are the real Spark-side plumbing.
    */
  def audioEnergy(spark: SparkSession, media: DataFrame, frame: Int = 64,
      batchSize: Int = 64): Dataset[AudioEnergy] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val nFrames = bytes.length / frame // full frames only
            var digest = 0L
            var maxE = 0L
            var k = 0
            while (k < nFrames) {
              var ssq = 0L
              var j = 0
              while (j < frame) {
                val c = (bytes(k * frame + j) & 0xff) - 128
                ssq += c.toLong * c
                j += 1
              }
              val e = math.floor(math.sqrt(ssq.toDouble / frame) * 1000 + 0.5).toLong
              if (e > maxE) maxE = e
              digest = (digest * 31 + e) % 1000000007L
              k += 1
            }
            AudioEnergy(id, nFrames.toLong, maxE, digest)
          }
        }
      }
  }

  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.map { case (id, bytes) =>
            val (sum, feat) = decodeStub(bytes)
            MediaFeature(id, bytes.length.toLong, sum, feat, batch.size)
          }
        }
      }
  }
}
