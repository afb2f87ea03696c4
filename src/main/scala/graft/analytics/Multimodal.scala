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

  /** Batched feature extraction over the binary column: each partition's
    * rows are consumed in fixed-size batches (`batchSize`), mirroring how a
    * vectorized decode stage (Arrow batches / GPU inference) consumes
    * input. Runs fully parallel per partition — no shuffle, no driver data.
    */
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
