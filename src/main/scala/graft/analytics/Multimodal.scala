package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Perceptual-hash-style image near-dup: a 64-bit block-mean fingerprint
    * (each bit = "this 1/64th of the payload is brighter than the overall
    * mean") + the same banded-Hamming candidate join [[Dedup.simhashPairs]]
    * uses. On real images the codes below would be decoded pixel
    * luminances; here the payload bytes ARE the document's ASCII chars
    * (see [[withBinary]] — `ascii(char) == byte`, verified corpus-wide),
    * so the block means are char-code means and the whole construction is
    * oracle-checkable in SQL.
    *
    * Scale shape: the fingerprint is two codegen'd hash aggregates keyed
    * on (doc_id, block) then (doc_id) — map-side combined, bounded fan-out
    * (≤ 64 rows/doc); the mean comparison `bsum·tn > tsum·bn` is exact
    * integer cross-multiplication (no float division anywhere); candidates
    * come from the 4×16-bit block-equality join (catches every pair with
    * Hamming ≤ 3 exactly, higher distances probabilistically — never an
    * all-pairs product).
    */
  def phashPairs(docs: DataFrame, maxHamming: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = docs
      .select(col("doc_id"), length(col("text")).cast("long").as("len"),
        posexplode(split(col("text"), "")))
      .toDF("doc_id", "len", "pos", "c")
      .select(col("doc_id"),
        expr("CAST(pos * 64 div len AS INT)").as("blk"),
        ascii(col("c")).cast("long").as("code"))
    val blocks = codes.groupBy("doc_id", "blk")
      .agg(sum(col("code")).as("bsum"), count(lit(1)).as("bn"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val fp = blocks
      .withColumn("tsum", sum(col("bsum")).over(wDoc))
      .withColumn("tn", sum(col("bn")).over(wDoc))
      .withColumn("bit",
        (col("bsum") * col("tn") > col("tsum") * col("bn")).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum(expr("CASE WHEN bit = 1 AND blk < 32 " +
          "THEN shiftleft(CAST(1 AS BIGINT), 31 - blk) ELSE CAST(0 AS BIGINT) END"))
          .as("fp_hi"),
        sum(expr("CASE WHEN bit = 1 AND blk >= 32 " +
          "THEN shiftleft(CAST(1 AS BIGINT), 63 - blk) ELSE CAST(0 AS BIGINT) END"))
          .as("fp_lo"))
    val blocks4 = fp.select(col("doc_id"), col("fp_hi"), col("fp_lo"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blk_sig",
        when(col("blk") === 0, expr("shiftright(fp_hi, 16)"))
          .when(col("blk") === 1, col("fp_hi").bitwiseAND(lit(65535L)))
          .when(col("blk") === 2, expr("shiftright(fp_lo, 16)"))
          .otherwise(col("fp_lo").bitwiseAND(lit(65535L))))
    blocks4.as("x").join(blocks4.as("y"),
        col("x.blk") === col("y.blk") && col("x.blk_sig") === col("y.blk_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp_hi").as("hi_a"), col("x.fp_lo").as("lo_a"),
        col("y.fp_hi").as("hi_b"), col("y.fp_lo").as("lo_b"))
      .distinct()
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("bigint"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
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

  /** Shared frame-energy subplan: (doc_id, nf, energies) with the scaled
    * integer RMS per `frame`-byte window — identical arithmetic to
    * [[audioEnergy]], computed relationally. The byte array materializes
    * once per doc; the per-frame fold reads slices of it (O(bytes) total).
    */
  private def frameEnergies(docs: DataFrame, frame: Int): DataFrame = {
    val fr = lit(frame)
    docs
      .select(col("doc_id"),
        transform(sequence(lit(1), length(col("text"))),
          i => ascii(col("text").substr(i, lit(1)))).as("bytes"))
      .withColumn("nf", (size(col("bytes")) / frame).cast("long"))
      .withColumn("energies",
        when(col("nf") > 0,
          transform(sequence(lit(0L), col("nf") - 1),
            k => floor(sqrt(
              aggregate(slice(col("bytes"), (k * fr + 1).cast("int"), fr),
                lit(0L), (a, x) => a + (x - 128).cast("long") * (x - 128))
                .cast("double") / frame.toDouble) * 1000 + 0.5).cast("long")))
          .otherwise(array().cast("array<bigint>")))
      .drop("bytes")
  }

  /** Silence / low-activity segment detection over the framed PCM stub:
    * per-frame RMS energies (identical arithmetic to [[audioEnergy]] —
    * IEEE sqrt is exactly rounded, so the scaled-integer energies are
    * engine-portable) computed RELATIONALLY, then consecutive
    * below-threshold frames collapsed to runs with the gaps-and-islands
    * window (frame index minus per-doc silent rank is constant within a
    * run). Per doc: silent-frame count, run count, longest run.
    *
    * Scale shape: energies reduce to a per-doc array BEFORE the explode,
    * so frame rows carry one long each — the byte payload is never
    * replicated across frames; both islands windows partition by doc_id
    * (one exchange, reused).
    */
  def silenceRuns(docs: DataFrame, frame: Int = 64,
      threshold: Long = 44000L): DataFrame = {
    val withEnergies = frameEnergies(docs, frame)
    val frames = withEnergies
      .select(col("doc_id"), col("nf"), posexplode_outer(col("energies")))
      .withColumnRenamed("pos", "k").withColumnRenamed("col", "en")
    val silent = frames.where(col("en") < threshold)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("k"))
    val runs = silent
      .withColumn("grp", col("k") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
    val perDoc = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"), sum(col("run_len")).as("n_silent"),
        max(col("run_len")).as("longest_run"))
    withEnergies.select(col("doc_id"), col("nf").as("n_frames"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"))
  }

  /** Scene-change detection (video-ish stub): a boundary wherever the
    * frame-to-frame energy delta exceeds `threshold` — the lag-window
    * complement to [[silenceRuns]]'s islands. Per doc: boundary count,
    * scene count (boundaries + 1), and the largest jump. Same scale shape:
    * per-doc energy arrays before the explode, one doc_id window exchange.
    */
  def sceneChanges(docs: DataFrame, frame: Int = 64,
      threshold: Long = 3000L): DataFrame = {
    val withEnergies = frameEnergies(docs, frame)
    val frames = withEnergies
      .select(col("doc_id"), col("nf"), posexplode_outer(col("energies")))
      .withColumnRenamed("pos", "k").withColumnRenamed("col", "en")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("k"))
    val deltas = frames
      .withColumn("delta", abs(col("en") - lag(col("en"), 1).over(byDoc)))
    val perDoc = deltas.groupBy("doc_id")
      .agg(sum(when(col("delta") >= threshold, 1L).otherwise(0L)).as("n_boundaries"),
        max(coalesce(col("delta"), lit(0L))).as("max_delta"))
    withEnergies.select(col("doc_id"), col("nf").as("n_frames"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_boundaries"), lit(0L)).as("n_boundaries"),
        when(col("n_frames") === 0, lit(0L))
          .otherwise(coalesce(col("n_boundaries"), lit(0L)) + 1).as("n_scenes"),
        coalesce(col("max_delta"), lit(0L)).as("max_delta"))
  }
}
