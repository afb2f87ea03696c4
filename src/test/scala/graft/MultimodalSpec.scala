package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.analytics.Multimodal

/** Multimodal-column plumbing specs: binary+metadata schema, batched
  * mapPartitions decode shape, and the stubbed transform stages.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docsFixture = {
    import spark.implicits._
    Seq(
      (0L, "abcdefgh", 8L),
      (1L, "x", 1L),
      (2L, "a" * 100, 100L)).toDF("doc_id", "text", "n_chars")
  }

  test("withBinary attaches media bytes + typed metadata") {
    val r = Multimodal.withBinary(docsFixture).collect()
    val row0 = r.find(_.getLong(0) == 0L).get
    assert(row0.getAs[Array[Byte]]("media").toSeq === "abcdefgh".getBytes("UTF-8").toSeq)
    val meta = row0.getStruct(2)
    assert(meta.getAs[String]("format") === "fake/raw")
    assert(meta.getAs[Long]("n_bytes") === 8L)
  }

  test("withEncodedImage writes REAL PNG streams (magic + ImageIO-decodable)") {
    val rows = Multimodal.withEncodedImage(spark, docsFixture).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val png = r.getAs[Array[Byte]]("media")
      // PNG signature: 0x89 'P' 'N' 'G' \r \n 0x1a \n — a payload-byte
      // stub (the old withBinary) fails this on every row
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte,
        s"doc ${r.getLong(0)}: media is not a PNG stream")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth === 32 && img.getHeight === 32)
      assert(r.getAs[String]("format") === "image/png")
    }
  }

  test("decodeImageFeatures decodes real pixels: stats match the synthesis arithmetic") {
    val media = Multimodal.withEncodedImage(spark, docsFixture)
    val a = Multimodal.decodeImageFeatures(spark, media, batchSize = 2).collect()
    val b = Multimodal.decodeImageFeatures(spark, media, batchSize = 2).collect()
    assert(a.length === 3)
    assert(a.forall(_.batch_size <= 2))
    assert(a.map(f => (f.doc_id, f.px_checksum)).sorted.toSeq ===
      b.map(f => (f.doc_id, f.px_checksum)).sorted.toSeq)
    // driver-side replay of the synthesis for doc 0 ("abcdefgh"):
    // pixels = ascii codes then 1016 spaces
    val px = "abcdefgh".getBytes("UTF-8").map(_ & 0xff) ++ Array.fill(1016)(32)
    val f0 = a.find(_.doc_id == 0L).get
    assert(f0.width === 32 && f0.height === 32)
    assert(f0.px_sum === px.map(_.toLong).sum)
    assert(f0.n_bright === 0L) // ASCII < 128: a decode bug inflating bytes shows here
    assert(f0.px_checksum === px.foldLeft(0L)((acc, v) => (acc * 31 + v) % 1000000007L))
    // non-stub variance floor: distinct checksums across distinct docs
    assert(a.map(_.px_checksum).distinct.length === 3)
  }

  test("resizeEncoded: decode→resize→encode→decode loop is lossless and exact") {
    val media = Multimodal.withEncodedImage(spark, docsFixture)
    val r = Multimodal.resizeEncoded(spark, media, block = 8).collect()
    assert(r.length === 3)
    r.foreach { ri =>
      assert(ri.new_width === 4 && ri.new_height === 4)
      // the re-encoded PNG decodes back to the SAME pixels — the loop's
      // four codec legs are all real and lossless
      assert(ri.resized_digest === ri.roundtrip_digest,
        s"doc ${ri.doc_id}: PNG round-trip lost pixel data")
      assert(ri.png_bytes > 0L)
    }
    // driver-side replay for doc 1 ("x"): pixel 0 = 120, rest 32.
    // tile (0,0) mean = (120 + 63·32) / 64 = 33 (floor); other 15 tiles 32.
    val means = Array(33L) ++ Array.fill(15)(32L)
    val expected = means.foldLeft(0L)((acc, v) => (acc * 31 + v) % 1000000007L)
    assert(r.find(_.doc_id == 1L).get.resized_digest === expected)
  }

  test("corrupted media bytes fail the decode (a byte-arithmetic stub would not notice)") {
    import spark.implicits._
    val bad = Seq((9L, Array.fill[Byte](64)(7))).toDF("doc_id", "media")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageFeatures(spark, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("withEncodedVideo writes REAL multi-frame GIFs; demux samples decoded frames") {
    import spark.implicits._
    // doc 0: 8 bytes -> 1 frame; doc 2: 100 'a' -> 2 frames (64 + 36 pad)
    val media = Multimodal.withEncodedVideo(spark, docsFixture)
    media.collect().foreach { r =>
      val gif = r.getAs[Array[Byte]]("media")
      assert(new String(gif.slice(0, 6), "US-ASCII").startsWith("GIF8"),
        s"doc ${r.getLong(0)}: media is not a GIF container")
    }
    val out = Multimodal.decodeFrameSample(spark, media, stride = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L)._1 === 1L && out(0L)._2 === 1L)
    assert(out(2L)._1 === 2L && out(2L)._2 === 1L) // stride 2 samples frame 0 only
    // driver-side replay for doc 0 ("abcdefgh" + 56 pads): frame 0 pixels
    val px = "abcdefgh".getBytes("UTF-8").map(_ & 0xff) ++ Array.fill(56)(32)
    val expected = px.foldLeft(0L)((acc, v) => (acc * 131 + v) % 1000000007L)
    assert(out(0L)._3 === expected, "decoded GIF frame pixels diverge from synthesis")
  }

  test("corrupted video bytes fail the GIF demux") {
    import spark.implicits._
    val bad = Seq((9L, Array.fill[Byte](64)(7))).toDF("doc_id", "media")
    intercept[Throwable] {
      Multimodal.decodeFrameSample(spark, bad).collect()
    }
    ()
  }

  test("audioEnergy frames the buffer and computes exact scaled RMS") {
    import spark.implicits._
    // 130 × 'a' (97): per-frame c = 97-128 = -31, ssq = 64·961,
    // sqrt(961) = 31 exactly → energy 31000; 2 full frames, tail dropped
    val docs = Seq((0L, "a" * 130, 130L), (1L, "xy", 2L))
      .toDF("doc_id", "text", "n_chars")
    val r = Multimodal.audioEnergy(spark, Multimodal.withBinary(docs), frame = 64)
      .collect().map(a => a.doc_id -> ((a.n_frames, a.max_energy, a.energy_digest)))
      .toMap
    assert(r(0L) === ((2L, 31000L, (31000L * 31 + 31000L) % 1000000007L)))
    assert(r(1L) === ((0L, 0L, 0L))) // shorter than one frame
  }

  test("withEncodedAudio writes REAL RIFF/WAVE containers; decode reproduces the samples") {
    import spark.implicits._
    val docs = Seq((0L, "a" * 130, 130L), (1L, "xy", 2L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.withEncodedAudio(spark, docs)
    media.collect().foreach { r =>
      val wav = r.getAs[Array[Byte]]("media")
      // RIFF....WAVE magic — a naked-PCM stub fails on every row
      assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
      assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
      assert(r.getAs[String]("format") === "audio/wav")
    }
    // decoded energies == the byte-arithmetic stage on the raw payload:
    // the container round-trip is lossless
    val viaWav = Multimodal.decodeAudioEnergy(spark, media, frame = 64)
      .collect().map(a => (a.doc_id, a.n_frames, a.max_energy, a.energy_digest))
      .sortBy(_._1).toSeq
    val raw = Multimodal.audioEnergy(spark, Multimodal.withBinary(docs), frame = 64)
      .collect().map(a => (a.doc_id, a.n_frames, a.max_energy, a.energy_digest))
      .sortBy(_._1).toSeq
    assert(viaWav === raw, "WAV round-trip changed the PCM samples")
  }

  test("corrupted audio bytes fail the WAV decode") {
    import spark.implicits._
    val bad = Seq((9L, Array.fill[Byte](64)(7))).toDF("doc_id", "media")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioEnergy(spark, bad).collect()
    }
    ()
  }

  // ---- the LOSSY lane (round 13, VERDICT r12 next #4) ----

  test("withEncodedJpeg writes REAL JPEG streams; the lane is genuinely lossy") {
    import spark.implicits._
    val feats = Multimodal.decodeLossyFeatures(spark,
      Multimodal.withEncodedJpeg(spark, docsFixture, quality = 0.7f),
      toleranceMilli = 12000L).collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      assert(f.jpeg_magic, s"doc ${f.doc_id}: missing JFIF SOI magic")
      assert(f.width === 32 && f.height === 32 && f.n_px === 1024L)
      assert(f.decode_agree, s"doc ${f.doc_id}: double-decode diverged")
      assert(f.drift_ok, s"doc ${f.doc_id}: drift ${f.drift_milli} over band")
      // lossy means lossy: a zero-drift "JPEG" lane would be PNG
      // arithmetic wearing a JPEG name
      assert(f.drift_milli > 0L, s"doc ${f.doc_id}: drift is zero — lossless?")
    }
  }

  test("the drift band has headroom on the real corpus and catches corruption") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val enc = Multimodal.withEncodedJpeg(spark, docs, quality = 0.7f)
      .localCheckpoint(true)
    val clean = Multimodal.decodeLossyFeatures(spark, enc, 12000L).toDF()
    val mx = clean.agg(org.apache.spark.sql.functions.max("drift_milli"))
      .head().getLong(0)
    assert(mx > 0L && mx < 8000L,
      s"observed max drift $mx leaves < 1.5x headroom under the 12000 band")
    // corruption: zero out a run of entropy-coded bytes mid-stream. A
    // JPEG decoder either refuses the stream or produces pixels whose
    // drift blows the band — both are caught; silent acceptance is not.
    val corrupted = enc.map { li =>
      val b = li.media.clone()
      val start = b.length / 2
      java.util.Arrays.fill(b, start, math.min(b.length - 2, start + 64), 0.toByte)
      li.copy(media = b)
    }(org.apache.spark.sql.Encoders.product[graft.analytics.LossyImage])
    val caught =
      try {
        val rows = Multimodal.decodeLossyFeatures(spark, corrupted, 12000L)
          .collect()
        rows.count(f => !f.drift_ok || !f.decode_agree || !f.jpeg_magic)
      } catch { case _: org.apache.spark.SparkException => rows0(docs) }
    assert(caught > 0L, "corrupted streams sailed through the invariant gate")
  }

  private def rows0(docs: org.apache.spark.sql.DataFrame): Long = docs.count()

  test("withLossyAudio writes REAL ULAW WAVs; the lane is genuinely lossy") {
    val feats = Multimodal.decodeLossyAudioFeatures(spark,
      Multimodal.withLossyAudio(spark, docsFixture),
      toleranceMicro = 8000L).collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      assert(f.riff_magic, s"doc ${f.doc_id}: missing RIFF magic")
      assert(f.ulaw_format, s"doc ${f.doc_id}: container not tagged ULAW")
      assert(f.decode_agree, s"doc ${f.doc_id}: double-decode diverged")
      assert(f.drift_ok, s"doc ${f.doc_id}: drift ${f.drift_micro} over band")
      // lossy means lossy: zero drift would be the 8-bit PCM lane
      // wearing a µ-law name
      assert(f.drift_micro > 0L, s"doc ${f.doc_id}: drift is zero — lossless?")
    }
  }

  test("the audio drift band has headroom on the real corpus and catches corruption") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val enc = Multimodal.withLossyAudio(spark, docs).localCheckpoint(true)
    val clean = Multimodal.decodeLossyAudioFeatures(spark, enc, 8000L).toDF()
    val mx = clean.agg(org.apache.spark.sql.functions.max("drift_micro"))
      .head().getLong(0)
    assert(mx > 0L && mx < 5300L,
      s"observed max drift $mx leaves < 1.5x headroom under the 8000 band")
    // corruption: complement a run of µ-law payload bytes mid-stream —
    // flipping codes flips segment EXPONENTS (log-scale damage), so the
    // drift must blow the band (or the parse must refuse the container)
    val corrupted = enc.map { la =>
      val b = la.media.clone()
      val start = b.length / 2
      (start until math.min(b.length, start + 64)).foreach { i =>
        b(i) = (~b(i)).toByte
      }
      la.copy(media = b)
    }(org.apache.spark.sql.Encoders.product[graft.analytics.LossyAudio])
    val caught =
      try {
        Multimodal.decodeLossyAudioFeatures(spark, corrupted, 8000L)
          .collect()
          .count(f => !f.drift_ok || !f.decode_agree || !f.riff_magic ||
            !f.ulaw_format)
          .toLong
      } catch { case _: org.apache.spark.SparkException => rows0(docs) }
    assert(caught > 0L, "corrupted audio sailed through the invariant gate")
  }
}
