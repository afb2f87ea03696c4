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

  test("extractFeatures preserves rows, caps batch size, and is deterministic") {
    val media = Multimodal.withBinary(docsFixture)
    val a = Multimodal.extractFeatures(spark, media, batchSize = 2).collect()
    val b = Multimodal.extractFeatures(spark, media, batchSize = 2).collect()
    assert(a.length === 3)
    assert(a.forall(_.batch_size <= 2))
    assert(a.map(f => (f.doc_id, f.byte_checksum)).sorted.toSeq ===
      b.map(f => (f.doc_id, f.byte_checksum)).sorted.toSeq)
    assert(a.forall(_.feature.length === 8))
  }

  test("resizeStub halves dims and crops to a quarter of the bytes") {
    val r = Multimodal.resizeStub(Multimodal.withBinary(docsFixture))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // doc 2: width = 100 % 640 = 100 -> 50; height = 100 % 480 = 100 -> 50;
    // crop = (100+3) div 4 = 25
    assert(r(2L) === ((50, 50, 25L)))
    assert(r(1L) === ((0, 0, 1L)))
  }

  test("frameSample strides the byte buffer and counts frames") {
    val r = Multimodal.frameSample(spark, Multimodal.withBinary(docsFixture),
      stride = 4, batchSize = 2).collect().map(f => f.doc_id -> f.n_frames).toMap
    assert(r(0L) === 2) // 8 bytes, stride 4 -> indices 0,4
    assert(r(1L) === 1)
    assert(r(2L) === 25)
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
}
