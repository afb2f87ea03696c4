package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamingIngest
import graft.tsdb.{Sample, StoreSettings, TimeSeriesStore}

/** Drive the streaming topology end-to-end: a MemoryStream ingestion query
  * feeding the hot tier concurrently with a processing-time purge loop that
  * archives + acks aged partitions — the reference's microservice topology
  * (service.js:113-150) in one Spark app.
  *
  * Run: `sbt "runMain graft.examples.StreamingDemo"`
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft-stream-demo").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    store.initialize()
    println(s"[demo] store at $root")

    val (input, ingestQ) = StreamingIngest.sampleStream(spark, store)
    input.addData(
      Sample("ETag", 1L, "One", 100L, "w1", 0L),
      Sample("ETag", 2L, "Two", 100L, "w1", 1L),
      Sample("FTag", 7L, "Seven", 100L, "w1", 2L))
    ingestQ.processAllAvailable()
    println(s"[demo] streamed 3 samples; hot rows = ${store.hotDF.count()}")
    input.addData(Sample("ETag", 2L, "Two-v2", 200L, "w1", 3L))
    ingestQ.processAllAvailable()
    val read1 = store.readData(Map("ETag" -> (0L, 10L), "FTag" -> (0L, 10L)))
    println(s"[demo] read after streamed upsert: $read1")

    // age everything and let the purge loop tier it out
    val now = System.currentTimeMillis()
    store.clock = () => now + 600000L
    val (purgeQ, acked) = StreamingIngest.purgeLoop(spark, store, ageThresholdSec = 60)
    val deadline = System.currentTimeMillis() + 30000
    while (acked.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(250)
    println(s"[demo] purge loop acked ${acked.get()} partitions; hot rows = ${store.hotDF.count()}, cold rows = ${store.coldDF.count()}")

    val read2 = store.readData(Map("ETag" -> (0L, 10L), "FTag" -> (0L, 10L)))
    println(s"[demo] read after tiering: $read2")
    val ok = read1 == read2 && store.hotDF.count() == 0
    println(s"[demo] streamed data survived tiering intact: $ok")

    // continuous LWW via custom streaming state: duplicates and stale
    // re-writes are suppressed inside the stream itself
    val lwwIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Sample](
      implicitly[org.apache.spark.sql.Encoder[Sample]](
        org.apache.spark.sql.Encoders.product[Sample]), spark)
    val lwwQ = StreamingIngest.streamingLww(spark, lwwIn.toDS(), stateTtlMs = 0L)
      .writeStream.outputMode("append").format("memory").queryName("lww_demo").start()
    lwwIn.addData(Sample("S", 9L, "first", 100L, "w", 0L),
      Sample("S", 9L, "second", 110L, "w", 1L))
    lwwQ.processAllAvailable()
    lwwIn.addData(Sample("S", 9L, "stale", 90L, "w", 2L)) // older — suppressed
    lwwQ.processAllAvailable()
    val lwwOut = spark.table("lww_demo").collect().map(_.getString(2)).toSeq
    println(s"[demo] streaming LWW emitted values: $lwwOut (stale suppressed: ${!lwwOut.contains("stale")})")
    lwwQ.stop()

    // multimodal: real PNG encode on the executors, batched ImageIO decode
    val media = graft.analytics.Multimodal.withEncodedImage(spark,
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val feats = graft.analytics.Multimodal.decodeImageFeatures(spark, media, batchSize = 64)
    println(s"[demo] multimodal features decoded: ${feats.count()} rows, sample: ${feats.head()}")

    ingestQ.stop(); purgeQ.stop(); spark.stop()
    if (!ok) sys.exit(1)
  }
}
