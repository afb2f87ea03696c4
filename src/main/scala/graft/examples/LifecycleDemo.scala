package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** End-to-end lifecycle drive of the public store API — the same topology as
  * the reference's example microservice (reference:
  * examples/wrap-it-into-microservice/service.js): ingest, range reads,
  * purge scan, archive consumer, ack, cross-tier read.
  *
  * Run: `sbt "runMain graft.examples.LifecycleDemo"`
  */
object LifecycleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-lifecycle-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft-demo").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    val epoch = store.initialize()
    println(s"[demo] initialized store at $root epoch=$epoch writer=${store.writerId}")

    val bytes = store.write(Map(
      "GapTag" -> Map(1L -> "One", 2L -> "Two", 10L -> "Ten", 20L -> "Twenty"),
      "SerialTag" -> Map(1L -> "One", 2L -> "Two", 3L -> "Three", 4L -> "Four")))
    println(s"[demo] wrote 8 samples; hot tier = $bytes bytes")

    store.flushL0() // LSM flush: L0 batch files → Hive-partitioned tier
    store.write(Map("SerialTag" -> Map(3L -> "THREE-v2")))
    store.flushL0()
    store.write(Map("SerialTag" -> Map(3L -> "THREE-v3")))
    val nFlushed = store.flushL0()
    println(s"[demo] re-wrote SerialTag ts=3 twice (upserts); flushed $nFlushed L0 batch(es)")

    // LSM compaction: merge the multi-file partition, dropping superseded members
    val hotRowsBefore = store.hotDF.count()
    val nCompacted = store.compact(minFiles = 2, applyLww = true)
    println(s"[demo] compacted $nCompacted partitions: hot rows $hotRowsBefore -> ${store.hotDF.count()} (superseded members merged away)")

    val read1 = store.readData(Map("GapTag" -> (0L, 50L), "SerialTag" -> (0L, 50L)))
    println(s"[demo] readData full range: $read1")

    val idx = store.readIndex(Map("GapTag" -> (0L, 50L)))
    println(s"[demo] readIndex GapTag pages (newest first): ${idx("GapTag").map(_.page)}")

    val page = store.readPage("GapTag-10", 0L, 50L)
    println(s"[demo] readPage GapTag-10: $page")

    println("[demo] waiting 2s so partitions age past the 1s purge threshold…")
    Thread.sleep(2100)
    val ids = store.purgeScan(partitionAgeThreshold = 1, maxPartitionsToMark = 10)
    println(s"[demo] purgeScan marked ${ids.size} partitions: $ids")

    // the consumer loop: archive each entry to cold, then ack
    store.pendingPurgeEntries().foreach { e =>
      store.archiveToCold(e.id)
      val acked = store.purgeAck(e.id, e.partitionName, e.tag)
      println(s"[demo] archived+acked ${e.partitionName} (${e.data.size} samples) → ack=$acked")
    }
    println(s"[demo] hot rows after purge: ${store.hotDF.count()}  cold rows: ${store.coldDF.count()}")

    val read2 = store.readData(Map("GapTag" -> (0L, 50L), "SerialTag" -> (0L, 50L)))
    println(s"[demo] readData after tiering (served from cold): $read2")
    val ok = read2 == read1
    println(s"[demo] cross-tier read identical to pre-purge read: $ok")
    store.readRangeDF("GapTag", 0L, 50L).explain("formatted")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
