package graft

import java.nio.file.Files

import scala.collection.immutable.SortedMap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** Parity suite mirroring the reference's Mocha integration tests
  * (/root/reference/test/consumer-test.js; scenario line cites inline).
  */
class TimeSeriesStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshStore(width: Long = 5L): TimeSeriesStore = {
    val root = Files.createTempDirectory("graft-store").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = width))
    store.initialize()
    store
  }

  private val gapSerialBatch: Map[String, Map[Long, String]] = Map(
    "GapTag" -> Map(1L -> "One", 2L -> "Two", 10L -> "Ten", 20L -> "Twenty"),
    "SerialTag" -> Map(1L -> "One", 2L -> "Two", 3L -> "Three", 4L -> "Four"))

  // consumer-test.js:529-555 — read range covering all data
  test("read with bigger range returns all data ascending") {
    val store = freshStore()
    store.write(gapSerialBatch)
    val got = store.readData(Map("GapTag" -> (0L, 50L), "SerialTag" -> (0L, 50L)))
    assert(got("GapTag") === SortedMap(1L -> "One", 2L -> "Two", 10L -> "Ten", 20L -> "Twenty"))
    assert(got("SerialTag") === SortedMap(1L -> "One", 2L -> "Two", 3L -> "Three", 4L -> "Four"))
  }

  // Tags are free-form strings (≤ 200 chars, index.js:15): Spark's
  // partitionBy Hive-escapes special characters in partition values, so the
  // driver-side flush/purge paths must produce the identical escaped dir
  // names or one tag splits into two divergent layouts.
  test("tags with Hive-escapable characters use one directory layout across both flush lanes") {
    val tag = "Sensor A:1/B%2" // colon, slash, percent get %-escaped
    val store = freshStore()
    // lane 1: L0 write + driver-side regroup flush
    store.write(Map(tag -> Map(1L -> "One", 2L -> "Two")))
    store.flushL0()
    // lane 2: distributed partitionBy append (Spark-escaped dirs)
    val sq = spark
    import sq.implicits._
    store.writeSamplesDistributed(
      Seq((tag, 3L, "Three", 10L, "w2", 100L), (tag, 11L, "Eleven", 10L, "w2", 101L))
        .toDF("tag", "ts", "value", "ingestTs", "writerId", "seq"))
    // exactly ONE tag directory exists under hot/, in the escaped form
    val hotRoot = java.nio.file.Paths.get(store.rootDir, store.settings.settingsHash, "hot")
    val tagDirs = Files.list(hotRoot).iterator()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (tagDirs.hasNext) {
      val n = tagDirs.next().getFileName.toString
      if (n.startsWith("tag=")) names += n
    }
    assert(names.toSeq === Seq("tag=Sensor A%3A1%2FB%252"))
    // both lanes' rows come back through the one logical tag — Spark plan
    // and driver fast path agree
    val got = store.readData(Map(tag -> (0L, 50L)))
    assert(got(tag) === SortedMap(1L -> "One", 2L -> "Two", 3L -> "Three", 11L -> "Eleven"))
    // compaction matches the escaped dirs (multi-file partition from the
    // two lanes merges; silently-skipped would return 0)
    assert(store.compact(minFiles = 2) >= 1)
    val afterCompact = store.readData(Map(tag -> (0L, 50L)))
    assert(afterCompact(tag) === got(tag))
    // purge lifecycle resolves the escaped partition dir too
    store.clock = () => 1000000L
    val ids = store.purgeScan(partitionAgeThreshold = 1, maxPartitionsToMark = 10)
    assert(ids.nonEmpty)
    ids.foreach { id => store.archiveToCold(id); store.purgeAck(id, "p", tag) }
    val afterPurge = store.readData(Map(tag -> (0L, 50L)))
    assert(afterPurge(tag) === got(tag)) // cold∪hot still serves everything
  }

  // consumer-test.js:557-581 — disjoint range: tag omitted from result
  test("read with non-overlapping range returns no data") {
    val store = freshStore()
    store.write(gapSerialBatch)
    val got = store.readData(Map("GapTag" -> (30L, 100L)))
    assert(!got.contains("GapTag"))
  }

  // consumer-test.js:583-610 — single-point range
  test("read single point") {
    val store = freshStore()
    store.write(gapSerialBatch)
    val got = store.readData(Map("GapTag" -> (1L, 1L), "SerialTag" -> (4L, 4L)))
    assert(got("GapTag") === SortedMap(1L -> "One"))
    assert(got("SerialTag") === SortedMap(4L -> "Four"))
  }

  // consumer-test.js:612-668 — partial overlap / interior subset with gaps
  test("read partial and interior ranges") {
    val store = freshStore()
    store.write(gapSerialBatch)
    val got = store.readData(Map("GapTag" -> (2L, 10L), "SerialTag" -> (3L, 4L)))
    assert(got("GapTag") === SortedMap(2L -> "Two", 10L -> "Ten"))
    assert(got("SerialTag") === SortedMap(3L -> "Three", 4L -> "Four"))
  }

  // consumer-test.js:738-765 — update semantics: last write wins
  test("re-written timestamps resolve to the last write") {
    val store = freshStore(width = 5L)
    store.write(Map("SerialTag" -> Map(55L -> "One")))
    store.write(Map("SerialTag" -> Map(55L -> "Two")))
    store.write(Map("SerialTag" -> Map(56L -> "Three")))
    store.write(Map("SerialTag" -> Map(55L -> "Four")))
    val got = store.readData(Map("SerialTag" -> (0L, 100L)))
    assert(got("SerialTag") === SortedMap(55L -> "Four", 56L -> "Three"))
  }

  // consumer-test.js:345-384 — index pages returned newest-partition-first
  test("readIndex returns pages newest-first with epoch-relative weights") {
    val store = freshStore(width = 5L)
    store.write(gapSerialBatch)
    val idx = store.readIndex(Map("GapTag" -> (0L, 50L)))
    val pages = idx("GapTag")
    assert(pages.map(_.page) === Seq("GapTag-20", "GapTag-10", "GapTag-0"))
    assert(pages.map(_.sortWeight) === pages.map(_.sortWeight).sorted) // ascending weight = newest first
    val idxEmpty = store.readIndex(Map("NoSuchTag" -> (0L, 50L)))
    assert(idxEmpty("NoSuchTag").isEmpty)
  }

  // consumer-test.js:105-157 — partition layout: samples land in the right pages
  test("samples are partitioned by partitionStart = ts - ts % width") {
    val store = freshStore(width = 10L)
    store.write(Map("T" -> Map(0L -> "a", 9L -> "b", 10L -> "c", 21L -> "d")))
    assert(store.readPage("T-0", 0L, 100L) === SortedMap(0L -> "a", 9L -> "b"))
    assert(store.readPage("T-10", 0L, 100L) === SortedMap(10L -> "c"))
    assert(store.readPage("T-20", 0L, 100L) === SortedMap(21L -> "d"))
  }

  // consumer-test.js:159-279 — samples on both sides of the epoch (negative keys)
  test("negative sort keys partition correctly") {
    val store = freshStore(width = 10L)
    store.write(Map("T" -> Map(-21L -> "past", 21L -> "future")))
    val got = store.readData(Map("T" -> (-100L, 100L)))
    assert(got("T") === SortedMap(-21L -> "past", 21L -> "future"))
    // JS BigInt and Java Long % both truncate toward zero: -21 → partition -30? No: -21 - (-21 % 10) = -21 - (-1) = -20.
    assert(store.partitionStartOf(-21L) === -20L)
  }

  // validation golden messages (consumer-test.js:41-103, 698-736)
  test("ranges ending at negative sort keys still find their partition") {
    // truncated-mod partition starts sit ABOVE negative members (ts=-21 →
    // partition -20); the upper prune bound must be partitionStartOf(end),
    // not end (the reference's own index scan loses this row, index.js:215)
    val store = freshStore(10L)
    store.write(Map("T" -> Map(-21L -> "neg", -35L -> "lower")))
    store.flushL0() // bug only bites once partition-dir pruning applies
    val got = store.readData(Map("T" -> (-30L, -21L)))
    assert(got("T") === scala.collection.immutable.SortedMap(-21L -> "neg"))
    assert(store.readRangeDF("T", -30L, -21L).count() === 1)
    // newest-first; partition -30 overlaps too (it holds ts ∈ [-39,-30])
    assert(store.readIndex(Map("T" -> (-30L, -21L)))("T").map(_.page) ===
      Seq("T--20", "T--30"))
  }

  test("write validations reproduce reference error messages") {
    val store = freshStore()
    val e1 = intercept[IllegalArgumentException](store.write(Map.empty))
    assert(e1.getMessage === "Parameter 'keyValuePairs' should contain atleast one item to insert.")
    val longTag = "A" * 201
    val e2 = intercept[IllegalArgumentException](store.write(Map(longTag -> Map(1L -> "x"))))
    assert(e2.getMessage ===
      s"""Parameter 'keyValuePairs' has multiple Errors: Key "$longTag" has name which extends character limit(200).""")
    // the reference's counter guard fires on the 2002nd sample (index.js:116-118)
    val big = Map("T" -> (0L until 2002L).map(i => i -> i.toString).toMap)
    val e3 = intercept[IllegalArgumentException](store.write(big))
    assert(e3.getMessage === "Sample size exceeded limit of 2000.")
  }

  test("read validations reproduce reference error messages") {
    val store = freshStore()
    store.write(gapSerialBatch)
    val e1 = intercept[IllegalArgumentException](store.readData(Map.empty))
    assert(e1.getMessage === "Parameter 'partitionRanges' should contain atleast one range for query.")
    val e2 = intercept[IllegalArgumentException](store.readData(Map("T" -> (10L, 1L))))
    assert(e2.getMessage ===
      "Parameter 'partitionRanges' has multiple Errors: Invalid range; start should be smaller than end for T.")
    val tooMany = (1 to 101).map(i => s"T$i" -> (0L, 1L)).toMap
    val e3 = intercept[IllegalArgumentException](store.readData(tooMany))
    assert(e3.getMessage === "Parameter 'partitionRanges' cannot have partitions more than 100.")
  }

  test("distributed bulk ingest produces the same layout and read results") {
    import spark.implicits._
    val store = freshStore(5L)
    store.clock = () => 50L // first write's ingestTs predates the bulk batch
    store.write(Map("DTag" -> Map(1L -> "one")))
    // bulk lane: a Dataset[Sample] appended executor-parallel
    val bulk = Seq(
      graft.tsdb.Sample("DTag", 2L, "two", 100L, "bulk", 10L),
      graft.tsdb.Sample("DTag", 1L, "one-v2", 100L, "bulk", 11L), // upsert
      graft.tsdb.Sample("ETag", 7L, "seven", 100L, "bulk", 12L)).toDF()
    store.writeSamplesDistributed(bulk)
    val got = store.readData(Map("DTag" -> (0L, 50L), "ETag" -> (0L, 50L)))
    assert(got("DTag") === scala.collection.immutable.SortedMap(1L -> "one-v2", 2L -> "two"))
    assert(got("ETag") === scala.collection.immutable.SortedMap(7L -> "seven"))
    // activity from the bulk lane is visible: both touched partitions
    // (DTag-0, ETag-5) become purge-eligible
    store.clock = () => 10000000L
    val ids = store.purgeScan(1, 10)
    assert(ids.size === 2)
  }

  test("registered SQL views query the live store") {
    val store = freshStore(5L)
    store.write(Map("VTag" -> Map(1L -> "a", 7L -> "b")))
    store.registerViews("vtest")
    val n = spark.sql(
      "SELECT count(*) FROM vtest_all WHERE tag = 'VTag' AND ts BETWEEN 0 AND 10")
      .collect()(0).getLong(0)
    assert(n === 2L)
    // views auto-refresh on mutation — NO re-register call here
    store.write(Map("VTag" -> Map(9L -> "c")))
    val n2 = spark.sql("SELECT count(*) FROM vtest_all WHERE tag = 'VTag'")
      .collect()(0).getLong(0)
    assert(n2 === 3L)
    // and survive a flush's file moves (the pinned-listing failure mode)
    store.flushL0()
    val n3 = spark.sql("SELECT count(*) FROM vtest_all WHERE tag = 'VTag'")
      .collect()(0).getLong(0)
    assert(n3 === 3L)
  }

  test("writeSamples with an empty batch is a no-op (no stray L0 file, no throw)") {
    val store = freshStore(5L)
    store.writeSamples(Seq.empty)
    assert(store.hotBytes === 0L)
    store.write(Map("ETag" -> Map(1L -> "x")))
    store.writeSamples(Seq.empty)
    assert(store.readData(Map("ETag" -> (0L, 10L)))("ETag").size === 1)
  }

  test("large L0 flush runs distributed across multiple tasks") {
    // directFlushMaxBytes = 0 forces every flush down the distributed
    // branch regardless of volume
    val root = Files.createTempDirectory("graft-dist-flush").toString
    val store = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 10L), directFlushMaxBytes = 0L)
    store.initialize()
    // samples spanning 6 (tag, partition) combos
    store.write(Map(
      "FTagA" -> Map(1L -> "a1", 11L -> "a2", 21L -> "a3"),
      "FTagB" -> Map(1L -> "b1", 11L -> "b2", 21L -> "b3")))
    val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        maxTasks.updateAndGet(m => math.max(m, sc.stageInfo.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE rightly coalesces a 6-row shuffle to one partition; disable the
    // coalescing so the assertion sees the plan's parallelism, which is
    // what survives at real flush volumes.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      assert(store.flushL0() === 1)
      // listener events are async — poll briefly for the write stage
      val deadline = System.currentTimeMillis() + 10000
      while (maxTasks.get() <= 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.sparkContext.removeSparkListener(listener)
    }
    // the repartition(tag, partition_start) write stage ran wide, not as
    // the old coalesce(1) single task
    assert(maxTasks.get() > 1, s"flush write stage used ${maxTasks.get()} task(s)")
    // every partition landed and reads see the flushed data
    val got = store.readData(Map("FTagA" -> (0L, 30L), "FTagB" -> (0L, 30L)))
    assert(got("FTagA") === SortedMap(1L -> "a1", 11L -> "a2", 21L -> "a3"))
    assert(got("FTagB") === SortedMap(1L -> "b1", 11L -> "b2", 21L -> "b3"))
  }

  test("oversized-partition purge ack takes the distributed anti-join branch") {
    // directFlushMaxBytes = 0 forces the distributed ack path (and the
    // distributed flush) regardless of volume
    val root = Files.createTempDirectory("graft-dist-ack").toString
    val store = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L), directFlushMaxBytes = 0L)
    store.initialize()
    store.clock = () => 1000L
    store.write(Map("ATag" -> Map(1L -> "a", 2L -> "b", 3L -> "c")))
    store.flushL0()
    store.clock = () => 10000000L
    val ids = store.purgeScan(1, 10)
    assert(ids.nonEmpty)
    val e = store.loadPurgeEntry(ids.head).get
    val (pName, pKey) = (e.partitionName, e.tag)
    // a write AFTER the snapshot must survive the distributed anti-join
    store.write(Map("ATag" -> Map(5L -> "late")))
    store.flushL0()
    assert(store.purgeAck(e.id, pName, pKey) === 1)
    val got = store.readData(Map("ATag" -> (0L, 99L)))
    assert(got("ATag") === SortedMap(5L -> "late"))
  }

  test("concurrent writer threads serialize cleanly; every sample lands") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val store = freshStore(100L)
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = (0 until 4).map { t =>
      Future {
        (0 until 5).foreach { i =>
          store.write(Map(s"CTag$t" -> Map((t * 100 + i).toLong -> s"v$t-$i")))
        }
      }
    }
    Await.result(Future.sequence(futures), 60.seconds)
    pool.shutdown()
    val got = store.readData((0 until 4).map(t => s"CTag$t" -> (0L, 1000L)).toMap)
    (0 until 4).foreach { t =>
      assert(got(s"CTag$t").size === 5, s"tag CTag$t")
      (0 until 5).foreach(i => assert(got(s"CTag$t")((t * 100 + i).toLong) === s"v$t-$i"))
    }
    // a flush after the contention keeps everything readable
    store.flushL0()
    val got2 = store.readData((0 until 4).map(t => s"CTag$t" -> (0L, 1000L)).toMap)
    assert(got2 === got)
  }

  test("activity-log compaction keeps the net purge-eligibility state") {
    val store = freshStore(5L)
    var now = 1000L
    store.clock = () => now
    (1 to 20).foreach { i => now += 10; store.write(Map("ATag" -> Map(1L -> s"v$i"))) }
    val before = store.recentActivityDF.collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    val removed = store.compactActivityLog()
    assert(removed > 0)
    val after = store.recentActivityDF.collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    assert(after === before)
    // purge still works on the compacted log
    now += 1000000L
    assert(store.purgeScan(1, 10).size === 1)
  }

  test("reference-format cold sink writes ts,archiveTime,base64(value) lines") {
    val store = freshStore(5L)
    store.clock = () => 1000L
    store.write(Map("RTag" -> Map(1L -> "One", 2L -> "Two")))
    store.clock = () => 999999L
    val ids = store.purgeScan(1, 10)
    assert(ids.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-rawdb")
    store.archiveToReferenceFormat(ids.head, dir)
    val f = dir.resolve("RTag-0.txt")
    assert(java.nio.file.Files.exists(f))
    val txt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
    val b64 = (s: String) => java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    assert(txt === s"\r\n1,999999,${b64("One")}\r\n2,999999,${b64("Two")}")
    // and the engine reads the reference's cold format back
    val back = store.readReferenceFormat(dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(back === Set(("RTag-0", 1L, 999999L, "One"), ("RTag-0", 2L, 999999L, "Two")))
  }

  // consumer-test.js:767-799 — purge marks aged partitions, data still readable
  test("purgeScan marks aged partitions and leaves data readable") {
    val store = freshStore(width = 5L)
    var now = 1000000L
    store.clock = () => now
    store.write(gapSerialBatch)
    now += 2000 // 2 s later, threshold 1 s
    val ids = store.purgeScan(partitionAgeThreshold = 1, maxPartitionsToMark = 10)
    assert(ids.size === 4) // GapTag-0, GapTag-10, GapTag-20, SerialTag-0
    // marked but un-acked: reads still serve everything (consumer-test.js:925-933)
    val got = store.readData(Map("GapTag" -> (0L, 50L), "SerialTag" -> (0L, 50L)))
    assert(got("GapTag").size === 4 && got("SerialTag").size === 4)
    // consumer-test.js:898-934 — re-scan marks nothing new
    val again = store.purgeScan(partitionAgeThreshold = 1, maxPartitionsToMark = 10)
    assert(again.isEmpty)
  }

  // consumer-test.js:848-896 + 1081-1131 — consume, archive, ack; payload shape
  test("purge entry payload round-trips and ack removes hot copy") {
    val store = freshStore(width = 5L)
    var now = 1000000L
    store.clock = () => now
    store.write(Map("ATag" -> Map(1L -> "One", 2L -> "Two")))
    now += 2000
    val ids = store.purgeScan(1, 10)
    assert(ids.size === 1)
    val entry = store.loadPurgeEntry(ids.head).get
    assert(entry.partitionName === "ATag-0")
    assert(entry.tag === "ATag")
    assert(entry.data === SortedMap(1L -> "One", 2L -> "Two"))
    store.archiveToCold(entry.id)
    assert(store.purgeAck(entry.id, entry.partitionName, entry.tag) === 1)
    // hot copy gone, but hot∪cold still serves the data
    assert(store.hotDF.count() === 0)
    val got = store.readData(Map("ATag" -> (0L, 50L)))
    assert(got("ATag") === SortedMap(1L -> "One", 2L -> "Two"))
    // double-ack → 0 (ack-purge.lua:25-27)
    assert(store.purgeAck(entry.id, entry.partitionName, entry.tag) === 0)
  }

  // consumer-test.js:936-989 — write racing a purge survives the ack
  test("concurrent write after purge mark survives ack") {
    val store = freshStore(width = 5L)
    var now = 1000000L
    store.clock = () => now
    store.write(Map("RTag" -> Map(1L -> "One")))
    now += 2000
    val ids = store.purgeScan(1, 10)
    assert(ids.size === 1)
    // a write AFTER the snapshot, into the same partition
    now += 10
    store.write(Map("RTag" -> Map(2L -> "Two")))
    store.archiveToCold(ids.head)
    assert(store.purgeAck(ids.head, "RTag-0", "RTag") === 1)
    // snapshotted row deleted from hot; post-snapshot row survives
    val hotRows = store.hotDF.select("ts").collect().map(_.getLong(0)).toSet
    assert(hotRows === Set(2L))
    val got = store.readData(Map("RTag" -> (0L, 50L)))
    assert(got("RTag") === SortedMap(1L -> "One", 2L -> "Two"))
    // the partition is active again (new write) → re-markable after aging
    now += 2000
    val again = store.purgeScan(1, 10)
    assert(again.size === 1)
  }

  // consumer-test.js:991-1039 — empty partition drops out of the index
  test("fully purged partition disappears from the index") {
    val store = freshStore(width = 5L)
    var now = 1000000L
    store.clock = () => now
    store.write(Map("ETag" -> Map(1L -> "One")))
    now += 2000
    val ids = store.purgeScan(1, 10)
    store.archiveToCold(ids.head)
    store.purgeAck(ids.head, "ETag-0", "ETag")
    val idx = store.readIndex(Map("ETag" -> (0L, 50L)))
    // hot index empty; the cold tier still advertises the partition for reads
    assert(store.hotDF.count() === 0)
    assert(idx("ETag").map(_.page) === Seq("ETag-0")) // via cold — reads must span tiers
  }

  // purge parameter validation (index.js:296-314)
  test("purge validations reproduce reference error messages") {
    val store = freshStore()
    val e1 = intercept[IllegalArgumentException](store.purgeScan(0, 10))
    assert(e1.getMessage === "Parameter 'partitionAgeThreshold' is invalid & should greater than 1.")
    val e2 = intercept[IllegalArgumentException](store.purgeScan(10, 0))
    assert(e2.getMessage === "Parameter 'maxPartitionsToMark' is invalid & should greater than 1.")
    val e3 = intercept[IllegalArgumentException](store.purgeAck("", "p", "k"))
    assert(e3.getMessage === "Invalid parameter 'purgeId'.")
  }

  // multi-writer epoch adoption (index.js:50-51 SET NX)
  test("second store instance adopts the first epoch") {
    val root = Files.createTempDirectory("graft-epoch").toString
    val s1 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    s1.clock = () => 111L
    val e1 = s1.initialize()
    val s2 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    s2.clock = () => 999L
    val e2 = s2.initialize()
    assert(e1 === 111L && e2 === 111L)
    assert(s1.writerId !== s2.writerId)
  }

  test("two writer instances sharing a root interleave writes; reads see both") {
    val root = Files.createTempDirectory("graft-multiw").toString
    val s1 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    val s2 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    s1.clock = () => 100L; s2.clock = () => 200L
    s1.initialize(); s2.initialize()
    s1.write(Map("MTag" -> Map(1L -> "from-s1", 2L -> "a")))
    s2.write(Map("MTag" -> Map(1L -> "from-s2", 3L -> "b"))) // newer ingestTs wins ts=1
    s1.flushL0() // s1 flushes BOTH writers' L0 files into the shared hot tier
    s1.write(Map("MTag" -> Map(4L -> "late-l0"))) // stays in L0
    val expect = scala.collection.immutable.SortedMap(
      1L -> "from-s2", 2L -> "a", 3L -> "b", 4L -> "late-l0")
    assert(s1.readData(Map("MTag" -> (0L, 50L)))("MTag") === expect)
    // a FRESH instance over the same root sees the same state
    val s3 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    s3.initialize()
    assert(s3.readData(Map("MTag" -> (0L, 50L)))("MTag") === expect)
  }

  // Multi-process contract (reference README.md:4): maintenance ops on a
  // shared root are serialized by the cross-process lease; a live foreign
  // holder refuses with the golden message, a crashed holder (expired
  // record) is taken over after its TTL.
  test("maintenance is lease-serialized across processes: held lease refuses, expiry recovers") {
    val root = Files.createTempDirectory("graft-lease").toString
    val settings = StoreSettings(partitionWidth = 5L)
    val store = new TimeSeriesStore(spark, root, settings, leaseWaitMs = 300L)
    store.initialize()
    store.write(Map("LTag" -> Map(1L -> "One")))
    val leaseFile = java.nio.file.Paths.get(root, settings.settingsHash, "lease")
    // a live foreign holder: flush is cleanly refused, data untouched
    Files.write(leaseFile,
      s"foreign-writer ${System.currentTimeMillis() + 60000}".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException](store.flushL0())
    assert(ex.getMessage.contains("Maintenance lease"))
    assert(ex.getMessage.contains("foreign-writer"))
    assert(store.readData(Map("LTag" -> (0L, 50L)))("LTag") === SortedMap(1L -> "One"))
    // a crashed holder: expired record is taken over, op proceeds,
    // lease is released afterwards
    Files.write(leaseFile,
      s"foreign-writer ${System.currentTimeMillis() - 1}".getBytes("UTF-8"))
    assert(store.flushL0() === 1)
    assert(!Files.exists(leaseFile))
    assert(store.readData(Map("LTag" -> (0L, 50L)))("LTag") === SortedMap(1L -> "One"))
  }

  // A plain write must NEVER fail because another process is
  // mid-maintenance (the reference's multi-process writes are
  // unconditionally accepted): past the L0 auto-flush threshold the
  // flush is opportunistic — it yields on a held lease and a later
  // flush picks the files up.
  test("writes never fail under a foreign maintenance lease; flush catches up after release") {
    val root = Files.createTempDirectory("graft-leasew").toString
    val settings = StoreSettings(partitionWidth = 5L)
    val store = new TimeSeriesStore(spark, root, settings, leaseWaitMs = 100L)
    store.initialize()
    val leaseFile = java.nio.file.Paths.get(root, settings.settingsHash, "lease")
    Files.write(leaseFile,
      s"foreign-writer ${System.currentTimeMillis() + 600000}".getBytes("UTF-8"))
    // 65 writes cross Limits.L0FlushFileCount (64): every one must land
    (1 to 65).foreach(i => store.write(Map("WTag" -> Map(i.toLong -> s"v$i"))))
    val got = store.readData(Map("WTag" -> (0L, 100L)))("WTag")
    assert(got.size === 65 && got(65L) === "v65")
    // holder releases → explicit flush succeeds and reads are unchanged
    Files.deleteIfExists(leaseFile)
    assert(store.flushL0() === 65)
    assert(store.readData(Map("WTag" -> (0L, 100L)))("WTag") === got)
  }

  // Two live instances racing maintenance on one root: the lease makes
  // them WAIT for each other (serialized), not fail — contention only
  // refuses after the bounded wait expires.
  test("concurrent maintenance from two instances serializes via the lease; both succeed") {
    val root = Files.createTempDirectory("graft-race").toString
    val s1 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    val s2 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    s1.initialize(); s2.initialize()
    (1 to 20).foreach(i => s1.write(Map("CTag" -> Map(i.toLong -> s"v$i"))))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(s1, s2).map { s =>
      new Thread(() =>
        try { (0 until 3).foreach(_ => s.flushL0()) }
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"maintenance race failed: ${errs.peek()}")
    // every sample landed exactly once (LWW collapses any double-flush)
    val got = s2.readData(Map("CTag" -> (0L, 50L)))("CTag")
    assert(got.size === 20 && got(7L) === "v7")
  }

  // The full purge lifecycle driven from a SECOND instance on the shared
  // root (the reference's stateless-consumer deployment, service.js):
  // B flushes A's L0, marks, archives, acks — and both instances then
  // serve the identical data from the cold tier.
  test("purge driven from a second instance on a shared root is safe end to end") {
    val root = Files.createTempDirectory("graft-xpurge").toString
    val s1 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    val s2 = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    var now = 1000000L
    s1.clock = () => now; s2.clock = () => now
    s1.initialize(); s2.initialize()
    s1.write(Map("XTag" -> Map(1L -> "One", 2L -> "Two")))
    now += 2000
    val ids = s2.purgeScan(1, 10) // B flushes A's L0 files and marks
    assert(ids.size === 1)
    val entry = s2.loadPurgeEntry(ids.head).get
    assert(entry.data === SortedMap(1L -> "One", 2L -> "Two"))
    s2.archiveToCold(ids.head)
    assert(s2.purgeAck(ids.head, entry.partitionName, entry.tag) === 1)
    val expect = SortedMap(1L -> "One", 2L -> "Two")
    assert(s1.readData(Map("XTag" -> (0L, 50L)))("XTag") === expect)
    assert(s2.readData(Map("XTag" -> (0L, 50L)))("XTag") === expect)
    // no lease left behind by either instance
    assert(!Files.exists(java.nio.file.Paths.get(root,
      StoreSettings(partitionWidth = 5L).settingsHash, "lease")))
  }

  // consumer-test.js:529-555 through the SERVING path, block cache cold
  // then warm, then across a file-replacing mutation: the cache key is
  // (path, size, mtime), so a compaction rewrite must MISS and re-read —
  // a warm cache can never serve pre-mutation bytes.
  test("fastRead serves identical results cache-cold, cache-warm, and after a rewrite") {
    val store = freshStore()
    store.write(gapSerialBatch)
    val ranges = Map("GapTag" -> (0L, 50L), "SerialTag" -> (0L, 50L))
    val cold = store.readData(ranges) // first touch: cache miss, files decode
    val warm = store.readData(ranges) // same immutable files: cache hit
    assert(cold === warm)
    assert(cold("GapTag") === SortedMap(1L -> "One", 2L -> "Two", 10L -> "Ten", 20L -> "Twenty"))
    // upsert + compact → the partition's files are REPLACED on disk
    store.write(Map("SerialTag" -> Map(3L -> "THREE-v2")))
    store.compact()
    val after = store.readData(ranges)
    assert(after("SerialTag") === SortedMap(1L -> "One", 2L -> "Two", 3L -> "THREE-v2", 4L -> "Four"))
    assert(after("GapTag") === cold("GapTag"))
    // and the post-rewrite state is itself stable warm
    assert(store.readData(ranges) === after)
  }

  // VERDICT r11 #7: readData's Map return IS a driver collect by
  // contract, so the Spark fallback path must fail cleanly under the
  // DriverBudget instead of OOMing — and direct callers to readDataDF.
  test("readData Spark path is DriverBudget-guarded; readDataDF stays available") {
    import graft.analytics.DriverBudget
    import graft.tsdb.Limits
    val store = freshStore(width = 10L)
    val base = 1700000000000L
    store.write(Map("BTag" -> (0 until 100).map(i => (base + i).toLong -> s"v$i").toMap))
    val ranges = Map("BTag" -> (base, base + 99L))
    val fast = store.readData(ranges) // fast path (tiny candidate set)
    Limits.fastPathMaxBytesOverride = 0L // force the Spark fallback
    try {
      // normal budget: Spark path answers identically
      assert(store.readData(ranges) === fast)
      // zero budget: clean failure naming the distributed alternative
      DriverBudget.budgetOverrideBytes = 0L
      val e = intercept[IllegalStateException](store.readData(ranges))
      assert(e.getMessage.contains("readDataDF"))
      // the distributed API itself is untouched by the guard
      assert(store.readDataDF(ranges).count() === 100L)
    } finally {
      DriverBudget.budgetOverrideBytes = -1L
      Limits.fastPathMaxBytesOverride = -1L
    }
  }

  // 10 tags × 200 samples chunk (consumer-test.js:670-696)
  test("bulk multi-tag chunk round-trips") {
    val store = freshStore(width = 10L)
    val base = 1700000000000L
    val batch = (0 until 10).map { t =>
      s"Tag$t" -> (0 until 200).map(i => (base + i).toLong -> s"$i").toMap
    }.toMap
    store.write(batch)
    val got = store.readData((0 until 10).map(t => s"Tag$t" -> (base, base + 199L)).toMap)
    assert(got.size === 10)
    (0 until 10).foreach { t =>
      assert(got(s"Tag$t").size === 200)
      assert(got(s"Tag$t")(base + 57L) === "57")
    }
  }
}
