package graft

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.{FeedLog, StreamingIngest}
import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** The engine-owned broker-log streaming source (`graft-feed`,
  * [[graft.sources.FeedTableProvider]]): offset semantics, admission
  * control, torn-tail exclusion, checkpoint restart, and the cross-JVM
  * producer topology — the consumer contract the reference gets from its
  * Redis-Streams consumer group (service.js:119-120), proven here piece
  * by piece on the machinery THIS repo implements.
  */
class FeedSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-feed-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def payload(tag: String, ts: Long, value: String,
      ingestTs: Long = 1L, writer: String = "w1", seq: Long = 0L): String =
    s"""{"tag":"$tag","ts":$ts,"value":"$value","ingestTs":$ingestTs,""" +
      s""""writerId":"$writer","seq":$seq}"""

  test("FeedLog framing round-trips; segments roll at segBytes; offsets are boundaries") {
    val dir = Files.createTempDirectory("feedlog-rt")
    val recs = (0 until 100).map(i => payload("a", i.toLong, s"v$i", seq = i.toLong))
    val placed = FeedLog.append(dir, recs, segBytes = 512L)
    assert(placed.size === 100)
    val segs = FeedLog.segments(dir)
    assert(segs.size > 1, s"expected a roll under 512-byte segments, got ${segs.size}")
    // every record reads back, in order, from its own (segment, pos)
    val back = segs.flatMap { s =>
      FeedLog.read(s, 0L, FeedLog.safeEnd(s, 0L)).map(_._2).toSeq
    }
    assert(back === recs)
    // safeEnd with a byte budget lands on a record boundary: reading the
    // budgeted range yields whole records only
    val first = segs.head
    val budgeted = FeedLog.safeEnd(first, 0L, maxBytes = 200L)
    val some = FeedLog.read(first, 0L, budgeted).map(_._2).toSeq
    assert(some.nonEmpty && some === recs.take(some.size))
  }

  test("RangeReader streams frames in O(record) memory, growing only for an outsized record") {
    val dir = Files.createTempDirectory("feedlog-big")
    // records straddling the 64 KiB refill buffer: a 100 KiB payload
    // between small ones forces the growth path AND the refill path
    val big = "x" * (100 << 10)
    val recs = Seq(payload("a", 1L, "small-1"), s"""{"big":"$big"}""",
      payload("a", 2L, "small-2"))
    FeedLog.append(dir, recs, segBytes = 1L << 30)
    val seg = FeedLog.segments(dir).head
    val r = FeedLog.openRange(seg, 0L, FeedLog.safeEnd(seg, 0L))
    try {
      val back = r.toVector
      assert(back.map(_._2) === recs)
      // positions are the true frame starts: re-reading any single
      // record from its own position round-trips
      back.foreach { case (pos, rec) =>
        val one = FeedLog.read(seg, pos,
          pos + 4L + rec.getBytes("UTF-8").length).toSeq
        assert(one === Seq((pos, rec)))
      }
    } finally r.close()
  }

  test("a torn tail is never exposed and becomes readable when completed") {
    val dir = Files.createTempDirectory("feedlog-torn")
    FeedLog.append(dir, Seq(payload("a", 1L, "one"), payload("a", 2L, "two")))
    val seg = FeedLog.segments(dir).head
    val goodEnd = FeedLog.safeEnd(seg, 0L)
    // a producer dies mid-record: full length word, half the payload
    val bytes = payload("a", 3L, "three").getBytes(StandardCharsets.UTF_8)
    val ch = FileChannel.open(seg, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
    try {
      val buf = ByteBuffer.allocate(4 + bytes.length / 2)
      buf.putInt(bytes.length).put(bytes, 0, bytes.length / 2).flip()
      while (buf.hasRemaining) ch.write(buf)
    } finally ch.close()
    assert(FeedLog.safeEnd(seg, 0L) === goodEnd,
      "safe frontier advanced into a torn record")
    // the batch audit path sees exactly the complete records
    val df = spark.read.format("graft-feed").option("path", dir.toString).load()
    assert(df.count() === 2L)
    // the missing bytes land (a restarted producer re-appends from its
    // own journal; here: complete the frame) -> the record appears
    val ch2 = FileChannel.open(seg, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
    try {
      val rest = ByteBuffer.wrap(bytes, bytes.length / 2, bytes.length - bytes.length / 2)
      while (rest.hasRemaining) ch2.write(rest)
    } finally ch2.close()
    assert(FeedLog.safeEnd(seg, 0L) > goodEnd)
    val healed = FeedLog.read(seg, goodEnd, FeedLog.safeEnd(seg, 0L)).map(_._2).toSeq
    assert(healed === Seq(payload("a", 3L, "three")))
  }

  test("admission control: a backlog drains in byte-budgeted micro-batches, exactly once") {
    val dir = Files.createTempDirectory("feedlog-adm")
    val recs = (0 until 400).map(i => payload("t" + i % 2, i.toLong, s"v$i", seq = i.toLong))
    FeedLog.append(dir, recs, segBytes = 4096L)
    val batches = new AtomicLong(0L)
    val rows = new AtomicLong(0L)
    val q = spark.readStream
      .format("graft-feed")
      .option("path", dir.toString)
      .option("maxBytesPerTrigger", 2048L)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) { batches.incrementAndGet(); rows.addAndGet(n) }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(rows.get() === 400L, "admission control lost or duplicated records")
    // ~34 KB of records under a 2 KiB budget: the backlog CANNOT fit in
    // one trigger; the exact count depends on frame sizes, the floor does not
    assert(batches.get() >= 8L,
      s"expected a byte-budgeted drain (>=8 batches), got ${batches.get()}")
  }

  test("checkpoint restart: the feed consumer resumes its offsets exactly once") {
    val dir = Files.createTempDirectory("feedlog-cp")
    val cp = Files.createTempDirectory("feedlog-cp-chk").toString
    val root = Files.createTempDirectory("feedlog-store").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 100L))
    store.initialize()
    // phase 1
    FeedLog.append(dir, (0 until 50).map(i =>
      payload("a", i.toLong, s"p1-$i", ingestTs = 1L, seq = i.toLong)))
    val q1 = StreamingIngest.feedSampleStream(spark, store, dir.toString,
      maxBytesPerTrigger = 1024L, checkpointDir = Some(cp))
    try q1.processAllAvailable() finally q1.stop()
    // the process is gone; only the checkpoint and the log survive.
    // phase 2: fresh records plus LWW rewrites of the first 10 keys
    FeedLog.append(dir, (50 until 80).map(i =>
      payload("a", i.toLong, s"p2-$i", ingestTs = 2L, seq = i.toLong)) ++
      (0 until 10).map(i =>
        payload("a", i.toLong, s"p2r-$i", ingestTs = 2L, writer = "w2", seq = 100L + i)))
    val q2 = StreamingIngest.feedSampleStream(spark, store, dir.toString,
      maxBytesPerTrigger = 1024L, checkpointDir = Some(cp))
    try q2.processAllAvailable() finally q2.stop()
    // RAW row count proves exactly-once across the restart (a replayed
    // phase-1 range would inflate it; LWW identity would hide that)
    assert(store.hotDF.count() === 90L)
    val got = store.readData(Map("a" -> (0L, 100L)))("a")
    assert(got.size === 80)
    (0 until 10).foreach(i => assert(got(i.toLong) === s"p2r-$i"))
    (10 until 50).foreach(i => assert(got(i.toLong) === s"p1-$i"))
    (50 until 80).foreach(i => assert(got(i.toLong) === s"p2-$i"))
  }

  test("pure DSv2 pipeline: graft-feed source -> graft-tsdb sink, no foreachBatch") {
    // Both ends engine-owned and wired DIRECTLY: the source's offset
    // ranges feed the sink's per-epoch two-phase commit — Structured
    // Streaming's native exactly-once composition, no driver-side
    // foreachBatch glue anywhere in the topology.
    val dir = Files.createTempDirectory("feedlog-dsv2")
    val root = Files.createTempDirectory("feedlog-dsv2-store").toString
    val st = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    st.initialize()
    FeedLog.append(dir, (0 until 30).map(i =>
      payload("d" + i % 2, i.toLong, s"v$i", seq = i.toLong)))
    val schema = org.apache.spark.sql.Encoders.product[graft.tsdb.Sample].schema
    val q = spark.readStream
      .format("graft-feed")
      .option("path", dir.toString)
      .option("maxBytesPerTrigger", 512L)
      .load()
      .select(from_json(col("value"), schema).as("s"))
      .select(col("s.*"))
      .withColumn("partition_start", col("ts") - (col("ts") % lit(5L)))
      .writeStream.format("graft-tsdb")
      .option("path", st.namespaceRoot)
      .option("tier", "hot")
      .option("partitionWidth", "5")
      .option("checkpointLocation",
        Files.createTempDirectory("feedlog-dsv2-ckpt").toString)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = st.connectorDF("hot").count()
    assert(got === 30L)
    val vals = st.readData(Map("d0" -> (0L, 100L)))("d0")
    assert(vals.size === 15 && vals(0L) === "v0" && vals(28L) === "v28")
  }

  test("retention: consumed rolled segments are deleted at commit; the stream stays exact") {
    val dir = Files.createTempDirectory("feedlog-ret")
    val root = Files.createTempDirectory("feedlog-ret-store").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 100L))
    store.initialize()
    FeedLog.append(dir, (0 until 200).map(i =>
      payload("r", i.toLong, s"v$i", seq = i.toLong)), segBytes = 2048L)
    val before = FeedLog.segments(dir).size
    assert(before > 3, s"need a multi-segment backlog, got $before")
    val q = StreamingIngest.feedSampleStream(spark, store, dir.toString,
      maxBytesPerTrigger = 1024L, retainConsumed = Some(false))
    try q.processAllAvailable() finally q.stop()
    // every rolled, fully-committed segment is gone; the active one lives
    val after = FeedLog.segments(dir)
    assert(after.size === 1, s"retention kept ${after.size} segments")
    assert(after.head === FeedLog.segments(dir).last)
    // nothing was lost to the cleanup racing the drain
    val got = store.readData(Map("r" -> (0L, 1000L)))("r")
    assert(got.size === 200 && got(0L) === "v0" && got(199L) === "v199")
    // the feed keeps serving: append more, drain, still exact
    FeedLog.append(dir, (200 until 220).map(i =>
      payload("r", i.toLong, s"v$i", seq = i.toLong)), segBytes = 2048L)
    val q2 = StreamingIngest.feedSampleStream(spark, store, dir.toString,
      maxBytesPerTrigger = 1024L, retainConsumed = Some(false))
    try q2.processAllAvailable() finally q2.stop()
    assert(store.readData(Map("r" -> (0L, 1000L)))("r").size === 220)
  }

  test("safeEndCount: exact record accounting under byte and record budgets") {
    val dir = Files.createTempDirectory("feedlog-cnt")
    val recs = (0 until 10).map(i => payload("a", i.toLong, s"v$i"))
    FeedLog.append(dir, recs, segBytes = 1L << 20)
    val seg = FeedLog.segments(dir).head
    val (full, nFull) = FeedLog.safeEndCount(seg, 0L)
    assert(nFull === 10L && full === Files.size(seg))
    // record budget bites exactly
    val (e3, n3) = FeedLog.safeEndCount(seg, 0L, maxRecords = 3L)
    assert(n3 === 3L)
    assert(FeedLog.read(seg, 0L, e3).map(_._2).toSeq === recs.take(3))
    // byte budget lands on a boundary with the true count, not bytes/4
    val (eb, nb) = FeedLog.safeEndCount(seg, 0L, maxBytes = 200L)
    assert(nb > 0L && nb < 10L)
    assert(FeedLog.read(seg, 0L, eb).size.toLong === nb)
  }

  test("at-least-one progress: an oversized record cannot stall its segment") {
    val dir = Files.createTempDirectory("feedlog-big-adm")
    val huge = payload("a", 1L, "x" * 8192) // far over the trigger budget
    FeedLog.append(dir,
      Seq(payload("a", 0L, "before"), huge, payload("a", 2L, "after")),
      segBytes = 1L << 20)
    val seg = FeedLog.segments(dir).head
    // the raw walk without the rule stalls at the huge frame...
    val (stall, n0) = FeedLog.safeEndCount(seg, FeedLog.safeEnd(seg, 0L, 512L),
      maxBytes = 512L)
    assert(n0 === 0L && stall === FeedLog.safeEnd(seg, 0L, 512L))
    // ...and the source's admission control drains it anyway, in order
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream.format("graft-feed")
      .option("path", dir.toString)
      .option("maxBytesPerTrigger", 512L)
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= b.orderBy("segment", "pos").collect().map(_.getString(0))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.toSeq === Seq(payload("a", 0L, "before"), huge,
      payload("a", 2L, "after")),
      "the oversized record stalled or broke production order")
  }

  test("producer restart heals a torn tail: records appended after a crash are visible") {
    val dir = Files.createTempDirectory("feedlog-heal")
    FeedLog.append(dir, Seq(payload("a", 1L, "one"), payload("a", 2L, "two")))
    val seg = FeedLog.segments(dir).head
    val goodEnd = FeedLog.safeEnd(seg, 0L)
    // crash mid-frame: full length word, half the payload
    val bytes = payload("a", 3L, "lost").getBytes(StandardCharsets.UTF_8)
    val ch = FileChannel.open(seg, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
    try {
      val buf = ByteBuffer.allocate(4 + bytes.length / 2)
      buf.putInt(bytes.length).put(bytes, 0, bytes.length / 2).flip()
      while (buf.hasRemaining) ch.write(buf)
    } finally ch.close()
    assert(Files.size(seg) > goodEnd)
    // the producer restarts through append(): without the heal, every
    // record below would sit behind the torn frame, invisible forever
    FeedLog.append(dir, Seq(payload("a", 4L, "four"), payload("a", 5L, "five")))
    assert(FeedLog.safeEnd(seg, 0L) === Files.size(seg),
      "the torn frame survived the restart and blocked the tail")
    val back = FeedLog.read(seg, 0L, FeedLog.safeEnd(seg, 0L)).map(_._2).toSeq
    assert(back === Seq(payload("a", 1L, "one"), payload("a", 2L, "two"),
      payload("a", 4L, "four"), payload("a", 5L, "five")))
  }

  test("keyed topic routing: stable key->log assignment, per-key order preserved") {
    val topic = Files.createTempDirectory("feedtopic-route")
    val n = 4
    val keyed = (0 until 200).map(i => (s"k${i % 7}", payload(s"k${i % 7}",
      i.toLong, s"v$i", seq = i.toLong)))
    FeedLog.appendKeyed(topic, keyed, numLogs = n, segBytes = 1024L)
    val logDirs = FeedLog.logs(topic)
    assert(logDirs.forall(_.getFileName.toString.matches("log-\\d{5}")),
      "keyed append should create log-* subdirectories")
    // each key lives in exactly the log its hash names, in append order
    (0 until 7).foreach { k =>
      val key = s"k$k"
      val expect = keyed.filter(_._1 == key).map(_._2)
      val li = FeedLog.routeKey(key, n)
      val home = topic.resolve(FeedLog.logDirName(li))
      val got = FeedLog.segments(home).flatMap(s =>
        FeedLog.read(s, 0L, FeedLog.safeEnd(s, 0L)).map(_._2).toSeq)
        .filter(_.contains(s""""tag":"$key""""))
      assert(got === expect, s"key $key broke order or leaked across logs")
      // and nowhere else
      logDirs.filterNot(_ == home).foreach { other =>
        val leaked = FeedLog.segments(other).flatMap(s =>
          FeedLog.read(s, 0L, FeedLog.safeEnd(s, 0L)).map(_._2).toSeq)
          .count(_.contains(s""""tag":"$key""""))
        assert(leaked === 0, s"key $key leaked into $other")
      }
    }
    // the batch audit reads the whole topic; segment column carries the log
    val df = spark.read.format("graft-feed").option("path", topic.toString).load()
    assert(df.count() === 200L)
    assert(df.select("segment").distinct().collect()
      .forall(_.getString(0).matches("log-\\d{5}/seg-\\d{8}\\.log")))
  }

  test("partitioned topic: checkpoint restart spanning per-log segment rolls") {
    val topic = Files.createTempDirectory("feedtopic-cp")
    val cp = Files.createTempDirectory("feedtopic-cp-chk").toString
    val root = Files.createTempDirectory("feedtopic-store").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 100L))
    store.initialize()
    def keyedRecs(r: Range, ingestTs: Long, writer: String, v: String) =
      r.map(i => (s"t${i % 5}", payload(s"t${i % 5}", i.toLong, s"$v-$i",
        ingestTs = ingestTs, writer = writer, seq = i.toLong)))
    // phase 1: small segments so logs roll; drain under a checkpoint
    FeedLog.appendKeyed(topic, keyedRecs(0 until 120, 1L, "w1", "p1"),
      numLogs = 4, segBytes = 1024L)
    val segsP1 = FeedLog.allSegments(topic).size
    assert(segsP1 > 4, s"phase 1 should roll segments, got $segsP1")
    val q1 = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(cp))
    try q1.processAllAvailable() finally q1.stop()
    // phase 2 appends MORE across the same logs (each resumes mid- or
    // post-roll) plus LWW rewrites of the first 10 keys
    FeedLog.appendKeyed(topic, keyedRecs(120 until 180, 2L, "w2", "p2") ++
      keyedRecs(0 until 10, 2L, "w2", "p2r"),
      numLogs = 4, segBytes = 1024L)
    assert(FeedLog.allSegments(topic).size > segsP1,
      "phase 2 should roll new segments under the old offsets")
    val q2 = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(cp))
    try q2.processAllAvailable() finally q2.stop()
    // RAW count proves exactly-once across the restart and the rolls
    assert(store.hotDF.count() === 190L)
    val lww = store.lwwDedup(store.allDF)
    assert(lww.count() === 180L)
    val rewritten = lww.where(col("value").startsWith("p2r-")).count()
    assert(rewritten === 10L, "phase-2 rewrites did not supersede phase 1")
  }

  test("consumer group: static assignment is disjoint-complete; reassignment under one checkpoint stays exactly-once") {
    val topic = Files.createTempDirectory("feedtopic-grp")
    val keyed = (0 until 240).map(i => (s"k${i % 11}",
      payload(s"k${i % 11}", i.toLong, s"v$i", seq = i.toLong)))
    FeedLog.appendKeyed(topic, keyed, numLogs = 4, segBytes = 1024L)
    def readAssign(a: Option[String]) = {
      val r = spark.read.format("graft-feed").option("path", topic.toString)
      a.foreach(r.option("assign", _))
      r.load()
    }
    val full = readAssign(None)
    val g1 = readAssign(Some("0,3"))
    val g2 = readAssign(Some("1,2"))
    // each member sees ONLY its own logs
    def logsSeen(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(split(col("segment"), "/").getItem(0)).distinct()
        .collect().map(_.getString(0)).toSet
    assert(logsSeen(g1).subsetOf(Set("log-00000", "log-00003")), logsSeen(g1).toString)
    assert(logsSeen(g2).subsetOf(Set("log-00001", "log-00002")), logsSeen(g2).toString)
    // disjoint AND complete: the two assignments partition the topic
    assert(g1.count() + g2.count() === full.count())
    val union = g1.unionByName(g2)
    assert(union.exceptAll(full).isEmpty && full.exceptAll(union).isEmpty,
      "group members overlapped or orphaned records")
    // membership change under ONE checkpoint: the member's assignment
    // grows {0} -> {0,1}; carried cursors keep log 0 exactly-once while
    // the newly-owned log 1 drains from its beginning
    val cp = Files.createTempDirectory("feedtopic-grp-cp").toString
    val root = Files.createTempDirectory("feedtopic-grp-store").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 100L))
    store.initialize()
    val qa = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(cp), assign = Some("0"))
    try qa.processAllAvailable() finally qa.stop()
    assert(store.hotDF.count() === readAssign(Some("0")).count())
    val qb = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(cp), assign = Some("0,1"))
    try qb.processAllAvailable() finally qb.stop()
    assert(store.hotDF.count() === readAssign(Some("0,1")).count(),
      "reassigned member re-read its old log or missed the new one")
  }

  test("consumer group: overlapping assignments are independent groups, not an error") {
    // Kafka semantics: assignment is per GROUP — two queries that both
    // own log 1 each read ALL of it (fan-out to two downstreams), they
    // do not split it. Splitting is what DISJOINT assignments are for.
    val topic = Files.createTempDirectory("feedtopic-ovl")
    val keyed = (0 until 60).map(i => (s"k${i % 5}",
      payload(s"k${i % 5}", i.toLong, s"v$i", seq = i.toLong)))
    FeedLog.appendKeyed(topic, keyed, numLogs = 2, segBytes = 1024L)
    def readAssign(a: String) = spark.read.format("graft-feed")
      .option("path", topic.toString).option("assign", a).load()
    val full = spark.read.format("graft-feed")
      .option("path", topic.toString).load()
    val g1 = readAssign("0,1")
    val g2 = readAssign("1")
    val log1 = full.where(col("segment").startsWith("log-00001/"))
    assert(g1.count() === full.count(), "a full assignment must see the topic")
    assert(g2.count() === log1.count())
    assert(g2.exceptAll(log1).isEmpty && log1.exceptAll(g2).isEmpty,
      "the overlapping member's view of log 1 diverged")
    // out-of-range indices are simply unowned logs (a member may be
    // configured for logs the producer has not created yet)
    assert(readAssign("7").count() === 0L)
  }

  test("consumer-group lag gauges surface in the streaming progress across a two-member drain") {
    import graft.streaming.FeedGroup
    val topic = Files.createTempDirectory("feedtopic-lag")
    val keyed = (0 until 160).map(i => (s"k${i % 7}",
      payload(s"k${i % 7}", i.toLong, s"v$i", seq = i.toLong)))
    FeedLog.appendKeyed(topic, keyed, numLogs = 2, segBytes = 1024L)
    FeedGroup.join(topic, "a")
    FeedGroup.join(topic, "b")
    def store() = {
      val st = new TimeSeriesStore(spark,
        Files.createTempDirectory("feedlag-store").toString,
        StoreSettings(partitionWidth = 1000000L))
      st.initialize()
      st
    }
    def drain(member: String): Seq[Map[String, String]] = {
      val q = StreamingIngest.feedGroupSampleStream(spark, store(),
        topic.toString, member, maxBytesPerTrigger = 2048L,
        checkpointDir =
          Some(Files.createTempDirectory(s"feedlag-ck$member").toString))
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      q.recentProgress.toSeq.flatMap(p =>
        p.sources.toSeq.map(_.metrics.asScala.toMap))
        .filter(_.nonEmpty)
    }
    Seq("a", "b").foreach { member =>
      val ms = drain(member)
      assert(ms.nonEmpty, s"member $member reported no source metrics")
      assert(ms.forall(m => m.contains("lagBytes") &&
        m.contains("logEndBytes") && m.contains("committedBytes")),
        s"missing gauges: ${ms.last}")
      // the member owns one of two logs: its log end is positive and the
      // backlog drains to zero lag under the small per-trigger budget
      val end = ms.map(_("logEndBytes").toLong).max
      assert(end > 0L, s"member $member saw no owned bytes")
      assert(ms.exists(_("lagBytes").toLong > 0L),
        s"a budgeted drain should report mid-drain lag: $ms")
      assert(ms.map(_("lagBytes").toLong).min === 0L,
        s"member $member never reached zero lag: $ms")
      assert(ms.map(_("committedBytes").toLong).max === end,
        s"committed cursor never reached the log end for $member")
      assert(ms.forall(_.get("generation").contains("2")),
        "gauges must carry the group generation")
    }
  }

  test("cross-JVM producer: records appended by a foreign process drain exactly") {
    val dir = Files.createTempDirectory("feedlog-xjvm")
    val scratch = Files.createTempDirectory("feedlog-xjvm-io")
    val done = scratch.resolve("producer.done")
    val root = Files.createTempDirectory("feedlog-xstore").toString
    val store = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 60000L))
    store.initialize()
    val baseTs = 1704067200000L
    val rounds = 40
    val rpr = 25
    val cmd = Seq("java", "-cp", System.getProperty("java.class.path"),
      "graft.examples.FeedProducer", dir.toString, "8192",
      rounds.toString, rpr.toString, "40", baseTs.toString, done.toString)
    val producer = new ProcessBuilder(cmd: _*)
      .redirectOutput(scratch.resolve("producer.out").toFile)
      .redirectErrorStream(true).start()
    val q = StreamingIngest.feedSampleStream(spark, store, dir.toString,
      maxBytesPerTrigger = 8192L)
    try {
      val deadline = System.currentTimeMillis() + 120000L
      while (!Files.exists(done) && System.currentTimeMillis() < deadline) {
        assert(producer.isAlive || Files.exists(done), "producer JVM died")
        Thread.sleep(200)
      }
      assert(Files.exists(done), "producer never finished")
      q.processAllAvailable()
      val total = rounds * rpr
      val fin = store.lwwDedup(store.allDF)
        .agg(count(lit(1)), countDistinct(col("value"))).head()
      assert(fin.getLong(0) === total.toLong)
      assert(fin.getLong(1) === total.toLong)
      // the log rolled while the consumer ran: offset map spans segments
      assert(FeedLog.segments(dir).size > 1)
    } finally {
      q.stop(); producer.destroyForcibly(); ()
    }
  }
}
