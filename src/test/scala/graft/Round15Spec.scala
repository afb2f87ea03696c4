package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}
import org.scalatest.BeforeAndAfterAll

import graft.streaming.{FeedGroup, FeedLog, StreamingIngest}
import graft.tsdb.{Sample, StoreSettings, TimeSeriesStore}

/** Round-15 contracts: the store as a streaming SOURCE (exactly-once
  * tail across checkpoint restart, rewrite storms, and foreign writers),
  * tail/CDF window parity, the ledger-PRUNED change feed (untouched
  * partitions never scanned, answer unchanged), snapshot reads through
  * the DSv2 connector, the mergeable quantile sketch's exact merge
  * invariance and rank band, dynamic feed consumer groups (join
  * mid-drain exactly-once, fenced zombies), and the gated auto-
  * compaction loop.
  */
class Round15Spec extends AnyFunSuite with BeforeAndAfterAll with Eventually {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-round15-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def samples(tag: String, ts: Range, v: Long => String,
      ingest: Long, writer: String, seq0: Long): Seq[Sample] =
    ts.map(t => Sample(tag, t.toLong, v(t.toLong), ingest, writer,
      seq0 + t.toLong))

  // ------------------------------------------------------- store tail

  test("store tail: exactly-once across checkpoint restart, rewrite storm, foreign writer") {
    val srcRoot = Files.createTempDirectory("r15-tailsrc").toString
    val dstRoot = Files.createTempDirectory("r15-taildst").toString
    val ckpt = Files.createTempDirectory("r15-tailckpt").toString
    val src = new TimeSeriesStore(spark, srcRoot,
      StoreSettings(partitionWidth = 10L), obsoleteGraceMs = 1L << 40)
    src.initialize()
    val dst = new TimeSeriesStore(spark, dstRoot,
      StoreSettings(partitionWidth = 10L))
    dst.initialize()
    // batch A through the L0 lane, then a rewrite storm BEFORE the
    // tailer ever lists the store: every file it must emit is pending
    val a = samples("A", 0 until 20, t => s"a$t", 1L, "w1", 0L) ++
      samples("B", 0 until 20, t => s"b$t", 1L, "w1", 1000L)
    src.writeSamples(a)
    src.flushL0()
    src.compact(minFiles = 1, applyLww = true)
    // a FOREIGN instance (second store object, own writerId/seq domain)
    val foreign = new TimeSeriesStore(spark, srcRoot,
      StoreSettings(partitionWidth = 10L), obsoleteGraceMs = 1L << 40)
    foreign.initialize()
    val f = samples("A", 20 until 30, t => s"f$t", 2L, "fw", 2000L)
    foreign.writeSamples(f)
    // partial drain: one file per trigger, stop mid-stream
    val q1 = StreamingIngest.storeTailStream(spark, src.namespaceRoot, dst,
      checkpointDir = Some(ckpt), maxFilesPerTrigger = 1,
      manifestCompactEvery = 2)
    try eventually(timeout(Span(30, Seconds))) {
      assert(dst.hotDF.count() > 0L)
    } finally q1.stop()
    // mid-downtime mutations: a physical delete (not retracted — the
    // append-stream contract) and a third batch
    src.delete("A", 0L, 4L)
    val b = samples("A", 0 until 10, t => s"n$t", 3L, "w3", 5000L)
    src.writeSamples(b)
    val q2 = StreamingIngest.storeTailStream(spark, src.namespaceRoot, dst,
      checkpointDir = Some(ckpt), maxFilesPerTrigger = 1,
      manifestCompactEvery = 2)
    try q2.processAllAvailable() finally q2.stop()
    // exactly-once: every appended row has unique provenance, so the
    // RAW downstream count equals the total appended count — a
    // re-emitted pending file, a double-read across the restart, or an
    // emitted rewrite output all inflate it; a missed file deflates it
    val total = (a.size + f.size + b.size).toLong
    assert(dst.hotDF.count() === total,
      "tail did not emit each appended row exactly once")
    // the exactly-once above ran WITH manifest compaction active:
    // commits during the drains compacted entries below the committed
    // offset into a compact-N marker (and the restart rebuilt its seen
    // set from it) — assert the machinery actually engaged
    val manifest = java.nio.file.Paths.get(ckpt, "sources", "0", "graft-tail")
    assert(Files.exists(manifest), s"no tail manifest under $manifest")
    val entries = {
      val s = Files.list(manifest)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSeq
      } finally s.close()
    }
    assert(entries.exists(_.startsWith("compact-")),
      s"commit never compacted the manifest: $entries")
    // LWW equivalence against the append history (delete NOT retracted)
    val got = dst.lwwDedup(dst.hotDF)
      .select("tag", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    val expected = (a ++ f ++ b)
      .groupBy(s => (s.tag, s.ts))
      .map { case (k, ss) => k -> ss.maxBy(s => (s.ingestTs, s.seq)).value }
    assert(got === expected, "tail-replicated LWW state diverged")
  }

  test("tail/CDF parity: change-feed windows compose to the tailed copy's LWW state") {
    val srcRoot = Files.createTempDirectory("r15-paritysrc").toString
    val dstRoot = Files.createTempDirectory("r15-paritydst").toString
    val src = new TimeSeriesStore(spark, srcRoot,
      StoreSettings(partitionWidth = 10L), obsoleteGraceMs = 1L << 60)
    src.initialize()
    val dst = new TimeSeriesStore(spark, dstRoot,
      StoreSettings(partitionWidth = 10L))
    dst.initialize()
    // delete-free history at frozen clocks: append, compact, append
    src.clock = () => 1000L
    src.writeSamples(samples("P", 0 until 15, t => s"p$t", 1000L, "w1", 0L))
    src.flushL0()
    src.clock = () => 2000L
    src.compact(minFiles = 1, applyLww = true)
    src.clock = () => 3000L
    src.writeSamples(samples("P", 5 until 20, t => s"q$t", 3000L, "w2", 100L))
    src.flushL0()
    val q = StreamingIngest.storeTailStream(spark, src.namespaceRoot, dst,
      checkpointDir = Some(Files.createTempDirectory("r15-parityck").toString))
    try q.processAllAvailable() finally q.stop()
    // replay the change feed between the tail's batch boundaries
    // (the staged ingest clocks) and fold the net changes into a state
    val state = scala.collection.mutable.Map.empty[(String, Long), String]
    Seq((0L, 1500L), (1500L, 3500L)).foreach { case (from, to) =>
      src.changesBetween(from, to)
        .select("tag", "ts", "value", "change_type").collect()
        .foreach { r =>
          val k = (r.getString(0), r.getLong(1))
          r.getString(3) match {
            case "insert" | "update_postimage" => state(k) = r.getString(2)
            case "delete" => state.remove(k); ()
            case _ => () // preimages carry no net change
          }
        }
    }
    val tailed = dst.lwwDedup(dst.hotDF)
      .select("tag", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(tailed === state.toMap,
      "CDF window replay and the tailed copy disagree")
  }

  // ------------------------------------------- ledger-pruned change feed

  /** Staged store for the pruning pins: three tags in DISJOINT windows,
    * only tag A mutated inside the probe window.
    */
  private def prunedCdfStore(): TimeSeriesStore = {
    val root = Files.createTempDirectory("r15-cdf").toString
    val st = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    st.writeSamples(
      samples("A", 0 until 10, t => s"a$t", 1000L, "w1", 0L) ++
        samples("B", 100 until 110, t => s"b$t", 1000L, "w1", 100L) ++
        samples("C", 200 until 210, t => s"c$t", 1000L, "w1", 200L))
    st.flushL0()
    st.clock = () => 2000L
    st.delete("A", 0L, 9L)
    st.clock = () => 3000L
    st.writeSamples(samples("A", 0 until 5, t => s"n$t", 3000L, "w2", 300L))
    st.flushL0()
    st
  }

  test("changesBetween scans only ledger-changed partitions; untouched dirs never appear") {
    val st = prunedCdfStore()
    val plan = st.changeScanPlan(1500L, 3500L,
      graft.tsdb.GcLedger.retirementClocks(
        java.nio.file.Paths.get(st.namespaceRoot, "gc")))
    assert(plan.dirsTotal === 3, s"staging expected 3 dirs, ${plan.dirsTotal}")
    assert(plan.dirsScanned === 1,
      s"expected only tag A's dir scanned, got ${plan.dirsScanned}")
    val all = (plan.hotFiles ++ plan.coldFiles ++ plan.l0Files).map(_.toString)
    assert(all.nonEmpty)
    assert(!all.exists(p => p.contains("tag=B") || p.contains("tag=C")),
      s"untouched partitions leaked into the diff scan: $all")
    // the pruned diff is still the exact answer
    val rows = st.changesBetween(1500L, 3500L)
      .select("tag", "ts", "value", "change_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val expected =
      (0L until 5L).flatMap(t => Seq(
        ("A", t, s"a$t", "update_preimage"),
        ("A", t, s"n$t", "update_postimage"))).toSet ++
        (5L until 10L).map(t => ("A", t, s"a$t", "delete")).toSet
    assert(rows === expected, "pruning changed the diff answer")
    // a window with no churn diffs to nothing and scans nothing
    val quiet = st.changeScanPlan(3200L, 3400L,
      graft.tsdb.GcLedger.retirementClocks(
        java.nio.file.Paths.get(st.namespaceRoot, "gc")))
    assert(quiet.dirsScanned === 0 && quiet.l0Files.isEmpty)
    assert(st.changesBetween(3200L, 3400L).count() === 0L)
  }

  test("connector asOf == readAsOfDF at every staged snapshot; one-tag asOf read prunes dirs") {
    val st = prunedCdfStore()
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      st.lwwDedup(df).select("tag", "ts", "value", "ingestTs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
    Seq(1500L, 2500L, 3500L).foreach { t =>
      assert(collectSet(st.connectorAsOfDF(t)) === collectSet(st.readAsOfDF(t)),
        s"asOf=$t: connector snapshot diverged from the driver-side walk")
    }
    // plan-time pruning: a one-tag historical read lists one dir of three
    val p = st.connectorAsOfDF(2500L).where(col("tag") === "B")
      .queryExecution.executedPlan.toString
    val m = """dirs=(\d+)/(\d+)""".r.findFirstMatchIn(p)
    assert(m.isDefined, s"no TsdbScan dirs=k/N in asOf plan:\n$p")
    assert(m.get.group(1).toInt === 1 && m.get.group(2).toInt === 3,
      s"one-tag asOf read should prune to 1/3 dirs, got ${m.get.group(0)}")
  }

  // ------------------------------------------------ mergeable quantile sketch

  test("quantile sketch: exact merge invariance, canonical minimum level, rank band") {
    import graft.functions.QuantileSketch
    val agg = QuantileSketch.sketch
    val data: Seq[Long] =
      (1 to 3000).map(i => math.abs(i * 2654435761L % 997L)) ++
        (1 to 500).map(_ => 42L) // a heavy key: counts must stay exact
    val onePass = data.foldLeft(agg.zero)(agg.reduce)
    // shard-wise partials, merged in two different shapes
    val shards = data.grouped(701).toSeq
      .map(sh => sh.foldLeft(agg.zero)(agg.reduce))
    val leftFold = shards.reduceLeft(agg.merge)
    val rightFold = shards.reduceRight(agg.merge)
    assert(leftFold === onePass && rightFold === onePass,
      "sketch state is not a pure function of the multiset")
    // canonical level: admissible, and minimal against the FULL data
    val st = onePass
    assert(st.keys.size <= QuantileSketch.Cap)
    assert(st.keys.keys.forall(QuantileSketch.sampled(_, st.level)))
    if (st.level > 0) {
      val ndvBelow = data.distinct
        .count(QuantileSketch.sampled(_, st.level - 1))
      assert(ndvBelow > QuantileSketch.Cap,
        s"level ${st.level} chosen but ${st.level - 1} admits $ndvBelow keys")
    }
    // rank band against the exact distribution
    val res = agg.finish(onePass)
    val sorted = data.sorted
    QuantileSketch.Phis.zip(res.ests).foreach { case (phi, est) =>
      val rank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(rank - phi) <= 0.15,
        s"phi=$phi est=$est has rank $rank — outside the band")
    }
    // a corrupted sketch blows the band: drop the lower half of the
    // sampled histogram (a lost-state failure) and re-ask for the median
    val keys = onePass.keys.toSeq.sortBy(_._1)
    val corrupted = onePass.copy(keys = keys.drop(keys.size / 2).toMap)
    val corruptEst = agg.finish(corrupted).ests.head
    val corruptRank = sorted.count(_ <= corruptEst).toDouble / sorted.size
    assert(math.abs(corruptRank - 0.5) > 0.15,
      "the band failed to detect a half-lost sketch state")
  }

  // ------------------------------------------------ dynamic consumer groups

  private def feedPayload(tag: String, ts: Long, value: String,
      seq: Long): String =
    s"""{"tag":"$tag","ts":$ts,"value":"$value","ingestTs":1,""" +
      s""""writerId":"w1","seq":$seq}"""

  test("feed groups: a member joins mid-drain; the union stays exactly-once; zombies are fenced") {
    val topic = Files.createTempDirectory("r15-group")
    val root = Files.createTempDirectory("r15-group-store").toString
    val store = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 1000L))
    store.initialize()
    val seq = new java.util.concurrent.atomic.AtomicLong(0L)
    def appendBatch(n: Int): Int = {
      val recs = (0 until n).map { i =>
        val s = seq.getAndIncrement()
        (s"t${i % 8}", feedPayload(s"t${i % 8}", s, s"v$s", s))
      }
      FeedLog.appendKeyed(topic, recs, numLogs = 4, segBytes = 2048L)
      n
    }
    var total = 0
    total += appendBatch(120)
    // member a joins and drains the whole topic under generation 1
    FeedGroup.join(topic, "a")
    val ckptA = Files.createTempDirectory("r15-ckpA").toString
    val qA = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(ckptA),
      group = Some("a"))
    // graceful-handoff discipline: Spark invokes source.commit(end) on
    // the trigger AFTER a batch lands, so the group ledger trails the
    // drain by one trigger — a graceful rebalance waits for the ledger
    // to catch the frontier (Kafka's commitSync-on-revoke analog); a
    // crash-rebalance instead replays the gap, which the store's LWW
    // row identity absorbs
    def ledgerCurrent(): Boolean = {
      val frontier = graft.sources.FeedMicroBatchStream
        .safeFrontier(topic.toString, None).positions
      val cur = FeedGroup.committedCursors(topic)
      frontier.forall { case (name, pos) => cur.getOrElse(name, 0L) >= pos }
    }
    try {
      qA.processAllAvailable()
      eventually(timeout(Span(30, Seconds))) { assert(ledgerCurrent()) }
    } finally qA.stop()
    assert(store.hotDF.count() === total.toLong)
    // backlog accumulates, b JOINS (generation 2 freezes a's committed
    // cursors as the handoff), more backlog lands after the join
    total += appendBatch(80)
    val g2 = FeedGroup.join(topic, "b")
    assert(g2.members === Seq("a", "b"))
    total += appendBatch(80)
    // both members drain their derived assignment concurrently
    val qA2 = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(ckptA),
      group = Some("a"))
    val ckptB = Files.createTempDirectory("r15-ckpB").toString
    val qB = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(ckptB),
      group = Some("b"))
    try {
      qA2.processAllAvailable()
      qB.processAllAvailable()
      qA2.processAllAvailable()
      eventually(timeout(Span(30, Seconds))) { assert(ledgerCurrent()) }
    } finally { qA2.stop(); qB.stop() }
    // exactly-once across the membership change: unique provenance per
    // record makes the raw count the dup/loss detector
    assert(store.hotDF.count() === total.toLong,
      "the join handoff duplicated or lost records")
    // fenced zombie #1: a non-member's cursor write is refused
    assert(!FeedGroup.commitCursors(topic, "zombie", 1L, 0,
      Map("log-00000/seg-00000000.log" -> 99999L)))
    // fenced zombie #2: a left member drains NOTHING new
    FeedGroup.leave(topic, "b")
    total += appendBatch(40)
    val before = store.hotDF.count()
    val qZ = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L,
      checkpointDir = Some(Files.createTempDirectory("r15-ckpZ").toString),
      group = Some("b"))
    try qZ.processAllAvailable() finally qZ.stop()
    assert(store.hotDF.count() === before, "a left member kept draining")
    // ...while the surviving member picks the backlog up (including b's
    // former logs, from b's last committed cursors)
    val qA3 = StreamingIngest.feedSampleStream(spark, store, topic.toString,
      maxBytesPerTrigger = 2048L, checkpointDir = Some(ckptA),
      group = Some("a"))
    try qA3.processAllAvailable() finally qA3.stop()
    assert(store.hotDF.count() === total.toLong,
      "the surviving member did not absorb the leaver's logs exactly-once")
  }

  // ------------------------------------------------ gated compaction loop

  test("compaction loop: quiescent store ticks are no-ops; fragmentation re-arms the gate") {
    val root = Files.createTempDirectory("r15-autocompact").toString
    val store = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L))
    store.initialize()
    store.write(Map("G" -> Map(1L -> "one", 2L -> "two")))
    store.flushL0()
    assert(!store.maintenanceDue(minFiles = 4),
      "a single-file store reported maintenance due")
    val (q, rewritten) = StreamingIngest.compactionLoop(spark, store,
      minFiles = 4, intervalMs = 200)
    try {
      Thread.sleep(1500)
      assert(rewritten.get() === 0L,
        "the gated loop compacted a quiescent store")
      // fragment the partition past the threshold: the gate re-arms
      (1 to 4).foreach { i =>
        store.write(Map("G" -> Map(1L -> s"v$i")))
        store.flushL0()
      }
      assert(store.maintenanceDue(minFiles = 4))
      eventually(timeout(Span(30, Seconds))) {
        assert(rewritten.get() >= 1L)
      }
    } finally q.stop()
    assert(store.readData(Map("G" -> (0L, 10L)))("G").toMap ===
      Map(1L -> "v4", 2L -> "two"))
  }
}
