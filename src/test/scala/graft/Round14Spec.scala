package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-14 contracts: restart-safe incremental packing (ADVICE r13 —
  * the carried offset was a bare driver var, so a replayed foreachBatch
  * double-appended spans), tokenize→pack composition, store-level
  * delete, and the lossy-audio invariant band.
  */
class Round14Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-round14-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.01"

  test("packSpanBatch: replayed batchIds are idempotent; offsets survive a driver restart") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val groups = docs.grouped(math.max(docs.length / 3 + 1, 1)).toSeq
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-pack-replay").toString
    def run(batchId: Long, g: Seq[(Long, String)]): Unit =
      graft.streaming.StreamingIngest.packSpanBatch(outDir,
        g.toDF("doc_id", "text"), batchId, seqLen = 256,
        bucketSize = 1 << 16)
    // normal drive: batches 0, 1 commit
    run(0L, groups(0)); run(1L, groups(1))
    // the failure replays: batch 1 re-delivered (post-commit replay),
    // then batch 0 (an out-of-order replay after a driver restart —
    // both must be no-ops because their ledger markers exist)
    run(1L, groups(1)); run(0L, groups(0))
    // a NEW driver continues at batch 2: its start offset must come
    // from the ledger, not any in-memory var (none exists here)
    run(2L, groups(2))
    val streamed = graft.streaming.StreamingIngest
      .readPackSpans(spark, outDir)
    val batch = graft.analytics.TextAnalysis.packSequences(
      Tables.documents(spark, sf))
    assert(streamed.count() === batch.count(),
      "replays double-appended or the restart lost the offset")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "replayed/restarted spans diverged from the batch packer")
    // exactly one ledger marker per real batch
    val ledger = java.nio.file.Paths.get(outDir, "_offsets")
    val marks = java.nio.file.Files.list(ledger)
    val names = try {
      import scala.jdk.CollectionConverters._
      marks.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    } finally marks.close()
    assert(names.size === 3 && names.map(_.split("-")(0)) === Seq("0", "1", "2"))
  }

  test("tokenize->pack composition: BPE token conservation, fill, EOD accounting") {
    val docs = Tables.documents(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("r14-bpevocab").toString
    graft.analytics.TextAnalysis.persistBpeVocab(docs, root, rounds = 6)
    val L = 256
    val spans = graft.analytics.TextAnalysis
      .packBpeSequences(docs, root, seqLen = L).persist()
    try {
      // conservation IN TOKEN-ID UNITS: each doc's spans sum to exactly
      // its encoded token count + 1 EOD — the seam where a word-count
      // leak would silently misalign every later sequence
      val enc = graft.analytics.TextAnalysis.bpeEncodePersisted(docs, root)
        .select(col("doc_id"), (col("n_tokens") + 1).as("slot"))
      val fromSpans = spans.groupBy("doc_id")
        .agg(sum("n_toks").as("s"), sum("has_eod").as("e"))
      val diverged = fromSpans.join(enc, "doc_id")
        .where(col("s") =!= col("slot") || col("e") =!= 1).count()
      assert(diverged === 0L, "a doc's BPE spans lost tokens or its EOD")
      assert(fromSpans.count() === docs.count())
      // every sequence but the tail fills to exactly L token ids, with a
      // gap-free id space
      val fills = spans.groupBy("seq_id").agg(sum("n_toks").as("n"))
        .orderBy("seq_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(fills.map(_._1) === (0L to fills.map(_._1).max).toArray)
      fills.dropRight(1).foreach { case (sid, n) =>
        assert(n === L.toLong, s"seq $sid filled $n != $L")
      }
      // BPE packs are DENSER than whitespace packs would be sparse:
      // total slots differ (subword count != word count), so the two
      // compositions genuinely disagree — the row isn't a re-label
      val wordSpans = graft.analytics.TextAnalysis.packSequences(docs, L)
      assert(wordSpans.agg(sum("n_toks")).head().getLong(0) !==
        spans.agg(sum("n_toks")).head().getLong(0))
    } finally { spans.unpersist(); () }
  }

  test("store delete: physical rewrite across tiers, doomed partitions pruned") {
    import graft.tsdb.{StoreSettings, TimeSeriesStore}
    val root = java.nio.file.Files.createTempDirectory("r14-del").toString
    val st = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 10L))
    st.initialize()
    // tag A: ts 0..29 (3 partitions); tag B: ts 0..9 (1 partition)
    st.write(Map(
      "A" -> (0L until 30L).map(t => t -> s"a$t").toMap,
      "B" -> (0L until 10L).map(t => t -> s"b$t").toMap))
    st.flushL0()
    // tier partition A-0 to cold so the delete must rewrite BOTH tiers
    st.clock = () => System.currentTimeMillis() + 10000L
    st.purgeScan(partitionAgeThreshold = 2, maxPartitionsToMark = 1)
    st.pendingPurgeEntries().foreach { e =>
      st.archiveToCold(e.id); st.purgeAck(e.id, e.partitionName, e.tag); ()
    }
    st.clock = () => System.currentTimeMillis()
    assert(st.coldDF.count() === 10L)
    // delete A's ts 5..24: partial overlap with the COLD partition (0-9),
    // a fully-doomed HOT partition (10-19), partial with hot 20-29
    val n = st.delete("A", 5L, 24L)
    assert(n === 20L, s"deleted $n rows, expected 20")
    // RAW scans — no read-side filter can hide an undeleted member
    assert(st.allDF.where(col("tag") === "A" &&
      col("ts").between(5L, 24L)).count() === 0L)
    assert(st.allDF.where(col("tag") === "A").count() === 10L)
    assert(st.allDF.where(col("tag") === "B").count() === 10L, "delete leaked into B")
    // the fully-doomed partition directory pruned away
    val aHot = java.nio.file.Paths.get(st.namespaceRoot).resolve("hot")
    val gone = java.nio.file.Files.walk(aHot)
    val dirs = try {
      import scala.jdk.CollectionConverters._
      gone.iterator().asScala.map(_.getFileName.toString)
        .filter(_ == "partition_start=10").size
    } finally gone.close()
    assert(dirs === 0, "fully-doomed partition dir survived")
    // readData agrees end to end
    val a = st.readData(Map("A" -> (0L, 100L)))("A")
    assert(a.keySet === ((0L to 4L) ++ (25L to 29L)).toSet)
  }

  test("store delete: a foreign store instance never sees a torn or failing read mid-delete") {
    import graft.tsdb.{StoreSettings, TimeSeriesStore}
    val root = java.nio.file.Files.createTempDirectory("r14-delc").toString
    // grace > 0: the cross-process snapshot contract — retired files
    // outlive the swap long enough for in-flight foreign listings
    val cfg = StoreSettings(partitionWidth = 10L)
    val st = new TimeSeriesStore(spark, root, cfg, obsoleteGraceMs = 60000L)
    st.initialize()
    st.write(Map("A" -> (0L until 40L).map(t => t -> s"a$t").toMap))
    st.flushL0()
    val foreign = new TimeSeriesStore(spark, root, cfg, obsoleteGraceMs = 60000L)
    foreign.initialize()
    val full = (0L until 40L).map(t => t -> s"a$t").toMap
    val retained = full.filter { case (t, _) => t < 10L || t > 29L }
    @volatile var failure: Option[String] = None
    @volatile var run = true
    val reader = new Thread(() => {
      while (run && failure.isEmpty) {
        try {
          val got = foreign.readData(Map("A" -> (0L, 100L)))("A")
          // every observable state is full ⊇ got ⊇ retained with original
          // values — never a torn row, never a partial value
          got.foreach { case (t, v) =>
            if (full(t) != v) failure = Some(s"torn value at ts=$t: $v")
          }
          retained.keys.foreach { t =>
            if (!got.contains(t)) failure = Some(s"survivor ts=$t vanished")
          }
        } catch {
          case e: Exception => failure = Some(s"read failed: ${e.getMessage}")
        }
      }
    }, "r14-foreign-reader")
    reader.start()
    try {
      Thread.sleep(150) // let the reader observe the pre-delete state
      val n = st.delete("A", 10L, 29L)
      assert(n === 20L)
      Thread.sleep(300) // and the post-delete state
    } finally { run = false; reader.join(10000) }
    assert(failure.isEmpty, failure.getOrElse(""))
    // the foreign instance converges to exactly the retained set
    val after = foreign.readData(Map("A" -> (0L, 100L)))("A")
    assert(after.keySet === retained.keySet)
  }

  test("readAsOfDF: snapshots resolve through flush, delete, overwrite, compaction") {
    import graft.tsdb.{StoreSettings, TimeSeriesStore}
    val root = java.nio.file.Files.createTempDirectory("r14-tt").toString
    val st = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    st.write(Map(
      "a" -> Map(10L -> "1", 110L -> "2", 210L -> "3"),
      "b" -> Map(15L -> "9")))
    st.clock = () => 2000L
    st.flushL0() // L0 originals retire at 2000
    st.clock = () => 3000L
    assert(st.delete("a", 100L, 199L) === 1L) // kills (a, 110)
    st.clock = () => 4000L
    st.write(Map("a" -> Map(10L -> "1b"))) // LWW overwrite, lands in L0
    st.clock = () => 5000L
    st.compact(minFiles = 1, applyLww = true) // flush + rewrite everything

    def snap(t: Long): Map[(String, Long), String] =
      st.lwwDedup(st.readAsOfDF(t)).select("tag", "ts", "value").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap

    val gen1 = Map(("a", 10L) -> "1", ("a", 110L) -> "2",
      ("a", 210L) -> "3", ("b", 15L) -> "9")
    assert(snap(1500L) === gen1, "pre-flush snapshot (rows still in L0)")
    assert(snap(2500L) === gen1, "flush is layout-only: snapshot unchanged")
    assert(snap(3500L) === gen1 - (("a", 110L)),
      "post-delete snapshot must NOT resurrect the doomed row")
    val gen2 = gen1 - (("a", 110L)) + (("a", 10L) -> "1b")
    assert(snap(4500L) === gen2, "overwrite visible, delete still honored")
    assert(snap(5500L) === gen2, "compaction is layout-only: snapshot unchanged")

    // horizon guard: grace 0 refuses ANY historical read
    val g0root = java.nio.file.Files.createTempDirectory("r14-tt0").toString
    val g0 = new TimeSeriesStore(spark, g0root, StoreSettings(partitionWidth = 100L))
    g0.initialize(); g0.clock = () => 1000L
    g0.write(Map("a" -> Map(1L -> "x")))
    intercept[IllegalArgumentException] { g0.readAsOfDF(500L) }
    // bounded grace refuses beyond the window, serves inside it
    val bdroot = java.nio.file.Files.createTempDirectory("r14-ttb").toString
    val bd = new TimeSeriesStore(spark, bdroot,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 100L)
    bd.initialize(); bd.clock = () => 1000L
    bd.write(Map("a" -> Map(1L -> "x")))
    intercept[IllegalArgumentException] { bd.readAsOfDF(800L) } // < now-grace
    assert(bd.readAsOfDF(950L).count() === 0L) // inside window, pre-ingest
    assert(bd.readAsOfDF(1000L).count() === 1L) // as of now
  }

  test("readAsOfDF: snapshots resolve across a FOREIGN instance's mutations (shared ledger)") {
    import graft.tsdb.{StoreSettings, TimeSeriesStore}
    val root = java.nio.file.Files.createTempDirectory("r14-ttx").toString
    val cfg = StoreSettings(partitionWidth = 100L)
    val st = new TimeSeriesStore(spark, root, cfg, obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    st.write(Map("a" -> Map(10L -> "1", 110L -> "2")))
    st.flushL0()
    // a SECOND store instance (the multi-process shape: separate caches,
    // separate clocks, same root) deletes and compacts
    val foreign = new TimeSeriesStore(spark, root, cfg, obsoleteGraceMs = 1L << 60)
    foreign.initialize()
    foreign.clock = () => 3000L
    assert(foreign.delete("a", 100L, 199L) === 1L)
    foreign.clock = () => 5000L
    foreign.compact(minFiles = 1, applyLww = true)
    // OUR instance's snapshots classify the foreign mutations correctly:
    // its ledger entries (and their retirement clocks) live on the shared
    // root, not in the instance that wrote them
    st.clock = () => 6000L
    def snap(t: Long): Set[(Long, String)] =
      st.lwwDedup(st.readAsOfDF(t)).select("ts", "value").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snap(2000L) === Set((10L, "1"), (110L, "2")),
      "pre-foreign-delete snapshot lost rows")
    assert(snap(4000L) === Set((10L, "1")),
      "foreign delete invisible to this instance's snapshot")
    assert(snap(6000L) === Set((10L, "1")),
      "foreign compaction changed the visible state")
    // and the diff across the foreign mutation window classifies it
    val d = st.changesBetween(2000L, 4000L)
      .select("ts", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d === Set((110L, "delete")))
  }

  test("changesBetween: snapshot-diff CDF classifies exactly; layout churn is invisible") {
    import graft.tsdb.{StoreSettings, TimeSeriesStore}
    val root = java.nio.file.Files.createTempDirectory("r14-cdf").toString
    val st = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    st.write(Map(
      "a" -> Map(10L -> "1", 110L -> "2", 210L -> "3"),
      "b" -> Map(15L -> "9")))
    st.clock = () => 2000L
    st.flushL0()
    st.clock = () => 3000L
    st.delete("a", 100L, 199L)
    st.clock = () => 4000L
    st.write(Map("a" -> Map(10L -> "1b")))
    st.clock = () => 5000L
    st.compact(minFiles = 1, applyLww = true)

    def diff(f: Long, t: Long): Set[(String, Long, String, String)] =
      st.changesBetween(f, t).select("tag", "ts", "value", "change_type")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet

    // full mutation window: one delete, one paired update — and NOTHING
    // for the untouched keys even though flush + compaction rewrote
    // every one of their files between the endpoints
    assert(diff(2500L, 5500L) === Set(
      ("a", 110L, "2", "delete"),
      ("a", 10L, "1", "update_preimage"),
      ("a", 10L, "1b", "update_postimage")))
    // a window holding ONLY the compaction: empty diff (layout-only)
    assert(diff(4500L, 5500L) === Set.empty)
    // from-before-the-store: everything is an insert
    val ins = diff(500L, 1500L)
    assert(ins.size === 4 && ins.forall(_._4 == "insert"))
    // a pre-compaction endpoint answers identically (endpoint snapshots,
    // not commit replay, define the diff)
    assert(diff(2500L, 4500L) === diff(2500L, 5500L))
    intercept[IllegalArgumentException] { st.changesBetween(9L, 1L) }
  }
}
