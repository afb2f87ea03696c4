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
}
