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
}
