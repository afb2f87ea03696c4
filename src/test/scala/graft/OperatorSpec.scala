package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.AsOfJoin
import graft.tsdb.{StoreSettings, TimeSeriesStore}

import scala.jdk.CollectionConverters._

/** Specs for the as-of join operator and LSM compaction. */
class OperatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-operator-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("asof backward join picks the latest right row at-or-before each left row") {
    import spark.implicits._
    val purchases = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 30L))
      .toDF("event_id", "user_id", "ts_ms")
    val clicks = Seq((1L, 1L, 5L), (2L, 1L, 50L), (3L, 1L, 60L), (4L, 2L, 40L))
      .toDF("event_id", "user_id", "ts_ms")
    val got = AsOfJoin.backward(purchases, clicks, Seq("user_id"),
      "ts_ms", "ts_ms", "event_id", "c_")
      .select("event_id", "c_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(100L) === 2L)  // click at exactly ts=50 counts (<=)
    assert(got(101L) === 1L)  // click at 5 precedes purchase at 10
    assert(got(102L) === -1L) // user 2's only click is later → null
  }

  test("native sort-merge asof join matches the compositional form exactly") {
    import spark.implicits._
    // covers: exact-ts inclusion, no-match nulls, equal-ts tiebreak (max
    // event_id wins backward), multi-key groups, and an empty-right key
    val purchases = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 30L),
      (103L, 3L, 99L), (104L, 1L, 4L))
      .toDF("event_id", "user_id", "ts_ms")
    val clicks = Seq((1L, 1L, 5L), (2L, 1L, 50L), (5L, 1L, 50L), (3L, 1L, 60L),
      (4L, 2L, 40L)).toDF("event_id", "user_id", "ts_ms")
    val native = graft.plans.NativeAsOfJoin.backward(purchases, clicks,
      Seq("user_id"), "ts_ms", "ts_ms", "event_id", "c_")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val composed = AsOfJoin.backward(purchases, clicks,
      Seq("user_id"), "ts_ms", "ts_ms", "event_id", "c_")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(native === composed)
    // spot-check semantics: equal-ts clicks 2 and 5 at ts=50 → largest id
    val byId = native.map(r => r.head -> r(3)).toMap
    assert(byId(100L) === 5L)   // tie at ts=50 → max tiebreak
    assert(byId(103L) === null) // user 3 has no clicks at all
    assert(byId(104L) === null) // user 1 purchase before any click
    // the physical plan really is the custom operator
    val plan = graft.plans.NativeAsOfJoin.backward(purchases, clicks,
      Seq("user_id"), "ts_ms", "ts_ms", "event_id", "c_")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan.take(500)) // nodeName strips "Exec"
  }

  test("native asof forward matches the compositional forward incl. ties") {
    import spark.implicits._
    val left = Seq((100L, 1L, 50L), (101L, 2L, 10L)).toDF("event_id", "user_id", "ts_ms")
    val right = Seq((7L, 1L, 55L), (3L, 1L, 55L), (9L, 1L, 70L))
      .toDF("event_id", "user_id", "ts_ms")
    val native = graft.plans.NativeAsOfJoin.forward(left, right,
      Seq("user_id"), "ts_ms", "ts_ms", "event_id", "r_")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val composed = AsOfJoin.forward(left, right,
      Seq("user_id"), "ts_ms", "ts_ms", "event_id", "r_")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(native === composed)
    assert(native.head(3) === 3L) // equal-ts tie at 55 → smallest event_id
  }

  test("asof forward join picks the earliest right row at-or-after each left row") {
    import spark.implicits._
    val left = Seq((100L, 1L, 50L)).toDF("event_id", "user_id", "ts_ms")
    val right = Seq((1L, 1L, 30L), (2L, 1L, 55L), (3L, 1L, 70L))
      .toDF("event_id", "user_id", "ts_ms")
    val got = AsOfJoin.forward(left, right, Seq("user_id"),
      "ts_ms", "ts_ms", "event_id", "r_")
      .select("event_id", "r_event_id", "r_ts_ms").collect()(0)
    assert(got.getLong(1) === 2L && got.getLong(2) === 55L)
  }

  test("asof forward join breaks right-side ts ties by smallest tiebreak") {
    import spark.implicits._
    val left = Seq((100L, 1L, 50L)).toDF("event_id", "user_id", "ts_ms")
    // two right rows at the SAME ts ≥ left ts: the smaller event_id wins
    // (mirrors the ts_asof_fwd oracle's ROW_NUMBER ORDER BY ts, event_id)
    val right = Seq((7L, 1L, 55L), (3L, 1L, 55L), (9L, 1L, 70L))
      .toDF("event_id", "user_id", "ts_ms")
    val got = AsOfJoin.forward(left, right, Seq("user_id"),
      "ts_ms", "ts_ms", "event_id", "r_")
      .select("event_id", "r_event_id", "r_ts_ms").collect()(0)
    assert(got.getLong(1) === 3L && got.getLong(2) === 55L)
    // and the left row's own columns come back un-negated
    assert(got.getLong(0) === 100L)
  }

  test("salted skew join rejects join types unsound under build-side replication") {
    import spark.implicits._
    val l = Seq((1L, "a")).toDF("k", "lv")
    val r = Seq((1L, "b")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.salted(l, r, "k", factor = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.salted(l, r, "k", factor = 4, joinType = "full_outer")
    }
    // probe-side-preserving types still work
    assert(graft.operators.SkewJoin.salted(l, r, "k", 4, "left_anti").count() === 0L)
    assert(graft.operators.SkewJoin.salted(l, r, "k", 4, "left_semi").count() === 1L)
  }

  test("salted skew join returns exactly the unsalted join result") {
    import spark.implicits._
    // heavy skew: 1000 rows of one key, a handful of others
    val left = ((1 to 1000).map(i => (1L, s"l$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "lv")
    val right = Seq((1L, "r1"), (1L, "r2"), (2L, "r3"), (4L, "r4")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = graft.operators.SkewJoin.salted(left, right, "k", factor = 8)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.size === 2001) // 1000*2 + 1
    // the salted plan's shuffle key includes the shard column
    val planStr = graft.operators.SkewJoin.salted(left, right, "k", 8)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("__salt"))
  }

  test("compaction merges multi-file partitions and preserves reads") {
    val root = Files.createTempDirectory("graft-compact").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 100L))
    store.initialize()
    // 4 separate writes into the same partition, incl. 3 upserts of ts=1;
    // each flushed L0→L1 so the partition accrues one file per write
    store.write(Map("CTag" -> Map(1L -> "v1", 2L -> "a"))); store.flushL0()
    store.write(Map("CTag" -> Map(1L -> "v2"))); store.flushL0()
    store.write(Map("CTag" -> Map(1L -> "v3", 3L -> "b"))); store.flushL0()
    store.write(Map("CTag" -> Map(4L -> "c"))); store.flushL0()
    val before = store.readData(Map("CTag" -> (0L, 99L)))
    val partDir = java.nio.file.Paths.get(root).resolve(store.settings.settingsHash)
      .resolve("hot").resolve("tag=CTag").resolve("partition_start=0")
    def nFiles = Files.list(partDir).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(nFiles === 4)
    val compacted = store.compact(minFiles = 2, applyLww = true)
    assert(compacted === 1)
    assert(nFiles === 1)
    // LWW merge dropped the superseded members
    assert(store.hotDF.count() === 4) // ts 1,2,3,4 — one row each
    val after = store.readData(Map("CTag" -> (0L, 99L)))
    assert(after === before)
    assert(after("CTag")(1L) === "v3")
  }

  test("block cache serves fresh data across upsert, flush, compact, and ack") {
    val root = Files.createTempDirectory("graft-blockcache").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 100L))
    store.initialize()
    def read() = store.readData(Map("BTag" -> (0L, 99L)))("BTag")
    store.write(Map("BTag" -> Map(1L -> "v1", 2L -> "a")))
    assert(read()(1L) === "v1") // populates the cache
    store.write(Map("BTag" -> Map(1L -> "v2"))) // upsert lands in a NEW L0 file
    assert(read()(1L) === "v2")
    store.flushL0()                              // L0 files replaced by L1 files
    assert(read()(1L) === "v2")
    store.compact(minFiles = 1, applyLww = true) // partition files rewritten
    assert(read()(1L) === "v2")
    Thread.sleep(1100)                           // age past the purge threshold
    val marked = store.purgeScan(partitionAgeThreshold = 1, maxPartitionsToMark = 10)
    assert(marked.nonEmpty)
    store.pendingPurgeEntries().foreach { e =>
      store.archiveToCold(e.id)
      assert(store.purgeAck(e.id, e.partitionName, e.tag) === 1)
    }
    // now served from the cold tier — still the upserted value
    assert(read()(1L) === "v2")
  }

  test("compaction over many partitions runs as one batched job, not one per dir") {
    val root = Files.createTempDirectory("graft-compact-many").toString
    val store = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 10L))
    store.initialize()
    // 60 partitions (6 tags × 10 windows), each written twice → 2 files each
    (0 until 2).foreach { round =>
      (0 until 6).foreach { t =>
        store.write(Map(s"MTag$t" ->
          (0 until 10).map(p => (p * 10L + round) -> s"v$t-$p-$round").toMap))
        store.flushL0()
      }
    }
    val before = store.readData((0 until 6).map(t => s"MTag$t" -> (0L, 200L)).toMap)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val n =
      try store.compact(minFiles = 2, applyLww = true)
      finally {
        Thread.sleep(500) // let async job-start events drain
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(n === 60)
    // one partitionBy rewrite job (+ possibly a listing job), NOT 60
    assert(jobs.get() <= 5, s"compact scheduled ${jobs.get()} Spark jobs for 60 partitions")
    val after = store.readData((0 until 6).map(t => s"MTag$t" -> (0L, 200L)).toMap)
    assert(after === before)
  }
}
