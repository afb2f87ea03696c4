package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.StreamingIngest
import graft.tsdb.{ActivityLedger, Sample, StoreSettings, TimeSeriesStore}

/** Round-17 contracts: CDF tail ADMISSION CONTROL (a cold start on a
  * store whose history exceeds the per-window byte budget drains as a
  * sequence of bounded windows to exact parity; a kill mid-backlog
  * restart resumes without loss or duplication; a single indivisible
  * over-budget clock tick is served through the distributed fallback),
  * the upper-bounded change planner (a cut window lists only its own
  * slice of the backlog), MV self-maintenance under continuous ticks,
  * the sketch-extended IVM payload, and the MV fold-config marker.
  */
class Round17Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-round17-test")
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

  private def newStore(prefix: String, width: Long = 100L): TimeSeriesStore = {
    val st = new TimeSeriesStore(spark,
      Files.createTempDirectory(prefix).toString,
      StoreSettings(partitionWidth = width), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st
  }

  /** Fold a CDF change log (win_to-partitioned) into the final replica
    * state, window by window — the consumer's view.
    */
  private def foldLog(logDir: String): Map[(String, Long), String] = {
    val rows = spark.read.parquet(logDir)
      .select(col("win_to").cast("long"), col("change_type"),
        col("tag"), col("ts"), col("value"))
      .collect()
      .groupBy(_.getLong(0))
    val state = scala.collection.mutable.Map.empty[(String, Long), String]
    rows.toSeq.sortBy(_._1).foreach { case (_, ws) =>
      ws.foreach { r =>
        val k = (r.getString(2), r.getLong(3))
        r.getString(1) match {
          case "insert" | "update_postimage" => state(k) = r.getString(4)
          case "delete" => state.remove(k); ()
          case _ => ()
        }
      }
    }
    state.toMap
  }

  private def lwwState(st: TimeSeriesStore): Map[(String, Long), String] =
    st.lwwDedup(st.allDF).select("tag", "ts", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap

  /** A source store whose history spans MANY frozen mutation clocks and
    * comfortably exceeds a small per-window budget: 8 append ticks over
    * disjoint partition ranges plus a delete tick in the middle — the
    * deep-backlog shape the reference's consumer joins
    * (service.js:117-120, an already-deep purge queue).
    */
  private def deepHistory(prefix: String): TimeSeriesStore = {
    val src = newStore(prefix)
    (0 until 8).foreach { i =>
      val clock = 1000L * (i + 1)
      src.clock = () => clock
      src.writeSamples(
        samples("A", (i * 100) until (i * 100 + 40), t => s"a$t-$i",
          clock, "w1", i * 1000L) ++
        samples("B", (i * 100) until (i * 100 + 40), t => s"b$t-$i",
          clock, "w1", i * 1000L + 500L))
      src.flushL0()
    }
    src.clock = () => 9000L
    src.delete("A", 150L, 249L) // retraction inside the backlog
    src
  }

  // ------------------------------------------- CDF admission control

  test("CDF cold start on an over-budget history drains as bounded windows to parity") {
    val src = deepHistory("r17-admit")
    // pick a budget ~1/4 of the history so the drain MUST split: the
    // full (0, hw] window would throw over this cap without admission
    val hotBytes = {
      def du(p: java.nio.file.Path): Long = {
        val s = Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(q => Files.isRegularFile(q) &&
            q.getFileName.toString.endsWith(".parquet"))
            .map(Files.size).sum
        } finally s.close()
      }
      du(Paths.get(src.namespaceRoot))
    }
    val budget = math.max(hotBytes / 4, 4096L)
    intercept[graft.tsdb.ChangeWindowOverBudgetException] {
      src.changesBetweenLocal(0L, 9000L, budget)
    }
    val logDir = Files.createTempDirectory("r17-admitlog").toString
    val q = StreamingIngest.storeCdfStream(spark, src.namespaceRoot, logDir,
      graceMs = 1L << 60,
      checkpointDir = Some(Files.createTempDirectory("r17-admitck").toString),
      maxBytesPerWindow = Some(budget))
    try q.processAllAvailable() finally q.stop()
    // the admission gauge (ReportsSourceMetrics) reads zero once the
    // backlog has drained
    val lp = q.lastProgress
    assert(lp != null &&
      lp.sources.head.metrics.get("backlogClockMs") == "0",
      s"backlogClockMs should be 0 after a full drain: $lp")
    val wins = spark.read.parquet(logDir)
      .select(col("win_to").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(wins.size >= 2,
      "an over-budget backlog must drain as MULTIPLE windows, got " +
        wins.toSeq.sorted.mkString(","))
    assert(wins.max === 9000L, s"drain must reach the high water: $wins")
    assert(foldLog(logDir) === lwwState(src),
      "backlog drain diverged from the upstream LWW state")
  }

  test("CDF kill mid-backlog: restart resumes the drain without loss or duplication") {
    val src = deepHistory("r17-kill")
    val budget = 4096L // tiny: many windows, so the kill lands mid-drain
    val logDir = Files.createTempDirectory("r17-killlog").toString
    val ckpt = Files.createTempDirectory("r17-killck").toString

    // first incarnation: crash after two delivered batches
    val batches = new AtomicInteger(0)
    val q1 = spark.readStream
      .format("graft-store-cdf")
      .option("path", src.namespaceRoot)
      .option("graceMs", (1L << 60).toString)
      .option("maxBytesPerWindow", budget.toString)
      .load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (batches.incrementAndGet() > 2)
          sys.error("injected crash mid-backlog")
        if (!batch.isEmpty) {
          batch.write
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").partitionBy("win_to").parquet(logDir)
        }
        ()
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(batches.get() > 2, "the crash should land after real progress")

    // second incarnation: same checkpoint, drains the rest (the replayed
    // window rewrites its win_to partition — dynamic overwrite makes the
    // replay idempotent)
    val q2 = StreamingIngest.storeCdfStream(spark, src.namespaceRoot, logDir,
      graceMs = 1L << 60, checkpointDir = Some(ckpt),
      maxBytesPerWindow = Some(budget))
    try q2.processAllAvailable() finally q2.stop()
    assert(foldLog(logDir) === lwwState(src),
      "kill + restart diverged from the upstream LWW state")
    // no duplicated emission: each (win, key, change_type) appears once
    val dup = spark.read.parquet(logDir)
      .groupBy("win_to", "tag", "ts", "change_type")
      .count().where(col("count") > 1).count()
    assert(dup === 0L, "a replayed window duplicated change rows")
  }

  test("CDF single over-budget tick is served through the distributed scratch fallback") {
    import spark.implicits._
    val src = newStore("r17-bigtick", width = 10000L)
    src.clock = () => 1000L
    // ONE commit, one clock tick, thousands of rows — indivisible
    src.writeSamplesDistributed(
      (0 until 4000).map(i => (s"t${i % 7}", i * 10L, s"v$i", 1000L, "w1", i.toLong))
        .toDF("tag", "ts", "value", "ingestTs", "writerId", "seq"))
    val logDir = Files.createTempDirectory("r17-biglog").toString
    val q = StreamingIngest.storeCdfStream(spark, src.namespaceRoot, logDir,
      graceMs = 1L << 60,
      checkpointDir = Some(Files.createTempDirectory("r17-bigck").toString),
      maxBytesPerWindow = Some(1024L)) // far below the tick's bytes
    try {
      q.processAllAvailable()
      // a follow-up tick forces the engine to commit the first batch,
      // which must clean the scratch
      src.clock = () => 2000L
      src.writeSamples(samples("t0", 100000 until 100001, t => "late",
        2000L, "w2", 90000L))
      q.processAllAvailable()
    } finally q.stop()
    assert(foldLog(logDir) === lwwState(src),
      "distributed-fallback window diverged from the upstream state")
    val wins = spark.read.parquet(logDir)
      .select(col("win_to").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(wins.contains(1000L),
      s"the over-budget tick must be served as its own window: $wins")
    val scratch = Paths.get(src.namespaceRoot, ".cdf-scratch")
    val leftover =
      if (!Files.isDirectory(scratch)) Seq.empty
      else {
        val s = Files.list(scratch)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toSeq
        } finally s.close()
      }
    assert(!leftover.contains("win-0-1000"),
      s"committed windows' scratch must be cleaned: $leftover")
  }

  // ----------------------------------- upper-bounded change planning

  test("admission planner: cut windows list only their own backlog slice; brackets survive log compaction") {
    val st = newStore("r17-brackets")
    st.clock = () => 1000L
    st.writeSamples(samples("A", 0 until 5, t => s"a$t", 1000L, "w1", 0L))
    st.flushL0()
    st.clock = () => 3000L
    st.writeSamples(samples("B", 100 until 105, t => s"b$t", 3000L, "w1", 100L))
    st.flushL0()
    val actDir = Paths.get(st.namespaceRoot, "activity")
    // upper bound prunes the later tick...
    assert(ActivityLedger.changedBetween(actDir, 0L, 1500L) ===
      Set(("A", 0L)))
    // ...and the full range sees both
    assert(ActivityLedger.changedBetween(actDir, 0L, Long.MaxValue) ===
      Set(("A", 0L), ("B", 100L)))
    assert(ActivityLedger.churnBrackets(actDir, 0L) ===
      Map(("A", 0L) -> (1000L, 1000L), ("B", 100L) -> (3000L, 3000L)))
    // a cut window's SCAN PLAN lists only its own slice
    val plan = st.changeScanPlan(0L, 1500L,
      graft.tsdb.GcLedger.retirementClocks(
        Paths.get(st.namespaceRoot, "gc")), countTotal = false)
    assert(plan.changedKeys === Set(("A", 0L)),
      s"cut window over-planned: ${plan.changedKeys}")
    assert((plan.hotFiles ++ plan.coldFiles).map(_.toString)
      .forall(_.contains("tag=A")))
    // activity-log compaction preserves the brackets (min-amin merge)
    st.compactActivityLog()
    assert(ActivityLedger.changedBetween(actDir, 0L, 1500L) ===
      Set(("A", 0L)), "compaction lost the amin bracket")
    assert(ActivityLedger.churnBrackets(actDir, 0L) ===
      Map(("A", 0L) -> (1000L, 1000L), ("B", 100L) -> (3000L, 3000L)))
    // admitChangeWindow: with a budget below the total, the cut lands
    // one clock below B's tick; with a generous budget it reaches hw
    val aBytes = {
      val s = Files.walk(Paths.get(st.namespaceRoot, "hot"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            p.toString.contains("tag=A") &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(Files.size).sum
      } finally s.close()
    }
    assert(st.admitChangeWindow(0L, 3000L, aBytes) === 2999L)
    assert(st.admitChangeWindow(0L, 3000L, Long.MaxValue) === 3000L)
    // a single over-budget tick is returned as-is (indivisible)
    assert(st.admitChangeWindow(0L, 3000L, 1L) === 1000L)
  }

  // ------------------------------------- MV maintenance + fold config

  test("MV self-maintenance: 50 windows keep the MV file count bounded, state exact") {
    val bucketMs = 200L
    val src = newStore("r17-mvsrc")
    val mv = newStore("r17-mv")
    var from = 0L
    (1 to 50).foreach { i =>
      val clock = 1000L * i
      src.clock = () => clock
      mv.clock = () => clock // deterministic L0 ages for the pre-gate
      // churn two groups per window: one stable tag, one rotating
      src.writeSamples(Seq(
        Sample("hot", (i % 10) * 10L, s"${i % 7}", clock, "w1", i.toLong),
        Sample(s"t${i % 5}", i * 10L, s"${i % 9}", clock, "w1", 1000L + i)))
      val w = StreamingIngest.cdfWindowDF(spark, src, from, clock)
      StreamingIngest.applyCdfWindow(mv, src, w, bucketMs)
      // the cdfRollupMv foreachBatch hook, at a tick-scaled L0 age bound
      // (2 frozen ticks) so the periodic pass actually fires in-test
      StreamingIngest.maintainMv(mv, minFiles = 4, l0MaxAgeMs = 2000L)
      from = clock
    }
    // bounded layout: L0 drains every few ticks; no partition dir
    // accumulates past the compaction threshold plus the fresh tail
    val mvRoot = Paths.get(mv.namespaceRoot)
    def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] =
      if (!Files.isDirectory(p)) Seq.empty
      else {
        val s = Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(q => Files.isRegularFile(q) &&
            q.getFileName.toString.endsWith(".parquet") &&
            !q.getFileName.toString.startsWith(".")).toSeq
        } finally s.close()
      }
    val pending = graft.tsdb.GcLedger.retirementClocks(mvRoot.resolve("gc"))
      .keySet
    def liveCount(p: java.nio.file.Path): Int = parquetFiles(p)
      .count(f => !pending.contains(f.toAbsolutePath.normalize))
    val l0Count = liveCount(mvRoot.resolve("l0"))
    assert(l0Count < 10,
      s"MV L0 must stay bounded under continuous ticks: $l0Count files")
    val perDir = parquetFiles(mvRoot.resolve("hot"))
      .filter(f => !pending.contains(f.toAbsolutePath.normalize))
      .groupBy(_.getParent).view.mapValues(_.size)
    assert(perDir.values.forall(_ <= 8),
      s"a hot partition dir outgrew the maintenance bound: " +
        perDir.maxBy(_._2).toString)
    // the maintained MV still answers exactly
    val part = split(col("value"), ":")
    val got = mv.lwwDedup(mv.allDF)
      .select(col("tag"), col("ts"),
        part.getItem(0).cast("long"), part.getItem(1).cast("long"),
        part.getItem(2).cast("long"), part.getItem(3).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .filter(_._3 > 0L).toSeq.sorted
    val cents = floor(col("value").cast("double") * 100 + lit(0.5)).cast("long")
    val want = src.lwwDedup(src.allDF)
      .select(col("tag"),
        (col("ts") - pmod(col("ts"), lit(bucketMs))).as("b"), cents.as("c"))
      .groupBy("tag", "b")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        min("c").as("mn"), max("c").as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq.sorted
    assert(got === want, "maintained MV diverged from recompute")
  }

  test("MV fold config is persisted at first fold and later mismatches are refused") {
    val src = newStore("r17-cfgsrc")
    val mv = newStore("r17-cfgmv")
    src.clock = () => 1000L
    src.writeSamples(samples("A", 0 until 3, t => "1", 1000L, "w1", 0L))
    val w = StreamingIngest.cdfWindowDF(spark, src, 0L, 1000L)
    StreamingIngest.applyCdfWindow(mv, src, w, bucketMs = 200L)
    // a different bucketMs against the same MV is refused loudly
    val ex = intercept[IllegalArgumentException] {
      StreamingIngest.applyCdfWindow(mv, src, w, bucketMs = 300L)
    }
    assert(ex.getMessage.contains("fold config mismatch"))
    // a toggled payload arity too
    intercept[IllegalArgumentException] {
      StreamingIngest.applyCdfWindow(mv, src, w, bucketMs = 200L,
        trackExtremes = false)
    }
    // the matching config keeps folding (replay) fine
    StreamingIngest.applyCdfWindow(mv, src, w, bucketMs = 200L)
  }

  // ------------------------------------------------- SQL time travel

  test("VERSION AS OF / TIMESTAMP AS OF through the catalog: complete snapshot incl. L0 and the ingest bound") {
    val st = newStore("r17-sqltt")
    st.clock = () => 1000L
    st.writeSamples(samples("A", 0 until 5, t => s"v1-$t", 1000L, "w1", 0L))
    st.flushL0()
    st.clock = () => 2000L
    st.writeSamples(samples("B", 0 until 3, t => s"b1-$t", 2000L, "w1", 50L))
    st.flushL0()
    st.clock = () => 3000L
    // UNFLUSHED driver batch: stays in the L0 tier — a snapshot read
    // that missed the L0 union would lose these rows
    st.writeSamples(
      samples("A", 2 until 7, t => s"v2-$t", 3000L, "w1", 100L) ++
      samples("B", 3 until 5, t => s"b2-$t", 3000L, "w1", 200L))

    spark.conf.set("spark.sql.catalog.tsdbr17", "graft.sources.TsdbCatalog")
    spark.conf.set("spark.sql.catalog.tsdbr17.root", st.rootDir)
    spark.conf.set("spark.sql.catalog.tsdbr17.graceMs", (1L << 60).toString)
    val ns = st.settings.settingsHash

    def sqlSnap(travel: String): Seq[(String, Long, String)] =
      spark.sql(s"""
          SELECT tag, ts, value
          FROM (SELECT *, row_number() OVER (PARTITION BY tag, ts
                  ORDER BY ingestTs DESC, seq DESC, writerId DESC) AS rn
                FROM tsdbr17.`$ns`.`all` $travel)
          WHERE rn = 1""")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted
    def apiSnap(t: Long): Seq[(String, Long, String)] =
      st.lwwDedup(st.connectorAsOfDF(t)).select("tag", "ts", "value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted

    // t=1000: B's hot file (published at 2000) and the L0 batch exist
    // ON DISK but every row carries a later ingest clock — the row
    // bound must exclude them all
    assert(sqlSnap("VERSION AS OF 1000") === apiSnap(1000L))
    assert(sqlSnap("VERSION AS OF 1000").forall(r =>
        r._1 == "A" && r._3.startsWith("v1")),
      "rows ingested after the snapshot leaked through the SQL read")
    // t=3000: the unflushed L0 rows MUST be visible
    val at3000 = sqlSnap("VERSION AS OF 3000")
    assert(at3000 === apiSnap(3000L))
    assert(at3000.exists(_._3.startsWith("b2")),
      "unflushed L0 rows missing from SQL snapshot")
    // TIMESTAMP AS OF — Spark hands epoch micros; 3000 ms = '…00:00:03'
    assert(sqlSnap("TIMESTAMP AS OF '1970-01-01 00:00:03'") === at3000)

    // a tag-filtered time travel still dir-prunes (B's dir dropped) and
    // the L0 reader re-applies the dropped tag filter row-wise
    val filtered = spark.sql(
      s"SELECT tag, ts, value FROM tsdbr17.`$ns`.`all` VERSION AS OF 3000 " +
        "WHERE tag = 'A'")
    val p = filtered.queryExecution.executedPlan.toString
    val m = """dirs=(\d+)/(\d+)""".r.findFirstMatchIn(p)
    assert(m.isDefined && m.get.group(1).toLong < m.get.group(2).toLong,
      s"expected a strict directory prune under time travel:\n$p")
    assert(filtered.collect().map(_.getString(0)).forall(_ == "A"))
    // raw (pre-LWW) member parity with the Scala snapshot lane
    assert(filtered.count() ===
      st.connectorAsOfDF(3000L).where(col("tag") === "A").count())

    // guards: time travel without the deployed grace is refused loudly;
    // a snapshot beyond the retention window is refused by the shared
    // horizon guard
    spark.conf.set("spark.sql.catalog.tsdbng", "graft.sources.TsdbCatalog")
    spark.conf.set("spark.sql.catalog.tsdbng.root", st.rootDir)
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM tsdbng.`$ns`.`all` VERSION AS OF 2000").collect()
    }
    assert(e1.getMessage.contains("graceMs"), e1.getMessage)
    spark.conf.set("spark.sql.catalog.tsdbsh", "graft.sources.TsdbCatalog")
    spark.conf.set("spark.sql.catalog.tsdbsh.root", st.rootDir)
    spark.conf.set("spark.sql.catalog.tsdbsh.graceMs", "1")
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM tsdbsh.`$ns`.`all` VERSION AS OF 1000").collect()
    }
    assert(e2.getMessage.contains("retention window"), e2.getMessage)
  }

  // --------------------------------------------- sketch-extended IVM

  test("sketch MV: the quantile sketch column tracks a full recompute through retractions") {
    import graft.functions.QuantileSketch
    val bucketMs = 200L
    val cap = 64
    val src = newStore("r17-sksrc")
    val mv = newStore("r17-skmv")
    def drain(from: Long, to: Long): Unit = {
      val w = StreamingIngest.cdfWindowDF(spark, src, from, to)
      StreamingIngest.applyCdfWindow(mv, src, w, bucketMs,
        sketchCap = Some(cap))
    }
    src.clock = () => 1000L
    src.writeSamples(
      samples("A", 0 until 150, t => s"${t % 97}", 1000L, "w1", 0L) ++
      samples("B", 0 until 60, t => s"${t % 11}", 1000L, "w1", 5000L))
    drain(0L, 1000L)
    src.clock = () => 2000L
    src.delete("A", 40L, 119L) // retract a big slice: sketch must shrink
    drain(1000L, 2000L)
    src.clock = () => 3000L
    src.writeSamples(samples("A", 100 until 130, t => s"${t % 13}", 3000L,
      "w2", 9000L))
    drain(2000L, 3000L)
    // replay idempotence for the sketch lane too
    drain(2000L, 3000L)
    // expected: recompute each group's sketch from the final LWW state
    val cents = floor(col("value").cast("double") * 100 + lit(0.5)).cast("long")
    val groups = src.lwwDedup(src.allDF)
      .select(col("tag"),
        (col("ts") - pmod(col("ts"), lit(bucketMs))).as("b"), cents.as("c"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(_.getLong(2)).toSeq).toMap
    val agg = QuantileSketch.sketchWith(cap)
    val expected = groups.map { case (k, cs) =>
      val res = agg.finish(cs.foldLeft(agg.zero)(agg.reduce))
      val estStr = if (res.ests.isEmpty) "::" else res.ests.mkString(":")
      k -> (s"${cs.size}:${cs.sum}:${cs.min}:${cs.max}:" +
        s"${res.level}:${res.total}:${res.ndv}:$estStr")
    }
    val got = mv.lwwDedup(mv.allDF)
      .select(col("tag"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .filter(!_._2.startsWith("0:0:")).toMap
    assert(got === expected, "sketch MV diverged from recompute")
    // the DISTRIBUTED merge branch renders bit-identical payloads
    val mv2 = newStore("r17-skmv2")
    var f = 0L
    Seq(1000L, 2000L, 3000L).foreach { t =>
      val w = StreamingIngest.cdfWindowDF(spark, src, f, t)
      StreamingIngest.applyCdfWindow(mv2, src, w, bucketMs,
        sketchCap = Some(cap), maxDriverGroups = 0L)
      f = t
    }
    val got2 = mv2.lwwDedup(mv2.allDF)
      .select(col("tag"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
      .filter(!_._2.startsWith("0:0:")).toMap
    assert(got2 === expected,
      "distributed sketch merge diverged from the driver branch")
  }
}
