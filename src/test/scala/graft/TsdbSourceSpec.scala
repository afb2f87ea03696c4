package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** The engine-native DataSource V2 connector (`graft-tsdb`,
  * graft.sources.TsdbTableProvider): result parity with the generic
  * parquet tier reads, plan-time directory pruning, projection pushdown,
  * and the dir-column-only / pure-count projections.
  */
class TsdbSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tsdb-source-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Cols = Seq("tag", "partition_start", "ts", "value", "ingestTs", "writerId", "seq")

  /** width-5 store with two tags across partitions 0,5,10,15. */
  private lazy val store: TimeSeriesStore = {
    val root = Files.createTempDirectory("graft-dsv2").toString
    val st = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    st.initialize()
    st.write(Map(
      "alpha" -> Map(1L -> "a1", 2L -> "a2", 7L -> "a7", 12L -> "a12", 18L -> "a18"),
      "beta"  -> Map(3L -> "b3", 9L -> "b9", 16L -> "b16")))
    st.flushL0()
    st
  }

  private def rows(df: DataFrame): Set[(String, Long, Long, String)] =
    df.select(col("tag"), col("partition_start"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  private def scanDesc(df: DataFrame): String = {
    df.collect() // force planning
    df.queryExecution.executedPlan.toString
  }

  test("full connector scan matches the generic parquet tier read") {
    val viaConnector = rows(store.connectorDF("hot"))
    val viaParquet = rows(store.hotDF)
    assert(viaConnector == viaParquet)
    assert(viaConnector.size == 8)
  }

  test("tag filter prunes tag directories at plan time") {
    val df = store.connectorDF("hot").where(col("tag") === "beta")
    val plan = scanDesc(df)
    assert(plan.contains("TsdbScan"))
    // beta has windows 0,5,15 → 3 of 7 total dirs (alpha has 4)
    assert(plan.contains("dirs=3/7"), s"plan was:\n$plan")
    assert(rows(df) == rows(store.hotDF.where(col("tag") === "beta")))
  }

  test("ts bounds prune window directories through the width invariant") {
    val df = store.connectorDF("hot")
      .where(col("ts").between(6L, 11L)) // windows 5..10 only
    val plan = scanDesc(df)
    // surviving: alpha/5, alpha/10, beta/5 → 3 of 7 (window 0 and 15 pruned)
    assert(plan.contains("dirs=3/7"), s"plan was:\n$plan")
    // residual ts filter still applied row-level
    assert(rows(df) == rows(store.hotDF.where(col("ts").between(6L, 11L))))
  }

  test("partition_start predicates prune exactly (no residual rescan)") {
    val df = store.connectorDF("hot").where(col("partition_start") === 15L)
    val plan = scanDesc(df)
    assert(plan.contains("dirs=2/7"), s"plan was:\n$plan") // alpha/15, beta/15
    assert(rows(df) == rows(store.hotDF.where(col("partition_start") === 15L)))
  }

  test("tag IN + ts range composes tag and window pruning") {
    val df = store.connectorDF("hot")
      .where(col("tag").isin("alpha") && col("ts") >= 12L)
    val plan = scanDesc(df)
    assert(plan.contains("dirs=2/7"), s"plan was:\n$plan") // alpha/10, alpha/15
    assert(rows(df) ==
      rows(store.hotDF.where(col("tag") === "alpha" && col("ts") >= 12L)))
  }

  test("projection pushdown: narrow select and pure count are correct") {
    val narrow = store.connectorDF("hot").select("ts").collect().map(_.getLong(0)).sorted
    assert(narrow.toSeq == Seq(1L, 2L, 3L, 7L, 9L, 12L, 16L, 18L))
    assert(store.connectorDF("hot").count() == 8L)
    // dir-columns-only projection (no physical column requested)
    val tags = store.connectorDF("hot").select("tag")
      .groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags == Map("alpha" -> 5L, "beta" -> 3L))
  }

  test("runtime filters re-prune directories (DPP analog)") {
    import org.apache.spark.sql.sources.{In => SrcIn}
    import graft.sources.TsdbScanBuilder
    val b = new TsdbScanBuilder(store.namespaceRoot, "hot", 5L)
    val scan = b.build().asInstanceOf[graft.sources.TsdbScan]
    val before = scan.toBatch.planInputPartitions().length
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      SrcIn("tag", Array("beta")),
      SrcIn("partition_start", Array(0L, 15L))))
    val after = scan.toBatch.planInputPartitions().length
    assert(before == 7 && after == 2, s"before=$before after=$after") // beta/0, beta/15
  }

  test("broadcast dim join on tag stays correct (runtime-filter path)") {
    import spark.implicits._
    val dim = Seq(("beta", 10L)).toDF("d_tag", "weight")
    val joined = store.connectorDF("hot")
      .join(broadcast(dim), col("tag") === col("d_tag"))
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("weight").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(joined == Set(("beta", 3L, 30L)))
  }

  test("DSv2 write: two-phase-commit append lands rows, records activity") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dsv2-w").toString
    val st = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    st.initialize()
    val df = Seq(
      ("wa", 1L, "v1", 100L, "w0", 1L),
      ("wa", 7L, "v7", 101L, "w0", 2L),
      ("wb", 12L, "v12", 102L, "w0", 3L))
      .toDF("tag", "ts", "value", "ingestTs", "writerId", "seq")
    st.connectorAppend(df)
    // rows visible through BOTH read paths
    assert(rows(st.connectorDF("hot")) == Set(
      ("wa", 0L, 1L, "v1"), ("wa", 5L, 7L, "v7"), ("wb", 10L, 12L, "v12")))
    assert(rows(st.hotDF) == rows(st.connectorDF("hot")))
    // staging cleaned, activity has one "w" row per touched window
    assert(!Files.list(java.nio.file.Paths.get(st.namespaceRoot, "tmp"))
      .iterator().hasNext)
    val acts = st.recentActivityDF.select("tag", "partitionStart")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(acts == Set(("wa", 0L), ("wa", 5L), ("wb", 10L)))
  }

  test("DSv2 write: a mismatched partition_start fails the write (golden validation)") {
    import spark.implicits._
    val bad = Seq(("wa", 7L, "v", 1L, "w", 1L, 0L)) // ts=7 under width 5 → ps must be 5
      .toDF("tag", "ts", "value", "ingestTs", "writerId", "seq", "partition_start")
    val e = intercept[Exception] {
      bad.write.format("graft-tsdb")
        .option("path", store.namespaceRoot)
        .option("tier", "hot")
        .option("partitionWidth", "5")
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("partition_start 0 does not match ts 7")))
    // nothing published, staging aborted
    assert(rows(store.connectorDF("hot")).forall(_._1 != "wa"))
  }

  test("DSv2 write: unexpected or missing columns are refused at plan time") {
    import spark.implicits._
    val extra = Seq(("a", 1L)).toDF("tag", "bogus")
    val e = intercept[Exception] {
      extra.write.format("graft-tsdb")
        .option("path", store.namespaceRoot)
        .option("tier", "hot")
        .option("partitionWidth", "5")
        .mode("append").save()
    }
    assert(e.getMessage != null)
  }

  test("scan statistics drive an automatic broadcast of a small connector read") {
    import spark.implicits._
    // a large-ish in-memory side vs the tiny pruned connector read: with
    // estimateStatistics reporting post-prune bytes, Spark must choose a
    // BroadcastHashJoin with NO explicit broadcast() hint
    val big = spark.range(0, 50000)
      .select((col("id") % 20).cast("long").as("k"),
        concat(lit("tag-"), (col("id") % 3).cast("string")).as("tag"))
    val joined = big.join(store.connectorDF("hot").where(col("tag") === "beta"), Seq("tag"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
  }

  test("storage-partitioned aggregation: groupBy on layout keys has no exchange") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // sum(ts) is NOT footer-pushable (only count/min/max are), so this
      // pins the row-reading storage-partitioned path: the scan reports
      // KeyGroupedPartitioning and the groupBy runs with no exchange.
      // (count/min/max on the same keys take the pushed footer path
      // instead — covered by the agg-pushdown cases below.)
      val agg = store.connectorDF("hot")
        .groupBy("tag", "partition_start")
        .agg(sum(col("ts")).as("sum_ts"))
      val got = agg.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // sums match the generic read
      val want = store.hotDF.groupBy("tag", "partition_start")
        .agg(sum(col("ts")).as("sum_ts")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("PushedAggregates"), s"sum must not push:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"expected storage-partitioned aggregation without a shuffle:\n$p")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("property: connectorAppend and writeSamplesDistributed produce identical stores") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val batch = (1 to 400).map { i =>
      (s"t${rnd.nextInt(5)}", rnd.nextInt(200).toLong, s"v$i",
        rnd.nextInt(50).toLong, s"w${rnd.nextInt(3)}", i.toLong)
    }
    val df = batch.toDF("tag", "ts", "value", "ingestTs", "writerId", "seq")
    def fresh(): TimeSeriesStore = {
      val st = new TimeSeriesStore(spark,
        Files.createTempDirectory("graft-eq").toString,
        StoreSettings(partitionWidth = 25L))
      st.initialize(); st
    }
    val a = fresh(); a.connectorAppend(df)
    val b = fresh(); b.writeSamplesDistributed(df)
    def all(st: TimeSeriesStore) = st.connectorDF("hot")
      .select(Cols.map(col): _*).collect()
      .map(_.toSeq.toList).toSet
    assert(all(a) == all(b))
    // and the generic parquet read agrees with the connector on both
    assert(rows(a.hotDF) == rows(a.connectorDF("hot")))
  }

  test("SQL catalog: SELECT and INSERT against tsdb.<ns>.hot, dirs pruned") {
    spark.conf.set("spark.sql.catalog.tsdb", "graft.sources.TsdbCatalog")
    spark.conf.set("spark.sql.catalog.tsdb.root", store.rootDir)
    val ns = store.settings.settingsHash
    val df = spark.sql(
      s"SELECT tag, ts, value FROM tsdb.`$ns`.hot " +
        "WHERE tag = 'alpha' AND ts BETWEEN 12 AND 20 ORDER BY ts")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(("alpha", 12L, "a12"), ("alpha", 18L, "a18")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TsdbScan") && plan.contains("dirs=2/"), plan)
    // INSERT routes through the two-phase-commit writer
    spark.sql(
      s"INSERT INTO tsdb.`$ns`.hot VALUES ('gamma', 20, 21, 'g21', 900, 'sql', 77)")
    val back = spark.sql(
      s"SELECT partition_start, value FROM tsdb.`$ns`.hot WHERE tag = 'gamma'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((20L, "g21")))
    // listTables surfaces the tiers
    val tables = spark.sql(s"SHOW TABLES IN tsdb.`$ns`").collect().map(_.getString(1)).toSet
    assert(tables == Set("hot", "cold", "all"))
  }

  test("DSv2 streaming sink: epochs publish atomically into the hot tier") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-dsv2-st").toString
    val st = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 5L))
    st.initialize()
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, String, Long, String, Long)](spark, 1)
    val q = in.toDF()
      .toDF("tag", "ts", "value", "ingestTs", "writerId", "seq")
      .withColumn("partition_start", col("ts") - (col("ts") % lit(5L)))
      .writeStream.format("graft-tsdb")
      .option("path", st.namespaceRoot)
      .option("tier", "hot")
      .option("partitionWidth", "5")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv2-ckpt").toString)
      .outputMode("append")
      .start()
    try {
      in.addData(("sa", 1L, "v1", 10L, "w", 1L), ("sa", 7L, "v7", 11L, "w", 2L))
      q.processAllAvailable()
      in.addData(("sb", 3L, "v3", 12L, "w", 3L))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(st.connectorDF("hot")) == Set(
      ("sa", 0L, 1L, "v1"), ("sa", 5L, 7L, "v7"), ("sb", 0L, 3L, "v3")))
    // per-epoch staging dirs cleaned up after publish
    val tmp = java.nio.file.Paths.get(st.namespaceRoot, "tmp")
    assert(!Files.exists(tmp) || !Files.list(tmp).iterator().hasNext)
  }

  test("all tier equals hot when cold is empty; LWW composes on top") {
    assert(rows(store.connectorDF("all")) == rows(store.connectorDF("hot")))
    // overwrite one point, flush, and read through lwwDedup over the connector
    store.write(Map("alpha" -> Map(7L -> "a7v2")))
    store.flushL0()
    val lww = store.lwwDedup(store.connectorDF("hot"))
      .where(col("tag") === "alpha" && col("ts") === 7L)
      .select("value").collect().map(_.getString(0)).toSeq
    assert(lww == Seq("a7v2"))
  }

  // ------------------------------------------ aggregate pushdown (footers)

  private def aggRows(df: DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("agg pushdown: per-tag count/min/max comes from parquet footers") {
    val agg = store.connectorDF("hot").groupBy("tag")
      .agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi"))
    val plan = scanDesc(agg)
    assert(plan.contains("PushedAggregates"), s"plan was:\n$plan")
    val want = aggRows(store.hotDF.groupBy("tag")
      .agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi")))
    assert(aggRows(agg) == want)
  }

  test("agg pushdown: global count(*) over the store is metadata-only") {
    val agg = store.connectorDF("hot").agg(count(lit(1)).as("n"))
    val plan = scanDesc(agg)
    assert(plan.contains("PushedAggregates"), s"plan was:\n$plan")
    assert(agg.collect().head.getLong(0) === store.hotDF.count())
  }

  test("agg pushdown: layout-key grouping stays pushed with tag pruning composed") {
    val agg = store.connectorDF("hot")
      .where(col("tag") === "alpha")
      .groupBy("tag", "partition_start")
      .agg(count(lit(1)).as("n"), max("ts").as("hi"))
    val plan = scanDesc(agg)
    assert(plan.contains("PushedAggregates"), s"plan was:\n$plan")
    // alpha's 4 window dirs survive the tag prune (total dir count varies
    // with suite order — the SQL-catalog INSERT adds a gamma dir)
    assert(plan.contains("dirs=4/"), s"plan was:\n$plan")
    val want = aggRows(store.hotDF.where(col("tag") === "alpha")
      .groupBy("tag", "partition_start")
      .agg(count(lit(1)).as("n"), max("ts").as("hi")))
    assert(aggRows(agg) == want)
  }

  // --------------------------------------- limit / top-N pushdown (dirs)

  test("topN pushdown: newest-first limit walks only the newest window dirs") {
    // ORDER BY partition_start DESC LIMIT 2 — the reference's readIndex
    // shape. Window 15 holds 2 rows (a18 + b16), so ONE window layer
    // covers the limit; ties on the boundary (both dirs share ps=15)
    // keep both dirs.
    val df = store.connectorDF("hot")
      .orderBy(col("partition_start").desc, col("tag"), col("ts"))
      .limit(2)
    val plan = scanDesc(df)
    // the whole dir-encoded prefix (ps DESC, tag ASC) pushes; `ts` stays
    // with Spark's final TakeOrdered
    assert(plan.contains("PushedTopN: [partition_start DESC, tag ASC]"),
      s"plan:\n$plan")
    val m = "dirs=(\\d+)/".r.findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(m.exists(_ <= 2), s"expected <=2 surviving dirs, plan:\n$plan")
    val want = store.hotDF.select(Cols.map(col): _*)
      .orderBy(col("partition_start").desc, col("tag"), col("ts"))
      .limit(2).collect().map(_.toSeq).toSeq
    assert(df.select(Cols.map(col): _*).collect().map(_.toSeq).toSeq == want)
  }

  test("bare LIMIT pushdown keeps just enough directories") {
    val df = store.connectorDF("hot").limit(3)
    val plan = scanDesc(df)
    assert(plan.contains("PushedTopN: [] limit=3"), s"plan:\n$plan")
    // any 3 rows are a valid LIMIT result; row-count is the contract
    assert(df.count() === 3L)
  }

  test("topN pushdown refused when the leading sort key is row-level") {
    val df = store.connectorDF("hot")
      .orderBy(col("ts").desc).limit(2)
    val plan = scanDesc(df)
    assert(!plan.contains("PushedTopN"), s"plan:\n$plan")
    val want = store.hotDF.select(Cols.map(col): _*)
      .orderBy(col("ts").desc).limit(2)
      .collect().map(_.toSeq).toSeq
    assert(df.select(Cols.map(col): _*).collect().map(_.toSeq).toSeq == want)
  }

  // ------------------------------------------------ custom SQL metrics

  private def scanMetrics(df: DataFrame): Map[String, Long] = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // descend through AQE query stages — a materialized stage is a leaf
    // of the final plan whose own subtree holds the scan
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScans(s.plan)
      }.flatten
    val bs = findScans(finalPlan).head
    bs.metrics.map { case (k, m) => k -> m.value }
  }

  test("custom metrics: row scans report files opened and pruning counts") {
    val m = scanMetrics(store.connectorDF("hot").where(col("tag") === "beta"))
    assert(m.get("filesOpened").exists(_ > 0L), m.toString)
    assert(m.get("dirsKept").exists(_ > 0L), m.toString)
    assert(m.get("dirsTotal").exists(t => m("dirsKept") < t), m.toString)
    // a row scan answers nothing from footers
    assert(m.get("rowsFromFooters").contains(0L), m.toString)
  }

  test("custom metrics: the footer-agg path reports metadata-answered rows") {
    graft.tsdb.FooterCache.clear()
    // fresh DataFrame per measurement: a reused one would replay its
    // already-materialized AQE stages and report the first run's metrics
    def agg = store.connectorDF("hot").groupBy("tag")
      .agg(count(lit(1)).as("n"))
    val cold = scanMetrics(agg)
    assert(cold.get("rowsFromFooters").exists(_ > 0L), cold.toString)
    // cache cold → every footer is a physical open
    assert(cold.get("filesOpened").exists(_ > 0L), cold.toString)
    // cache warm → same metadata answers, ZERO file opens (the immutable
    // layout makes footer facts reusable across queries)
    val warm = scanMetrics(agg)
    assert(warm.get("rowsFromFooters") === cold.get("rowsFromFooters"), warm.toString)
    assert(warm.get("filesOpened").contains(0L), warm.toString)
  }

  test("agg pushdown refused for string min/max and for residual row filters") {
    // min over a string column: parquet binary stats may truncate — the
    // source refuses, Spark reads rows, result still correct
    val strAgg = store.connectorDF("hot").groupBy("tag")
      .agg(min("value").as("v"))
    val p1 = scanDesc(strAgg)
    assert(!p1.contains("PushedAggregates"), s"plan was:\n$p1")
    assert(aggRows(strAgg) ==
      aggRows(store.hotDF.groupBy("tag").agg(min("value").as("v"))))
    // a ts bound stays a residual row filter, so the Aggregate is never
    // offered to the source — counts must come from the surviving rows
    val fAgg = store.connectorDF("hot").where(col("ts") >= 7L)
      .groupBy("tag").agg(count(lit(1)).as("n"))
    val p2 = scanDesc(fAgg)
    assert(!p2.contains("PushedAggregates"), s"plan was:\n$p2")
    assert(aggRows(fAgg) == aggRows(store.hotDF.where(col("ts") >= 7L)
      .groupBy("tag").agg(count(lit(1)).as("n"))))
  }
}
