package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.VectorFunctions._

/** Round-8 parity contracts: the new codegen'd projection expressions
  * (QuantizeVector / LshBucket / NearestCentroid) must be BIT-IDENTICAL
  * to the declarative forms they replaced — those forms are what the
  * DuckDB oracles still compute, so any divergence here is a future
  * hash-mismatch in the driver's correctness gate.
  */
class Round8Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round8-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)

  test("QuantizeVector matches the HOF transform quantization on every vector") {
    val diff = emb.select(quantizeF(col("embedding")).as("a"),
        quantize(col("embedding")).as("b"))
      .where(!(col("a") <=> col("b"))).count()
    assert(diff === 0L)
  }

  test("LshBucket matches the exploded declarative bucketing, all nPlanes used") {
    // (nPlanes, planeOffset) — offsets exercise the per-band disjoint
    // plane ranges of the round-8 banded blocking
    for ((nPlanes, off) <- Seq((4, 0), (8, 0), (8, 16), (12, 48))) {
      val sums = (0 until nPlanes).map { b =>
        val m = (13L * (off + b + 1)) % 97L
        sum(col("x") * when((col("pos") + 1) * m % 97 < 49, 1L).otherwise(-1L))
          .as(s"s$b")
      }
      val bucketExpr = (0 until nPlanes).map { b =>
        when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L)
      }.reduce(_ + _)
      val declarative = emb
        .select(col("vec_id"), posexplode(quantize(col("embedding"))).as(Seq("pos", "x")))
        .groupBy("vec_id")
        .agg(sums.head, sums.tail: _*)
        .select(col("vec_id"), bucketExpr.as("b_old"))
      val native = emb.select(col("vec_id"),
        lshBucketF(col("embedding"), nPlanes, off).as("b_new"))
      val diff = native.join(declarative, "vec_id")
        .where(col("b_new") =!= col("b_old")).count()
      assert(diff === 0L, s"nPlanes=$nPlanes offset=$off")
    }
  }

  test("QuantVecStats matches the HOF aggregate twin on every vector") {
    val stats = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.QuantVecStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding"))))
    val q = quantize(col("embedding"))
    val diff = emb.select(
        stats.getField("n_zero").as("z_new"),
        stats.getField("max_abs_q").as("m_new"),
        aggregate(q, lit(0L),
          (acc, x) => acc + when(x === 0L, 1L).otherwise(0L)).as("z_old"),
        aggregate(q, lit(0L), (acc, x) => greatest(acc, abs(x))).as("m_old"))
      .where(col("z_new") =!= col("z_old") || col("m_new") =!= col("m_old"))
      .count()
    assert(diff === 0L)
  }

  test("LshBucket planes are pairwise distinct and non-constant over the data") {
    // the retired mod-5 family had duplicate planes (0/5, 1/6, 2/7) and a
    // constant plane (3) — this pins the round-8 family against both
    val dim = 64
    val planeBits = (0 until 64).map { g =>
      val m = (13L * (g + 1)) % 97L
      (1 to dim).map(i => i * m % 97 < 49)
    }
    assert(planeBits.distinct.size === 64, "duplicate hyperplanes in the family")
    planeBits.zipWithIndex.foreach { case (bits, g) =>
      val pos = bits.count(identity)
      assert(pos >= dim / 4 && pos <= 3 * dim / 4,
        s"plane $g unbalanced: $pos of $dim positive")
    }
  }

  test("NearestCentroid matches the crossJoin+max(struct) argmax, tie-break included") {
    val all = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", dotLL(col("qv"), col("qv")))
    // fixed-k centroid set, same md5 seed order the engine uses
    val centDf = all.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .select(col("vec_id").as("c_id"), col("qv").as("cv"), col("nrm").as("cnrm"))
    import spark.implicits._
    val cents = centDf.as[(Long, Array[Long], Long)].collect()

    val viaJoin = all.crossJoin(broadcast(centDf))
      .select(col("vec_id"), struct(
          cosineQ(dotLL(col("qv"), col("cv")), col("nrm"), col("cnrm")).as("c_cos"),
          (-col("c_id")).as("negc"), col("c_id").as("c_id")).as("sc"))
      .groupBy("vec_id")
      .agg(max(col("sc")).as("m"))
      .select(col("vec_id"), col("m.c_id").as("b_old"))
    val viaExpr = all.select(col("vec_id"),
      nearestCentroid(col("qv"), col("nrm"), cents).as("b_new"))
    val diff = viaExpr.join(viaJoin, "vec_id")
      .where(col("b_new") =!= col("b_old")).count()
    assert(diff === 0L)

    // and the assignment is non-degenerate: more than one bucket in use
    assert(viaExpr.select(countDistinct(col("b_new"))).head().getLong(0) > 1L)
  }

  test("NearestCentroid exercises the exact-tie path deterministically") {
    // duplicate centroid vectors under two ids → identical cosines; the
    // winner must be the SMALLER c_id (the struct-max negc contract)
    import spark.implicits._
    val v = Array(10000L, 20000L)
    val nrm = v.map(x => x * x).sum
    val cents: Array[(Long, Array[Long], Long)] =
      Array((7L, v, nrm), (3L, v, nrm), (9L, Array(-10000L, -20000L), nrm))
    val df = Seq((1L, v.toSeq, nrm)).toDF("vec_id", "qv", "nrm")
      .select(col("vec_id"), col("qv").cast("array<long>").as("qv"), col("nrm"))
    val got = df.select(nearestCentroid(col("qv"), col("nrm"), cents).as("b"))
      .head().getLong(0)
    assert(got === 3L)
  }

  test("compactionPlan groups respect time order, byte accounting, and target") {
    import spark.implicits._
    // two partitions: p1 has 5 × 40-byte files (plan: groups of ≤100 B →
    // boundaries at cum_before 0/40/80 | 120/160), p2 one lone file
    val files = Seq(
      ("p1", 1L, 40L, 100L, 199L), ("p1", 2L, 40L, 200L, 299L),
      ("p1", 3L, 40L, 300L, 399L), ("p1", 4L, 40L, 400L, 499L),
      ("p1", 5L, 40L, 500L, 599L), ("p2", 6L, 40L, 100L, 150L))
      .toDF("part_key", "file_id", "bytes", "min_ts", "max_ts")
    val plan = graft.analytics.Layout.compactionPlan(files, targetBytes = 100L)
      .orderBy("part_key", "grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(plan.toSeq === Seq(
      ("p1", 0L, 3L, 120L, 100L, 399L, true),
      ("p1", 1L, 2L, 80L, 400L, 599L, true),
      ("p2", 0L, 1L, 40L, 100L, 150L, false)))
  }

  test("compactionPlan runs over a REAL TimeSeriesStore file listing") {
    // the API contract: the planner consumes exactly what a store
    // maintenance job can list — per-file stats, no data read
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files => JFiles}
    val root = JFiles.createTempDirectory("graft-compaction-plan")
    try {
      val st = new graft.tsdb.TimeSeriesStore(spark, root.toString,
        graft.tsdb.StoreSettings(partitionWidth = 50L))
      st.initialize()
      // 4 separate writes over the same partitions → multi-file dirs
      (0 until 4).foreach { b =>
        st.write(Map("tagA" -> (0 until 100)
          .map(i => (b * 100 + i).toLong -> s"v$b-$i").toMap))
      }
      st.flushL0()
      val stats = JFiles.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          p.toString.contains("partition_start="))
        .map { p =>
          (p.getParent.getFileName.toString,
            p.getFileName.toString.hashCode.toLong, JFiles.size(p), 0L, 0L)
        }.toSeq
      assert(stats.nonEmpty, "store produced no partitioned files")
      val plan = graft.analytics.Layout.compactionPlan(
        stats.toDF("part_key", "file_id", "bytes", "min_ts", "max_ts"),
        targetBytes = 1L << 20)
      assert(plan.count() > 0)
    } finally {
      val del = JFiles.walk(root).sorted(java.util.Comparator.reverseOrder())
      del.iterator().asScala.foreach(p => JFiles.deleteIfExists(p))
    }
  }

  test("lay_compaction_plan is non-degenerate: real merges and >1 group somewhere") {
    val plan = SparkEntry.queries("lay_compaction_plan")(spark, "/root/testdata/sf0.01")
    assert(plan.where(col("is_merge")).count() > 0L, "no multi-file merge groups")
  }

  test("sim_incremental_ivf: batch fully assigned, buckets non-degenerate") {
    val df = SparkEntry.queries("sim_incremental_ivf")(spark, sf)
    val rows = df.collect()
    val totalNew = rows.map(_.getLong(2)).sum
    val batchCount = Tables.embeddings(spark, sf)
      .where(col("vec_id") % 10 === 0).count()
    assert(totalNew === batchCount, "some batch vectors were not assigned")
    assert(rows.length >= 8, s"index collapsed to ${rows.length} buckets")
    assert(rows.exists(_.getLong(2) > 0L), "no bucket received new vectors")
  }

  test("incremental components ≡ full recompute, with a real delta") {
    import graft.analytics.{Dedup, Graph}
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, sf), 0.5)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val isNew = (c: org.apache.spark.sql.Column) => pmod(c, lit(10L)) === 0
    val nDelta = pairs.where(isNew(col("u")) || isNew(col("v"))).count()
    assert(nDelta > 0L, "no delta edges — the merge path is untested on this draw")
    val full = Graph.starComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = Graph.incrementalComponents(pairs, newMod = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full, "incremental merge diverged from the full recompute")
  }

  test("persisted band index probes with NO exchange on the index side") {
    // grounds dd_incremental_lsh's scale claim: a production deployment
    // PERSISTS the (doc_id, band, band_sig) index bucketed on the probe
    // key, so a daily batch joins against it without ever shuffling the
    // index — only the (small) batch side pays an exchange
    import graft.analytics.Dedup
    val docs = Tables.documents(spark, sf)
    val index = Dedup.bandSignatures(
      Dedup.minhashSignatures(docs.where(col("doc_id") % 10 =!= 0), 12), 12, 4)
    index.write.mode("overwrite")
      .option("path", "/tmp/graft-band-index-spec")
      .bucketBy(8, "band", "band_sig").sortBy("band", "band_sig")
      .saveAsTable("graft_band_index_spec")
    try {
      val persisted = spark.table("graft_band_index_spec")
        .withColumnRenamed("doc_id", "dup_of")
      val probe = Dedup.bandSignatures(
        Dedup.minhashSignatures(docs.where(col("doc_id") % 10 === 0), 12), 12, 4)
      val joined = persisted.hint("merge").join(probe, Seq("band", "band_sig"))
      assert(joined.count() > 0L, "probe found no colliding buckets")
      val p = joined.queryExecution.executedPlan.toString
      // the INDEX branch is the slice between the merge join and its
      // bucketed scan (printed first as the left child): it must hold no
      // Exchange — the probe side pays the only shuffles (its signature
      // aggregate + the join alignment)
      val from = p.indexOf("SortMergeJoin")
      val to = p.indexOf("graft_band_index_spec", from)
      assert(from >= 0 && to > from, s"unexpected plan shape:\n$p")
      val indexBranch = p.substring(from, to)
      assert(!indexBranch.contains("Exchange"),
        s"index side shuffled:\n$p")
      assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS graft_band_index_spec")
  }

  test("sim_ann_rerank returns full top-5 per query with sane cosines") {
    val df = SparkEntry.queries("sim_ann_rerank")(spark, sf)
    val r = df.agg(count(lit(1)), min(col("cos")), max(col("cos"))).head()
    assert(r.getLong(0) > 0L)
    assert(r.getDouble(2) <= 1.0 + 1e-9 && r.getDouble(1) >= -1.0 - 1e-9)
  }
}
