package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** Round-9 contracts: compaction EXECUTION (the plan→execute loop —
  * file counts drop per the plan's merge groups, reads are invariant,
  * superseded members physically disappear), and the staged-input
  * equivalences behind the de-staged bench rows (incrementalMerge with a
  * staged label table ≡ the self-contained operator).
  */
class Round9Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round9-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(root)) Seq.empty
    else Files.walk(root).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq
  }

  test("compact executes the plan: files drop to one per partition, reads invariant, superseded members gone") {
    val root = Files.createTempDirectory("graft-r9-compact").toString
    val st = new TimeSeriesStore(spark, root, StoreSettings(partitionWidth = 1000L))
    st.initialize()
    // 3 partitions × 2 write batches; batch 2 supersedes ts%2==0 members
    val base = 1700000000000L
    def samples(v: String, ingestTs: Long, onlyEven: Boolean) =
      Map("T" -> (0 until 30).filter(i => !onlyEven || i % 2 == 0)
        .map(i => (base + i * 100L) -> s"$v$i").toMap)
    st.write(samples("a", 1L, onlyEven = false)); st.flushL0()
    st.write(samples("b", 2L, onlyEven = true)); st.flushL0()

    val hotRoot = java.nio.file.Paths
      .get(st.rootDir, st.settings.settingsHash, "hot")
    val filesBefore = parquetFiles(hotRoot).size
    assert(filesBefore >= 6, s"expected >=2 files per partition, got $filesBefore")
    val preRead = st.readData(Map("T" -> (base, base + 3000L)))

    // the dry-run plan over the REAL per-file stats must call every
    // partition a merge (>=2 files each) before the rewrite runs
    val stats = spark.read.parquet(
        parquetFiles(hotRoot).map(_.toString): _*)
      .withColumn("part_key", expr("ts div 1000"))
      .withColumn("file_id", input_file_name())
      .groupBy("part_key", "file_id")
      .agg(count(lit(1)).as("rows"), (count(lit(1)) * 64).as("bytes"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    val plan = graft.analytics.Layout
      .compactionPlan(stats.drop("rows"), targetBytes = Long.MaxValue / 2)
      .collect()
    assert(plan.nonEmpty && plan.forall(_.getAs[Boolean]("is_merge")),
      "every partition should plan as a merge group pre-compact")

    val nCompacted = st.compact(minFiles = 2, applyLww = true)
    assert(nCompacted === 3)

    // EXECUTED: one file per partition — the planned merge groups became
    // physical rewrites
    val byDir = parquetFiles(hotRoot).groupBy(_.getParent)
    assert(byDir.nonEmpty && byDir.values.forall(_.size == 1),
      s"expected exactly 1 file per partition dir, got ${byDir.view.mapValues(_.size).toMap}")

    // superseded members physically gone: raw row count = distinct ts
    val raw = st.hotDF.count()
    assert(raw === 30L, s"expected 30 LWW winners in raw storage, got $raw")

    // reads invariant (read-side LWW is idempotent over the merged file)
    val postRead = st.readData(Map("T" -> (base, base + 3000L)))
    assert(postRead === preRead)
    // and the winners are batch-b values on even offsets
    assert(postRead("T")(base) === "b0" && postRead("T")(base + 100L) === "a1")

    // a second plan over the compacted layout finds nothing to merge
    val stats2 = spark.read.parquet(parquetFiles(hotRoot).map(_.toString): _*)
      .withColumn("part_key", expr("ts div 1000"))
      .withColumn("file_id", input_file_name())
      .groupBy("part_key", "file_id")
      .agg((count(lit(1)) * 64).as("bytes"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    val plan2 = graft.analytics.Layout
      .compactionPlan(stats2, targetBytes = Long.MaxValue / 2).collect()
    assert(plan2.forall(!_.getAs[Boolean]("is_merge")),
      "post-compact plan must be all no-op single-file groups")
  }

  test("incrementalMerge over staged history labels is bit-identical to the self-contained operator") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 20L), (5L, 7L),
      (20L, 21L), (30L, 31L), (31L, 32L), (40L, 50L))
      .toDF("u", "v")
    val lh = graft.analytics.Graph.historyLabels(pairs, newMod = 10)
    // parquet roundtrip = the Staging.parquetMemo path
    val dir = Files.createTempDirectory("graft-r9-lh").toString
    lh.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)
    val a = graft.analytics.Graph.incrementalMerge(pairs, staged, newMod = 10)
      .orderBy("doc_id").collect().toSeq
    val b = graft.analytics.Graph.incrementalComponents(pairs, newMod = 10)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("bpeTrain's distributed fold matches a reference BPE trainer on adversarial runs") {
    import spark.implicits._
    // overlapping-run words (aaaa, ababab) are exactly where a naive
    // merge (string replace / regex) diverges from greedy left-to-right
    val docs = Seq((1L, "aaaa ab abab ababab ba aaa aa"),
        (2L, "aaaa abab cc ccc cccc aaaa"),
        (3L, "ab ba ab aaaa bb"))
      .toDF("doc_id", "text")
    val got = graft.analytics.TextAnalysis.bpeTrain(docs, rounds = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))

    // reference trainer (driver-side, greedy left-to-right), vocab
    // derived from the same doc strings
    var vocab: Map[String, (Long, Vector[String])] =
      Seq("aaaa ab abab ababab ba aaa aa", "aaaa abab cc ccc cccc aaaa",
        "ab ba ab aaaa bb")
        .flatMap(_.split(" ")).filter(_.length >= 2)
        .groupBy(identity)
        .map { case (w, ws) =>
          w -> (ws.size.toLong, w.map(_.toString).toVector)
        }
    val want = (1 to 4).map { r =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (f, toks) =>
        toks.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); pairs(k) = pairs.getOrElse(k, 0L) + f
        }
      }
      val ((a, b), cnt) = pairs.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      vocab = vocab.map { case (w, (f, toks)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        toks.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b) out(out.size - 1) = a + b
          else out += x
        }
        w -> (f, out.toVector)
      }
      (r.toLong, a, b, cnt)
    }
    assert(got.toSeq === want)
  }

  test("NN-Descent recall vs brute force improves monotonically over rounds") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val exactAll = graft.analytics.Similarity
      .bruteForceTopK(emb, k = 5, queryModulo = 1)
      .select(col("query_id").as("node"), col("neighbor_id"))
      .cache()
    def recallAt(rounds: Int): Double = {
      val g = graft.analytics.Similarity
        .nnDescent(emb, k = 5, rounds = rounds, nPlanes = 8)
        .select(col("node"), col("neighbor_id")).cache()
      val nodes = g.select("node").distinct()
      val exact = exactAll.join(nodes, "node")
      val hit = exact.join(g, Seq("node", "neighbor_id"), "left_semi").count()
      val r = hit.toDouble / exact.count()
      g.unpersist()
      r
    }
    val r0 = recallAt(0)
    val r1 = recallAt(1)
    val r2 = recallAt(2)
    exactAll.unpersist()
    assert(r1 >= r0 && r2 >= r1,
      s"descent must not lose recall: $r0 -> $r1 -> $r2")
    assert(r2 > r0, s"two rounds must beat the LSH seed: $r0 -> $r2")
    assert(r2 > 0.8, s"round-2 recall implausibly low: $r2")
  }

  test("CDC chunking re-synchronizes after an insertion where fixed frames lose every downstream chunk") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "INS " + base)).toDF("doc_id", "text")
    // content-defined boundaries re-sync right after the insertion: the
    // overwhelming majority of both docs' chunks pair up
    val cdc = graft.analytics.Dedup.cdcChunks(docs, modulus = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dup_fraction")).toMap
    assert(cdc(1L) > 0.6 && cdc(2L) > 0.6,
      s"CDC should dedup almost everything after re-sync: $cdc")
    // fixed 10-word frames shift by one word for the WHOLE document: no
    // chunk of doc 2 matches doc 1 — dedup recovers nothing downstream
    val fixed = graft.analytics.Dedup.passageDedup(docs, chunkWords = 10)
      .where(col("doc_id") === 2L).collect().head
    assert(fixed.getAs[Long]("n_kept") === fixed.getAs[Long]("n_chunks"),
      "fixed frames should find zero cross-doc duplicates after the shift")
  }

  test("ivfAddAndProbe is idempotent: re-running the add leaves the probe answer unchanged") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("graft-r9-ivfadd").toString
    graft.analytics.Similarity.persistIvfIndex(
      emb.where(pmod(col("vec_id"), lit(10L)) =!= 0), root,
      numCentroids = 16, iters = 0)
    def run() = graft.analytics.Similarity
      .ivfAddAndProbe(emb, root, batchModulo = 10, k = 5, queryModulo = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val first = run()
    val second = run() // the delta overwrite must not duplicate members
    assert(first === second)
    assert(first.nonEmpty)
    // and the added batch is actually probed: some new vector (id%10==0)
    // appears as a neighbor
    assert(first.exists(_.getLong(2) % 10 == 0),
      "no batch vector surfaced in any probe result")
  }

  test("compactionPlan is deterministic under duplicate (part_key, file_id) stats rows") {
    import spark.implicits._
    // two full-duplicate identities (the documented contract violation):
    // the added (bytes, max_ts) tiebreaks make packing deterministic
    val dup = Seq((1L, 1L, 100L, 10L, 19L), (1L, 1L, 100L, 10L, 19L),
      (1L, 2L, 50L, 20L, 29L))
      .toDF("part_key", "file_id", "bytes", "min_ts", "max_ts")
    val runs = (1 to 3).map(_ =>
      graft.analytics.Layout.compactionPlan(dup, targetBytes = 150L)
        .orderBy("part_key", "grp").collect().toSeq)
    assert(runs.distinct.size === 1)
  }

  test("kCore peels a pendant chain but keeps the triangle at k=2") {
    import spark.implicits._
    // triangle 1-2-3 (a 2-core) with a chain 3-4-5-6 hanging off it
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = graft.analytics.Graph.kCore(pairs, k = 2, rounds = 4)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    // chain peels one layer per round (6, then 5, then 4); the triangle
    // survives with residual degree 2 everywhere
    assert(got.toSeq === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("bfsHops reports min-hop distances and stops at maxHops") {
    import spark.implicits._
    // path 0-1-2-3-4-5-6 with seed 0: node 5 is 5 hops away (> maxHops=4)
    val pairs = (0L to 5L).map(i => (i, i + 1)).toDF("u", "v")
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v"), col("u")))
    val got = graft.analytics.Graph.bfsHops(edges,
        col("node") === 0L, maxHops = 4)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("linkPrediction scores non-adjacent 2-hop pairs and excludes edges") {
    import spark.implicits._
    // square 1-2-3-4-1: the two diagonals (1,3) and (2,4) each share two
    // common neighbors and are not edges; every adjacent pair is excluded
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got = graft.analytics.Graph.linkPrediction(pairs, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5)))
    assert(got.length === 2)
    // cn=2, deg 2+2, jaccard = 2/(2+2-2) = 1.0
    assert(got.toSet === Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("MMR's second pick skips the near-duplicate of the first") {
    import spark.implicits._
    // query 0; candidates: 1 and 2 are near-duplicates of each other
    // (both highly relevant), 3 is slightly less relevant but diverse.
    // Greedy-by-relevance would return (1, 2); MMR must return (1, 3).
    val rows = Seq(
      (0L, "q", Array(1.0f, 0.0f, 0.0f)),
      (1L, "a", Array(0.81f, 0.59f, 0.0f)),
      (2L, "a2", Array(0.80f, 0.60f, 0.0f)),
      (3L, "b", Array(0.80f, 0.0f, 0.60f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.analytics.Similarity
      .mmrSelect(rows, k = 3, shortlist = 20, queryModulo = 50)
      .orderBy("sel_rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(got(0)._2 === 1L, s"rank 1 must be the most relevant: ${got.toSeq}")
    assert(got(1)._2 === 3L,
      s"rank 2 must skip the near-duplicate of pick 1: ${got.toSeq}")
    assert(got(2)._2 === 2L)
  }

  test("mergeDelta is associative: threading batches equals the single-shot merge") {
    import spark.implicits._
    // yesterday: components {1,2} and {5,6}; today's edges chain
    // EVERYTHING together through brand-new nodes 10, 20, 30 — and the
    // chain is split so batch 1 alone cannot see the final component
    val lh = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val delta = Seq((2L, 10L), (20L, 5L), (10L, 20L), (6L, 30L))
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val singleShot = labels(graft.analytics.Graph.mergeDelta(
      delta.toDF("u", "v"), lh))
    val state1 = graft.analytics.Graph.mergeDelta(
      delta.take(2).toDF("u", "v"), lh).localCheckpoint(true)
    val threaded = labels(graft.analytics.Graph.mergeDelta(
      delta.drop(2).toDF("u", "v"), state1))
    assert(threaded === singleShot)
    // and the merged component is labeled by its global minimum
    assert(singleShot === Set(1L, 2L, 5L, 6L, 10L, 20L, 30L).map(_ -> 1L))
  }

  test("entityResolution: exact names resolve to themselves; a dropped digit reports its full ambiguity set") {
    val got = graft.analytics.Dedup
      .entityResolution(Tables.customer(spark, sf), maxLev = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (dirtyId, matchedId, lev, nCands) =>
      dirtyId % 3 match {
        case 2 => // untouched name: lev-0 self-match beats the block's
          // nine lev-1 single-substitution candidates
          assert(matchedId === dirtyId && lev === 0L,
            s"exact row mis-resolved: ($dirtyId, $matchedId, $lev, $nCands)")
        case 1 => // dropped last digit: matches all ten registry rows of
          // its 8-digit block (honest ambiguity, reported not hidden)
          assert(lev === 1L && nCands >= 10L,
            s"dropped-digit row: ($dirtyId, $matchedId, $lev, $nCands)")
        case _ => // substituted last char: ten single-substitution cands
          assert(lev === 1L && nCands >= 10L && matchedId / 10 === dirtyId / 10,
            s"substituted row: ($dirtyId, $matchedId, $lev, $nCands)")
      }
    }
  }

  test("detrendedProfile cancels a linear trend exactly") {
    import spark.implicits._
    // value = 5 + 0.07·i on a strictly ramping series: every interior
    // window's 25·x − Σ is identically zero, so the seasonal profile is
    // exactly flat at 0.0 — level drift never leaks into daily shape
    val events = (0 until 200).map { i =>
      ("ramp", i * 600000L, i.toLong, 5.0 + 0.07 * i)
    }.toDF("event_type", "ts_ms", "event_id", "value")
    val got = graft.analytics.Seasonal.detrendedProfile(events).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("sum_d25") === 0L,
        s"linear trend must cancel exactly: ${r.mkString(",")}")
      assert(r.getAs[Double]("seasonal") === 0.0)
    }
  }

  test("skippingAudit prices a time-clustered layout vs a straddling file") {
    import spark.implicits._
    // four files each inside one quarter of [0, 400) + one file
    // straddling the whole span: every probe hits its quarter file + the
    // straddler (2 of 5 files)
    val files = (0 to 3).map(i =>
      (i.toLong, i.toLong, 100L, i * 100L, i * 100L + 99L)) :+
      (9L, 9L, 400L, 0L, 399L)
    val df = files.toDF("part_key", "file_id", "bytes", "min_ts", "max_ts")
    val got = graft.analytics.Layout.skippingAudit(df, nProbes = 4)
      .orderBy("probe").collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getAs[Long]("total_files") === 5L)
      assert(r.getAs[Long]("files_hit") === 2L,
        s"probe ${r.getAs[Long]("probe")}: ${r.mkString(",")}")
      assert(r.getAs[Double]("hit_fraction") === 0.4)
    }
  }
}
