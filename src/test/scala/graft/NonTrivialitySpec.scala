package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Non-degeneracy guards for threshold-tuned operators.
  *
  * The oracle gate proves Spark ≡ DuckDB, but an empty result matches an
  * empty oracle — so a testdata re-draw that pushes a tuned threshold
  * past the data's distribution (no near-dups above 0.5, no outliers
  * past 3σ, a quality gate passing everything) would stay green while
  * the operator demonstrates nothing. These assertions pin "the output
  * is non-trivial on the current data" so the NEXT regeneration that
  * moves a distribution fails here, loudly, with the operator named —
  * the same job LoaderSpec does for schemas.
  */
class NonTrivialitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-nontrivial-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfMid = "/root/testdata/sf0.01"

  private def rows(name: String, dir: String): Long =
    SparkEntry.queries(name)(spark, dir).count()

  /** (query, sfDir) pairs that must produce at least one row — each is a
    * candidate-generating or filtering operator whose empty output would
    * be a silent no-op.
    */
  private val nonEmpty = Seq(
    "dd_minhash_lsh" -> sfSmall,      // banded candidates above 0.5
    "dd_ngram_jaccard" -> sfSmall,    // exact pairs above 0.5
    "dd_simhash" -> sfSmall,          // hamming-band near-dups
    "dd_containment" -> sfSmall,      // short-inside-long pairs
    "dd_embedding_neardup" -> sfSmall, // cosine pairs above 0.3
    "dd_semdedup" -> sfSmall,         // within-cluster cosine pairs
    "sim_range_search" -> sfSmall,    // pairs above 0.4
    "cu_decontaminate" -> sfSmall,    // n-gram eval hits
    "ts_anomaly" -> sfMid,            // 3-sigma outliers exist
    "ts_outlier_mad" -> sfMid,        // 3-MAD outliers exist
    "mm_phash" -> sfSmall,            // perceptual near-dups
    "dd_dup_clusters" -> sfSmall,     // connected components exist
    "dd_incremental_lsh" -> sfSmall,  // new-batch docs that duplicate history
    "gr_triangles" -> sfSmall,        // the 0.15-floor candidate graph has triangles
    "st_watermark_deploy" -> sfSmall) // windows survive the replay

  nonEmpty.foreach { case (name, dir) =>
    test(s"$name produces a non-empty result on ${dir.split('/').last}") {
      assert(rows(name, dir) > 0L, s"$name went trivial — re-tune its threshold")
    }
  }

  test("ts_change_feed exercises all four change kinds, with update images paired") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("ts_change_feed")(spark, sfMid)
    val byKind = df.groupBy("change_type").agg(sum("n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("insert", "delete", "update_preimage", "update_postimage").foreach { k =>
      assert(byKind.getOrElse(k, 0L) > 0L,
        s"the staged mutation history produced no '$k' rows — the CDF row demonstrates nothing for that kind")
    }
    assert(byKind("update_preimage") === byKind("update_postimage"),
      "update images must pair exactly")
  }

  test("ts_time_travel snapshots are three genuinely different states") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("ts_time_travel")(spark, sfMid)
    val totals = df.groupBy("as_of").agg(sum("n").as("rows"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals.size === 3)
    // delete shrinks 1500 -> 2500; batch B has no new keys, so 3500's
    // LWW row count equals 2500's — distinguish it by content instead
    assert(totals(2500L) < totals(1500L),
      "the 2500 snapshot did not lose the deleted rows")
    val cents = df.groupBy("as_of").agg(sum("sum_cents").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cents(3500L) !== cents(2500L),
      "batch B's winners are invisible — the 3500 snapshot is a re-label")
  }

  // ---- ANN/bucketing family (round 8, VERDICT r7 #7): a testdata
  // re-draw that collapses a hash family or centroid seed would keep
  // every top-k oracle green while the probe path silently degrades to
  // a scan — occupancy floors make that draw fail here, loudly.

  // ---- real multimodal decode (round 12, VERDICT r11 #2): the mm rows
  // must be computing over pixels that came OUT of a real codec, not
  // payload-byte arithmetic wearing a codec's name.
  test("mm decode is a real codec on the real corpus: PNG magic, variance, losslessness") {
    import org.apache.spark.sql.functions._
    val media = graft.analytics.Multimodal.withEncodedImage(
      spark, Tables.documents(spark, sfSmall))
    // every media value is an actual PNG stream (the byte-payload stub
    // fails on row one), and no two equal-text docs are conflated away
    val n = media.count()
    val pngOk = media.where(
      expr("substring(media, 1, 8) = X'89504E470D0A1A0A'")).count()
    assert(n > 0L && pngOk === n, s"only $pngOk of $n media rows carry PNG magic")
    val feats = graft.analytics.Multimodal
      .decodeImageFeatures(spark, media).toDF().cache()
    try {
      val stats = feats.agg(
        countDistinct(col("px_checksum")), count(lit(1)),
        min(col("px_sum")), max(col("px_sum"))).head()
      // variance floor: >90% distinct checksums, and the pixel sums span
      // a real range (a constant-output stub collapses both)
      assert(stats.getLong(0) * 10 >= stats.getLong(1) * 9,
        s"decoded checksums collapsed: ${stats.getLong(0)} distinct of ${stats.getLong(1)}")
      assert(stats.getLong(3) > stats.getLong(2), "pixel sums are constant")
    } finally feats.unpersist()
    // the 4-leg codec loop (decode→resize→encode→decode) is lossless
    // corpus-wide, not just on the unit fixture
    val broken = graft.analytics.Multimodal.resizeEncoded(spark, media)
      .where(col("resized_digest") =!= col("roundtrip_digest")).count()
    assert(broken === 0L, s"$broken docs lost pixels in the PNG round-trip")
  }

  test("LSH and IVF bucketings are non-degenerate on current data") {
    val occ = SparkEntry.queries("sim_bucket_occupancy")(spark, sfSmall)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (lshB, lshMax, lshTot) = occ("lsh8")
    assert(lshB >= 16L, s"lsh8 collapsed to $lshB buckets")
    assert(lshMax * 5 <= lshTot, // no bucket >20% (measured ~9%)
      s"lsh8 mega-bucket: $lshMax of $lshTot vectors")
    val (ivfB, ivfMax, ivfTot) = occ("ivf64")
    assert(ivfB >= 32L, s"ivf64 collapsed to $ivfB buckets")
    assert(ivfMax * 10 <= ivfTot, // no bucket >10% (measured ~2.6%)
      s"ivf64 mega-bucket: $ivfMax of $ivfTot vectors")
  }

  test("k-means IVF buckets stay non-degenerate after Lloyd rounds") {
    import org.apache.spark.sql.functions._
    val assigned = graft.analytics.Similarity.kmeansAssign(
      Tables.embeddings(spark, sfSmall), numCentroids = 64, iters = 2)
    val r = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)), max(col("n")), sum(col("n"))).head()
    val (nB, maxN, tot) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nB >= 16L, s"kmeans64 collapsed to $nB buckets")
    assert(maxN * 4 <= tot, // no bucket >25% after refinement
      s"kmeans64 mega-bucket: $maxN of $tot vectors")
  }

  test("SQ8 per-dimension quantization ranges are non-degenerate") {
    import org.apache.spark.sql.functions._
    val all = graft.analytics.Similarity.prepQ(Tables.embeddings(spark, sfSmall))
    val r = all.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(sum(when(col("mx") > col("mn"), 1L).otherwise(0L)),
        count(lit(1))).head()
    val (live, dims) = (r.getLong(0), r.getLong(1))
    assert(live * 10 >= dims * 9, // >=90% of dims have a real range
      s"SQ8 degenerate: only $live of $dims dims have mx > mn")
  }

  test("PQ rerank recall dominates raw ADC recall (two-stage contract)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfSmall)
    val exact = graft.analytics.Similarity.bruteForceTopK(emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    val adcHits = hits(graft.analytics.Similarity.pqTopK(emb, k = 5))
    val rrHits = hits(graft.analytics.Similarity.pqRerankTopK(emb, k = 5,
      shortlist = 25))
    assert(rrHits >= adcHits,
      s"re-rank lost recall: $rrHits < $adcHits of ${exact.count()}")
    assert(rrHits > 0L, "re-rank recall went to zero")
  }

  test("layered serve: >= flat-walk recall with FEWER scored candidates (round 12)") {
    import org.apache.spark.sql.functions._
    // the HNSW layer hierarchy's whole justification (VERDICT r11 #8):
    // upper-layer entry routing must buy at least the flat walk's recall
    // while scoring strictly fewer candidates — measured 55 vs 50 hits at
    // 1499 vs 2023 scored here, 67 vs 62 at 6462 vs 8805 on the 10×
    // probe (PLANS.md round-12 table)
    val S = graft.analytics.Similarity
    S.graphTelemetry = true
    val emb = Tables.embeddings(spark, sfMid)
    val exact = S.bruteForceTopK(emb, k = 5, queryModulo = 20)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    val g20 = S.nnDescent(emb, k = 20, rounds = 3, nPlanes = 8, buildK = 20)
      .localCheckpoint(true)
    val q = emb.where(col("vec_id") % 20 === 0)
    val flatHits = hits(S.graphSearch(q, g20.where(col("rank") <= 5), emb,
      k = 5, beam = 8, hops = 3, nEntries = 4))
    val flatScored = S.lastScoredCount
    val layHits = hits(S.layeredGraphSearch(q, g20, emb, k = 5, beam = 8,
      hops = 2, degree = 5, upperBeam = 4, upperHops = 2, entryK = 2,
      nEntries = 4))
    val layScored = S.lastScoredCount
    assert(layHits >= flatHits,
      s"layer routing lost recall: $layHits < $flatHits of ${exact.count()}")
    assert(layScored < flatScored,
      s"layer routing scored MORE candidates: $layScored >= $flatScored")
    // round 13 (VERDICT r12 next #3): the 3-LEVEL hierarchy must beat the
    // 2-layer serve on BOTH axes — the guided mid-level descent affords a
    // narrower layer-0 beam (6 vs 8). Measured 60/1331 vs 55/1499 here,
    // 94/6312 vs 67/6462 at the 10× probe (PLANS.md round-13 table).
    val mlHits = hits(S.multilevelGraphSearch(q, g20, emb, levels = 3,
      k = 5, beam = 6, hops = 2, degree = 5, upperBeam = 4, topHops = 2,
      midHops = 2, entryK = 2, nEntries = 2))
    val mlScored = S.lastScoredCount
    assert(mlHits >= layHits,
      s"3-level descent lost recall vs 2-layer: $mlHits < $layHits")
    assert(mlScored < layScored,
      s"3-level descent scored MORE than 2-layer: $mlScored >= $layScored")
  }

  test("multilevel add: promoted inserts are reachable at every level they qualify for") {
    import org.apache.spark.sql.functions._
    // VERDICT r14 next #4: an inserted id whose md5 prefix qualifies for
    // level l must JOIN that level — both routable (it has out-edges: it
    // walked the frozen level graph for its neighbors) and REACHABLE
    // (some member's re-ranked list points at it), so the hierarchy
    // invariant survives adds without a periodic rebuild. With the
    // staged sf0.01 batch the qualifying ids are fixed (md5 is md5):
    // seven at level 1, id 410 at the top level.
    val S = graft.analytics.Similarity
    val emb = Tables.embeddings(spark, sfMid)
    val hist = emb.where(pmod(col("vec_id"), lit(10L)) =!= 0)
    val g20 = S.nnDescent(hist, k = 20, rounds = 3, nPlanes = 8, buildK = 20)
      .localCheckpoint(true)
    val root = java.nio.file.Files.createTempDirectory("nts-mlpromo").toString
    S.persistMultilevelIndex(g20, hist, root, levels = 3, degree = 5)
    val merged = S.multilevelAddedAdjacency(emb, root, batchModulo = 10,
      levels = 3)
    def levelOf(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      var l = 0
      while (l < 2 && (hex(l) == '0' || hex(l) == '1')) l += 1
      l
    }
    val batch = emb.where(pmod(col("vec_id"), lit(10L)) === 0)
      .select("vec_id").collect().map(_.getLong(0))
    (1 to 2).foreach { l =>
      val promoted = batch.filter(levelOf(_) >= l)
      assert(promoted.nonEmpty, s"staging lost its level-$l inserts")
      val adj = merged(l).localCheckpoint(true)
      val us = adj.select("u").distinct().collect().map(_.getLong(0)).toSet
      val nbs = adj.select("nb").distinct().collect().map(_.getLong(0)).toSet
      promoted.foreach { id =>
        assert(us.contains(id),
          s"promoted insert $id has no out-edges at level $l (cannot route)")
        assert(nbs.contains(id),
          s"promoted insert $id has no in-edges at level $l (unreachable)")
      }
    }
  }

  test("sim_graph_search recall dominates the IVF probe's on the same query set") {
    import org.apache.spark.sql.functions._
    // The serving contract that justifies building the graph index at
    // all (VERDICT r9 next #3): a bounded beam walk (4 entries × 3 hops
    // × beam 8) must recover MORE of the exact top-5 than the persisted
    // IVF probe does on the identical %20 query sample — else the extra
    // index structure buys nothing over coarse bucketing.
    val exact = graft.analytics.Similarity
      .bruteForceTopK(Tables.embeddings(spark, sfSmall), k = 5)
      .select(col("query_id"), col("neighbor_id"))
    def hits(name: String): Long =
      exact.join(SparkEntry.queries(name)(spark, sfSmall)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    val graphHits = hits("sim_graph_search")
    val ivfHits = hits("sim_ivf_persisted_probe")
    assert(graphHits >= ivfHits,
      s"graph walk lost to the IVF probe: $graphHits < $ivfHits hits")
    assert(graphHits > 0L, "graph-search recall went to zero")
  }

  test("sim_ivf_forget_probe: no tombstoned vector survives in the serving results") {
    import org.apache.spark.sql.functions._
    // The GDPR serving contract (ADVICE r10 medium): the forget set
    // (vec_id % 10 == 7) must be gone from the probe's ANSWERS, not just
    // the corpus — and the deletion must be non-trivial (it actually
    // removed members and actually changed at least one query's top-k,
    // else the lane demonstrates nothing on this data).
    val probe = SparkEntry.queries("sim_ivf_forget_probe")(spark, sfSmall)
      .cache()
    val leaked = probe.where(pmod(col("neighbor_id"), lit(10L)) === 7).count()
    assert(leaked == 0L, s"$leaked tombstoned vectors served post-delete")
    val audit = SparkEntry.queries("sim_ivf_forget_audit")(spark, sfSmall)
    val forgotten = audit.agg(sum(col("n_forgotten"))).head().getLong(0)
    assert(forgotten > 0L, "forget set was empty — the audit proves nothing")
    val plain = SparkEntry.queries("sim_ivf_persisted_probe")(spark, sfSmall)
    val changed = plain.join(probe, Seq("query_id", "rank", "neighbor_id"),
      "left_anti").count()
    assert(changed > 0L,
      "deletion is invisible in serving results — no forgotten vector was in any top-k")
    probe.unpersist()
  }

  test("PQ and graph forget probes: no tombstoned vector served, deletion visible") {
    import org.apache.spark.sql.functions._
    // the same GDPR serving contract across the other two index families
    // (the lifecycle matrix's forget row): tombstoned ids (vec_id%10==7)
    // are gone from the ANSWERS, and the deletion changed at least one
    // query's top-k vs the plain probe on the same index
    def check(forget: String, plain: String): Unit = {
      val probe = SparkEntry.queries(forget)(spark, sfSmall).cache()
      val leaked = probe.where(pmod(col("neighbor_id"), lit(10L)) === 7).count()
      assert(leaked == 0L, s"$forget served $leaked tombstoned vectors")
      // compare on the forget row's OWN query set (the PQ forget lane
      // runs the bounded 8-query budget; the plain probe runs the full
      // %20 batch — extra plain-only queries must not count as "changed")
      val changed = SparkEntry.queries(plain)(spark, sfSmall)
        .select("query_id", "rank", "neighbor_id")
        .join(probe.select("query_id").distinct(), Seq("query_id"))
        .join(probe.select("query_id", "rank", "neighbor_id"),
          Seq("query_id", "rank", "neighbor_id"), "left_anti").count()
      assert(changed > 0L, s"$forget is invisible vs $plain — nothing was deleted from any top-k")
      probe.unpersist()
    }
    check("sim_pq_forget_probe", "sim_pq_persisted_probe")
    check("sim_graph_forget_probe", "sim_graph_search")
  }

  test("sim_hybrid_search fuses two LIVE arms") {
    import org.apache.spark.sql.functions._
    // fusion is only demonstrated if both arms place results: rows the
    // vector arm alone found (no shared shingle) AND rows the lexical arm
    // placed (shingle overlap exists) must both appear — a data re-draw
    // that kills either arm silently degrades the row to a single-arm
    // ranker while its oracle stays green
    val df = SparkEntry.queries("sim_hybrid_search")(spark, sfMid).cache()
    val lexHits = df.where(col("lex_rank").isNotNull).count()
    val vecOnly = df.where(col("vec_rank").isNotNull &&
      col("lex_rank").isNull).count()
    assert(lexHits > 0L, "lexical arm placed nothing — shingle overlap gone")
    assert(vecOnly > 0L, "vector arm adds nothing beyond the lexical matches")
    df.unpersist()
  }

  test("sim_filtered_search: every served neighbor satisfies the filter; the recall trade is live") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("sim_filtered_search")(spark, sfMid).cache()
    assert(df.count() > 0L, "filtered probe returned nothing")
    // the filter contract: results only from allowed labels
    val emb = Tables.embeddings(spark, sfMid)
      .select(col("vec_id").as("neighbor_id"), col("label"))
    val leaked = df.join(emb, "neighbor_id")
      .where(!col("label").isin(2, 5, 8)).count()
    assert(leaked == 0L, s"$leaked results violate the label filter")
    // single-probe post-filtering must VISIBLY surface the recall trade
    // on this data: at least one query returns fewer than k rows
    val short = df.groupBy("query_id").count().where(col("count") < 5).count()
    assert(short > 0L,
      "every query returned a full top-k — the filtered-recall effect vanished")
    df.unpersist()
  }

  test("sim_embedding_drift: the drift flag SPLITS the buckets") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("sim_embedding_drift")(spark, sfMid)
    val r = df.agg(sum(when(col("drifted"), 1L).otherwise(0L)),
      count(lit(1))).head()
    val (flagged, total) = (r.getLong(0), r.getLong(1))
    assert(flagged > 0L, "threshold 0.3 below the data's epoch-mean cosines")
    assert(flagged < total, "threshold 0.3 above the data's epoch-mean cosines — all buckets drifted")
  }

  test("cu_embed_decontaminate flags SOME but not ALL train vectors") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("cu_embed_decontaminate")(spark, sfMid)
    val r = df.agg(sum(col("contaminated")), count(lit(1))).head()
    val (flagged, total) = (r.getLong(0), r.getLong(1))
    assert(flagged > 0L, "threshold 0.35 above the data's max-cos range")
    assert(flagged < total, "threshold 0.35 below the data's min max-cos")
  }

  test("cu_quality_classifier gate passes SOME but not ALL documents") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("cu_quality_classifier")(spark, sfMid)
    val r = df.agg(sum(when(col("passes"), 1L).otherwise(0L)),
      count(lit(1))).head()
    assert(r.getLong(0) > 0L && r.getLong(0) < r.getLong(1),
      s"classifier gate degenerate: ${r.getLong(0)}/${r.getLong(1)} at 700")
  }

  test("tx_gopher gate passes SOME but not ALL documents") {
    import org.apache.spark.sql.functions._
    val df = graft.analytics.TextAnalysis.gopherRules(
      Tables.documents(spark, sfSmall), minWords = 10)
    val r = df.agg(sum(col("passes")), count(lit(1))).head()
    assert(r.getLong(0) > 0L && r.getLong(0) < r.getLong(1),
      s"quality gate degenerate: ${r.getLong(0)}/${r.getLong(1)}")
  }

  test("ts_debounce actually drops burst events") {
    val total = Tables.events(spark, sfMid).count()
    import org.apache.spark.sql.functions._
    val kept = SparkEntry.queries("ts_debounce")(spark, sfMid)
      .agg(sum(col("n_kept"))).head().getLong(0)
    assert(kept > 0L && kept < total,
      s"debounce degenerate: kept $kept of $total")
  }

  test("gr_kcore keeps a non-empty 2-core that is smaller than the graph") {
    import org.apache.spark.sql.functions._
    val core = SparkEntry.queries("gr_kcore")(spark, sfSmall).cache()
    val nCore = core.count()
    val nNodes = graft.analytics.Dedup
      .embeddingNearDups(Tables.embeddings(spark, sfSmall), 0.15)
      .select(explode(array(col("vec_a"), col("vec_b"))).as("v"))
      .distinct().count()
    core.unpersist()
    // a data re-draw that makes the near-dup graph a forest (empty
    // 2-core) or a clique soup (everything survives) would silently
    // trivialize the peel — fail loudly here instead
    assert(nCore > 0L, "2-core empty: near-dup graph degenerated to a forest")
    assert(nCore < nNodes, s"2-core kept everything: $nCore of $nNodes")
  }

  test("MMR picks are distinct per query and rank 1 is the relevance argmax") {
    import org.apache.spark.sql.functions._
    val mmr = SparkEntry.queries("sim_mmr")(spark, sfSmall).cache()
    val perQuery = mmr.groupBy("query_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("cand_id")).as("nd"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach(r => assert(r.getLong(1) === 5L && r.getLong(2) === 5L,
      s"query ${r.get(0)}: ${r.getLong(1)} picks, ${r.getLong(2)} distinct"))
    val top1 = graft.analytics.Similarity
      .bruteForceTopK(Tables.embeddings(spark, sfSmall), k = 1,
        queryModulo = 50)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    mmr.where(col("sel_rank") === 1).collect().foreach { r =>
      assert(top1(r.getLong(0)) === r.getLong(2),
        s"rank-1 pick for query ${r.getLong(0)} is not the relevance argmax")
    }
    mmr.unpersist()
  }

  test("sim_centroid_outliers flags SOME but not ALL vectors") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("sim_centroid_outliers")(spark, sfMid)
      .agg(sum(when(col("is_outlier"), 1L).otherwise(0L)), count(lit(1)))
      .head()
    val (flagged, total) = (r.getLong(0), r.getLong(1))
    // a centroid re-draw that pulls every vector inside (or pushes every
    // vector outside) the threshold would make the gate vacuous
    assert(flagged > 0L && flagged < total,
      s"outlier gate degenerate: $flagged of $total")
  }

  test("tx_chunk_overlap: multi-chunk docs exist and overlap is exercised") {
    import org.apache.spark.sql.functions._
    // the chunker only demonstrates its overlap semantics if some doc
    // splits into ≥ 2 chunks (otherwise every doc fits one window and the
    // row degenerates to a hash of the text)
    val chunks = SparkEntry.queries("tx_chunk_overlap")(spark, sfSmall)
    val multi = chunks.groupBy("doc_id").count().where(col("count") >= 2).count()
    assert(multi > 0L, "no document produced ≥ 2 chunks — shrink the window")
    // and some doc's final chunk must be PARTIAL (shorter than the
    // window) — proves the tail is kept, not truncated
    val partial = chunks.where(col("n_tokens") < 16).count()
    assert(partial > 0L, "every chunk is full-width — the tail rule is untested here")
  }

  test("rel_mv_incremental: the delta actually contributes and totals reconcile") {
    import org.apache.spark.sql.functions._
    // merge ≡ recompute is the oracle's job; THIS pins that the delta is
    // non-trivial (the staged MV alone would pass an oracle diff if the
    // delta were empty) and that merged counts reconcile with the raw
    // fact count exactly
    val mv = SparkEntry.queries("rel_mv_incremental")(spark, sfSmall)
    val merged = mv.agg(sum(col("n_orders"))).head().getLong(0)
    val deltaN = Tables.orders(spark, sfSmall)
      .where(pmod(col("o_orderkey"), lit(10L)) === 0).count()
    val totalN = Tables.orders(spark, sfSmall).count()
    assert(deltaN > 0L, "delta slice is empty — the merge demonstrates nothing")
    assert(merged == totalN,
      s"merged MV counts $merged != fact rows $totalN (delta $deltaN)")
  }

  test("lay_skipping_stats: the layout actually skips files on some probe") {
    import org.apache.spark.sql.functions._
    val audit = SparkEntry.queries("lay_skipping_stats")(spark, sfMid)
      .collect()
    assert(audit.length === 4)
    audit.foreach(r => assert(r.getAs[Long]("files_hit") >= 1L))
    // at least one probe window must prune SOMETHING, or the audit can
    // no longer distinguish layouts (every file straddling every window)
    assert(audit.exists(r => r.getAs[Double]("hit_fraction") < 1.0),
      audit.map(_.mkString(",")).mkString("; "))
  }
}
