package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan shape guards for the scale-critical properties PLANS.md
  * documents — these fail loudly if a refactor silently regresses a plan
  * (a broadcast turning into a cartesian product, a pruned scan losing its
  * PartitionFilters, a top-k losing its WindowGroupLimit). The assertions
  * run on the INITIAL executed plan (AQE not yet finalized): shape
  * properties — join strategies, limits, filters — are decided there.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planshape-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Queries whose candidate generation must NEVER degrade to an unkeyed
    * pair join. BroadcastNestedLoopJoin over a 1-row corpus-size subplan
    * is fine; CartesianProduct over data is not.
    */
  private val neverCartesian = Seq(
    "ts_scatter_gather", "dd_ngram_jaccard", "dd_minhash_lsh", "dd_simhash",
    "dd_containment", "dd_substring", "dd_embedding_neardup", "mm_phash",
    "ts_interval_overlap", "tx_novelty", "rel_nation_revenue",
    "rel_shipping_priority", "rel_small_qty_loss", "rel_market_share",
    "gr_degree_dist", "dd_entity_resolution", "gr_linkpred", "gr_kcore",
    "sim_mmr", "lay_skipping_stats",
    "lay_zorder_rewrite", "lay_zorder_incremental", "ts_file_ingest")

  neverCartesian.foreach { name =>
    test(s"$name: no CartesianProduct anywhere in the plan") {
      assert(!plan(name).contains("CartesianProduct"))
    }
  }

  test("ts_scatter_gather: ranges join is broadcast, ts filter reaches the scan") {
    val p = plan("ts_scatter_gather")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"))
  }

  test("rel_nation_revenue: both dimension joins broadcast (no merge join)") {
    val p = plan("rel_nation_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("rel_topk_orders plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("rel_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("tx_kmv_distinct: the sketch survives as TakeOrderedAndProject") {
    assert(plan("tx_kmv_distinct").contains("TakeOrderedAndProject"))
  }

  test("tx_tfidf: per-doc top-k runs as WindowGroupLimit") {
    assert(plan("tx_tfidf").contains("WindowGroupLimit"))
  }

  test("ts_lww_dedup: LWW is ONE map-side-combined aggregate, not a window") {
    val p = plan("ts_lww_dedup")
    assert(p.contains("partial_max_by"))  // map-side combine present
    assert(!p.contains("Window "))        // never a row_number rewrite
    assert(p.linesIterator.count(_.contains("Exchange ")) <= 2)
  }

  test("ts_store_pruned_scan: the store scan keeps non-empty PartitionFilters") {
    val p = plan("ts_store_pruned_scan")
    assert(p.contains("PartitionFilters: [isnotnull"))
  }

  test("ts_store_sql_lww: pruning survives the SQL temp view") {
    val p = plan("ts_store_sql_lww")
    assert(p.contains("PartitionFilters: [isnotnull"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("ts_ohlc: one aggregate exchange plus the output sort, nothing more") {
    val p = plan("ts_ohlc")
    assert(p.linesIterator.count(_.contains("Exchange ")) <= 2)
    assert(!p.contains("Window ")) // min_by/max_by, not row_number windows
  }

  test("sim_ann_bruteforce: partial top-k runs before the exchange") {
    val p = plan("sim_ann_bruteforce")
    // the AQE wrapper hides codegen stars pre-execution; the shape proof
    // is the Partial WindowGroupLimit below the query_id exchange
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Partial"))
  }

  test("sim_ann_ivf: assignment is a nearest_centroid projection, no sort-aggregate") {
    // round 8: the fixed-k seed collects through the DriverBudget guard
    // and assignment becomes ONE codegen'd nearest_centroid projection —
    // the crossJoin+max(struct) argmax (whose array-bearing struct forced
    // SortAggregateExec over corpus×k rows) must never come back; the
    // probe join stays broadcast (queries side)
    val p = plan("sim_ann_ivf")
    assert(p.contains("nearest_centroid"), p.take(2000))
    assert(!p.contains("SortAggregate"), p.take(3000))
    assert(p.contains("BroadcastExchange"))
  }

  test("lay_bucketed_join: the join has no exchange on the join key (bucketed co-location)") {
    // both sides are bucketBy+sortBy tables on okey: the SortMergeJoin
    // must consume them directly — a hashpartitioning exchange on okey
    // would mean the layout's pre-shuffle was wasted
    val p = plan("lay_bucketed_join")
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("hashpartitioning(okey"))
  }

  test("cu_decontaminate: eval shingles broadcast — corpus never shuffles on shingle") {
    val p = plan("cu_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("ts_dsv2_pruned_scan: the V2 scan prunes directories at plan time") {
    // the connector's scan node must appear with a strict dirs=k/N prune
    // (k < N): tag IN + ts bounds prune tag and window directories before
    // any file is listed — the 100 TB read-path property
    val p = plan("ts_dsv2_pruned_scan")
    val m = """dirs=(\d+)/(\d+)""".r.findFirstMatchIn(p)
    assert(m.isDefined, s"no TsdbScan dirs=k/N in plan:\n$p")
    assert(m.get.group(1).toLong < m.get.group(2).toLong,
      s"expected a strict directory prune, got ${m.get.group(0)}")
  }

  test("ts_dsv2_runtime_prune: pruning comes from the RUNTIME filter, not a static pushdown") {
    // Round 8: the dim must carry a selective-but-untranslatable filter
    // (md5-prefix IN) so (a) Spark's PartitionPruning rule injects the
    // DynamicPruningSubquery — a bare LocalRelation dim has no Filter
    // node and gets NO runtime filter, silently full-scanning the store —
    // and (b) constraint propagation can't turn it into a plan-time
    // PushedFilter (a plain `d_tag IN (...)` does, converting the row
    // into a static-prune test). Pin both properties on the scan node.
    val p = plan("ts_dsv2_runtime_prune")
    val scanLine = p.linesIterator.find(_.contains("TsdbScan")).getOrElse(
      fail(s"no TsdbScan node in plan:\n$p"))
    assert(scanLine.contains("RuntimeFilters: [dynamicpruning"),
      s"runtime filter missing from the scan: $scanLine")
    assert(scanLine.contains("PushedFilters: []"),
      s"static pushdown crept back into the runtime-prune row: $scanLine")
  }

  test("rel_small_qty_loss: the part-dim filter broadcasts into lineitem") {
    // the selective dim restriction must be a broadcast join applied
    // BEFORE the per-part aggregate — never a full-table shuffle agg
    assert(plan("rel_small_qty_loss").contains("BroadcastHashJoin"))
  }

  test("sim_knn_graph: per-node top-k runs as WindowGroupLimit") {
    // ≤ k rows per node may reach the rank exchange — a full per-block
    // sort would shuffle the entire candidate set
    assert(plan("sim_knn_graph").contains("WindowGroupLimit"))
  }

  test("rel_market_share: dim chains broadcast; fact joins keyed") {
    val p = plan("rel_market_share")
    // region→nation→customer and supplier→nation flags are broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("sim_pq_adc: codebook and LUT broadcast; no CartesianProduct") {
    val p = plan("sim_pq_adc")
    // the M·K codebook joins by subspace id and the per-query LUT joins
    // the compressed corpus as broadcasts — the corpus itself never
    // shuffles on anything but its own aggregate keys
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_pii_scrub: single projection — no hash exchange before the output sort") {
    val p = plan("tx_pii_scrub")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("mm_dedup: one map-side-combined aggregate exchange, keyed on the digest") {
    val p = plan("mm_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert(p.contains("HashAggregate"))
  }

  test("ts_dsv2_agg_pushdown: the aggregate reaches the connector (footer path)") {
    val df = SparkEntry.queries("ts_dsv2_agg_pushdown")(spark, sf)
    df.collect() // force planning through AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates: [RowCount, MinOf(ts), MaxOf(ts)]"),
      p.take(2000))
    assert(p.contains("GroupBy: [tag, partition_start]"), p.take(2000))
  }

  test("ts_dsv2_topn_read: the newest-first limit reaches the connector") {
    val df = SparkEntry.queries("ts_dsv2_topn_read")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedTopN: [partition_start DESC, tag ASC]"),
      p.take(2000))
    // and the walk kept a strict subset of the window directories
    val m = "dirs=(\\d+)/(\\d+)".r.findFirstMatchIn(p)
    assert(m.exists(x => x.group(1).toInt < x.group(2).toInt), p.take(2000))
  }

  test("rel_scd2_merge: both windows share ONE shuffle on the dimension key") {
    val p = plan("rel_scd2_merge")
    // lag-mark, version row_number and valid_to lead all partition by
    // o_custkey with the same ordering — a second hash exchange would
    // mean the window specs diverged
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).size === 1,
      p.take(2000))
  }

  test("dd_passage_dedup: hash-keyed exchanges only — never a pair join") {
    val p = plan("dd_passage_dedup")
    // keeper selection shuffles on the passage hash, the report on
    // doc_id; a Cartesian/unkeyed join would mean the dedup degraded to
    // pairwise comparison
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("cu_kcenter: result is the k-row local relation (bounded driver state)") {
    // the greedy loop runs at construction; the OUTPUT must be the ≤k-row
    // driver-side table — a corpus-dependent plan here would mean the
    // selection leaked distributed state into the result
    val p = plan("cu_kcenter")
    assert(p.contains("LocalTableScan"), p.take(2000))
    // only the output sort's range exchange over the k rows is allowed
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("ts_outlier_mad: per-tag stats broadcast back onto the scan") {
    val p = plan("ts_outlier_mad")
    // med and mad are tag-cardinality tables; both must broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("sim_range_search: pair scoring stays keyed on the LSH bucket") {
    val p = plan("sim_range_search")
    // both self-join sides are corpus-sized: an unkeyed join here is the
    // corpus square the LSH blocking exists to prevent. The join must be
    // KEYED (hash exchange or a stats-driven broadcast HASH join — round
    // 8's projection bucketing makes the side size estimable, so tiny SFs
    // broadcast); never a nested-loop/cartesian pair join.
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("Exchange hashpartitioning") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("rel_order_dist: the fact pre-aggregates (map-side) before the dim join") {
    val p = plan("rel_order_dist")
    // partial_count below the join = |customers| rows move, not |orders|
    assert(p.contains("partial_count"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("cu_filter_funnel: one global aggregate, no data shuffle") {
    val p = plan("cu_filter_funnel")
    // 5 counters cross the network once per partition; any
    // hashpartitioning exchange means document data got shuffled
    assert(p.contains("partial_count"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("rel_cheapest_supplier: groupwise-min join-back, not a fact-wide window sort") {
    val p = plan("rel_cheapest_supplier")
    // the min aggregate must combine map-side; a Window node here means
    // the whole fact got sorted per partkey instead
    assert(p.contains("partial_min"), p.take(2000))
    assert(!p.contains("Window ["), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("mm codec lanes: no hash exchange — pure batched per-partition decode") {
    // the real-codec stages are embarrassingly parallel projections; a
    // hashpartitioning exchange appearing here means a decode stage
    // started shuffling payload bytes (the only exchange allowed is the
    // registered output sort's range partition)
    Seq("mm_features", "mm_transform", "mm_audio_energy", "mm_frame_sample")
      .foreach { n =>
        val p = plan(n)
        assert(!p.contains("Exchange hashpartitioning"),
          s"$n shuffles payload bytes:\n${p.take(1500)}")
      }
  }

  test("rel_supplier_share: broadcast total, no single-partition window, one runtime fact scan") {
    // VERDICT r11 #5: the global threshold scalar must be a 1-row
    // aggregate broadcast back — NEVER an empty-frame window that funnels
    // the (data-derived) supplier table through one partition
    val df = SparkEntry.queries("rel_supplier_share")(spark, sf)
    df.collect() // finalize AQE so exchange reuse is visible
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window ["), p.take(2000))
    // AQE dedupes the identical per-supplier aggregate: the total's
    // subtree reads the REUSED exchange, so lineitem is scanned once
    assert(p.contains("ReusedExchange"), p.take(4000))
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p.take(4000))
  }

  test("rel_promo_share: one pass — single fact aggregate, part side broadcast") {
    val p = plan("rel_promo_share")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    // numerator and denominator live in the SAME aggregate: exactly one
    // hashpartitioning exchange (the group-by), not one per conditional sum
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("rel_idle_rich: urgent-order filter pushes to the scan under the anti join") {
    val p = plan("rel_idle_rich")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("StringStartsWith(o_orderpriority,1)"), p.take(3000))
  }

  test("sim_ivf_pq: probe is keyed on the inverted list, index state broadcast") {
    val p = plan("sim_ivf_pq")
    // corpus-sized sides never meet unkeyed: the ADC scan joins on the
    // bucket key, coarse/codebook/LUT tables broadcast
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("rel_volume_shipping: nation/supplier dims broadcast; no cartesian") {
    val p = plan("rel_volume_shipping")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("rel_top_supplier: per-supplier aggregate feeds a broadcast 1-row max") {
    val p = plan("rel_top_supplier")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the best-revenue row must come back as a broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("ts_debounce: one exchange feeds the lag window, no self-join") {
    val p = plan("ts_debounce")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p.take(2000)) // pure window + aggregate — no join at all
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(2000))
  }

  test("ts_watermark_audit: one per-tag window exchange, no join") {
    val p = plan("ts_watermark_audit")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("sim_sq8_recall: quantization bounds broadcast, no cartesian over data") {
    val p = plan("sim_sq8_recall")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("cu_embed_decontaminate: eval set broadcasts, argmax is map-side combined") {
    val p = plan("cu_embed_decontaminate")
    // the eval side must broadcast (BNLJ over the broadcast eval set is
    // the expected cross shape); the corpus must NOT shuffle as pairs —
    // only the per-vector partial_max aggregate crosses the network
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(p.contains("partial_max"), p.take(3000))
  }

  test("ANN kernel audit: dot kernels live in compiling codegen spans") {
    // Round-8 observability pin (VERDICT r7 #1): the 5-8x driver-bench ANN
    // skew had "codegen silently not engaging" as a candidate mechanism.
    // For each representative ANN query: execute, then assert every
    // QuantizedDotProduct/LongDotProduct occurrence in the EXECUTED plan
    // sits inside a WholeStageCodegen span AND that span's generated code
    // compiles with the executor's own CodeGenerator.
    for (name <- Seq("sim_ann_bruteforce", "sim_ann_ivf", "sim_ann_ivf_kmeans",
        "sim_ivf_pq", "sim_sq8_recall")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.count() // finalize AQE so the audit walks the real executed plan
      val a = graft.plans.KernelProbe.audit(df)
      assert(a.inCodegen > 0, s"$name: no kernel in any codegen span (${a.render})")
      assert(a.interpreted == 0, s"$name: kernel outside codegen (${a.render})")
      assert(a.spansFailed == 0, s"$name: kernel span failed to compile (${a.render})")
    }
  }

  test("cu_quality_classifier: map-only plan, zero exchanges before the sort") {
    // the classifier gate must fuse into the feeding scan — a shuffle
    // here means a 100 TB corpus pays an exchange for a per-row score
    val p = plan("cu_quality_classifier")
    val exchanges = "Exchange".r.findAllIn(p).length
    // the ONLY allowed exchange is the final orderBy's rangepartitioning;
    // scoring itself must be shuffle-free
    assert(exchanges <= 1, s"classifier plan shuffles while scoring:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"classifier plan hash-shuffles document rows:\n$p")
  }

  test("sim_ann_rerank: re-rank stage broadcasts the shortlist, corpus never cartesians") {
    val p = plan("sim_ann_rerank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), s"shortlist join not broadcast:\n$p")
  }

  test("lay_compaction_plan: metadata rows aggregate once, no wide-row shuffle") {
    val p = plan("lay_compaction_plan")
    assert(!p.contains("CartesianProduct"))
    // file-stat derivation is one hash aggregate; the window runs over
    // the per-partition file runs
    assert(p.contains("HashAggregate") && p.contains("Window"))
  }

  test("dd_entity_resolution: candidates come from a keyed block join, never all-pairs") {
    val p = plan("dd_entity_resolution")
    // the Levenshtein scoring must sit above an equality join on the
    // blocking key — a CartesianProduct here is the ER anti-pattern the
    // blocking exists to prevent (covered by neverCartesian too); also
    // pin that SOME equality join actually carries the candidates
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
    assert(p.toLowerCase.contains("levenshtein"), p.take(2000))
  }

  test("lay_skipping_stats: bounds and totals broadcast onto metadata rows") {
    val p = plan("lay_skipping_stats")
    // the two 1-row aggregates reach the file-stat rows as broadcasts;
    // the only exchanges are the stats aggregate and the probe rollup
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("tx_bpe_persisted_encode: the vocab comes from the persisted parquet, not a training job") {
    val p = plan("tx_bpe_persisted_encode")
    // read_index + apply: the plan's only inputs are the corpus scan and
    // the staged vocab table — the merge fold and pair-count rounds ran
    // once at persist time and must be absent here
    assert(p.contains("bpevocab"), p.take(2000))
    assert(!p.contains("TakeOrdered"), p.take(2000))
  }

  test("rel_bloom_pruned_join: the runtime bloom filter is actually injected") {
    val p = plan("rel_bloom_pruned_join")
    // the semi-join reduction this row exists to prove: might_contain on
    // the fact side's join key BEFORE the fact shuffle — and the join
    // really is a shuffle join (the simulated can't-broadcast regime)
    assert(p.contains("might_contain"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      p.take(2000))
  }

  test("ts_forecast_les: both smoothing windows share ONE hash exchange") {
    // S1's window, S2's window and the lead() all use the same
    // (partition, sort) spec — a second hashpartitioning exchange would
    // mean the chained smoothing re-shuffles the corpus per stage
    val p = plan("ts_forecast_les")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"chained windows re-shuffle ($hashEx hash exchanges):\n$p")
  }

  test("sim_ivf_persisted_probe: training-free — no Lloyd round, corpus read only from the index") {
    val p = plan("sim_ivf_persisted_probe")
    // query assignment is the codegen'd projection against the LOADED
    // centroid table
    assert(p.contains("nearest_centroid"), p.take(2000))
    // a Lloyd round would show as the centroid-mean re-aggregate
    // (posexplode over (c_id, pos)) — none may exist in a probe plan
    assert(!p.contains("posexplode"), "probe plan contains a Lloyd mean round")
    assert(!p.contains("SortAggregate"), p.take(3000))
    // the inverted lists are bucket-partitioned on disk and Spark injects
    // DYNAMIC partition pruning from the query side: only member
    // partitions for buckets the queries actually hit are listed — the
    // single-probe serving path at 100 TB
    assert(p.contains("dynamicpruningexpression"),
      "member scan lost its runtime bucket pruning")
    // the raw embeddings table appears only as the query slice — once in
    // the main plan, at most once more REUSED inside the DPP subquery;
    // members/centroids come from the persisted index files
    val rawScans = "embeddings\\.parquet".r.findAllIn(p).length
    assert(rawScans <= 2, s"probe re-reads the raw corpus ($rawScans scans)")
  }

  test("sim_pq_persisted_probe: corpus exists only as persisted codes — no re-encode") {
    val p = plan("sim_pq_persisted_probe")
    // encode's per-(vector, subspace) argmin is a max(struct) aggregate
    // over corpus×K rows; a probe plan may not contain it — the corpus
    // side must be the persisted codes scan alone
    val rawScans = "embeddings\\.parquet".r.findAllIn(p).length
    assert(rawScans <= 1, s"probe re-reads the raw corpus ($rawScans scans)")
    assert(p.contains("codes"), "probe plan does not read the persisted codes")
    // LUT broadcast against the code scan, as in sim_pq_adc
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("sim_graph_search: bounded walk — no Lloyd, no global window, no cartesian (every hop)") {
    // graphSearch localCheckpoints every hop, so the FINAL plan only shows
    // the top-k stage; the per-hop scoring joins — where a CartesianProduct
    // or single-partition exchange would actually appear — are captured
    // through the hop probe BEFORE each checkpoint (ADVICE r10).
    val hopPlans = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.analytics.Similarity.hopPlanProbe =
      df => hopPlans += df.queryExecution.executedPlan.toString
    val p = try plan("sim_graph_search")
            finally graft.analytics.Similarity.hopPlanProbe = _ => ()
    // entry scoring + 3 hops
    assert(hopPlans.size >= 4, s"expected >=4 hop plans, saw ${hopPlans.size}")
    (hopPlans.toSeq :+ p).zipWithIndex.foreach { case (hp, i) =>
      // the serving walk never trains (no Lloyd mean round), never funnels
      // the corpus through one partition (every row_number is keyed by
      // query_id), and never degrades to an unkeyed pair join. A
      // SinglePartition exchange INSIDE Spark's injected bloom-runtime-
      // filter subquery is exempt: bloom_filter_agg is a 1-row scalar
      // reduction, not a data funnel.
      assert(!hp.contains("CartesianProduct"), s"stage $i:\n${hp.take(2000)}")
      assert(!hp.contains("posexplode"), s"stage $i contains a Lloyd mean round")
      val lines = hp.linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, j) =>
        if (l.contains("Exchange SinglePartition")) {
          val ctx = lines.slice(math.max(0, j - 2), j).mkString("\n")
          assert(ctx.contains("bloom_filter_agg"),
            s"stage $i funnels data through one partition:\n$l\ncontext:\n$ctx")
        }
      }
    }
  }

  test("sim_graph_multilevel_persisted: serve is walk-only — build's global rank absent") {
    // the build derives ring backbones with a GLOBAL md5 rank; the whole
    // point of persisting the hierarchy (VERDICT r13 next #4) is that no
    // probe plan ever contains that work. Capture every walk stage.
    val hopPlans = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.analytics.Similarity.hopPlanProbe =
      df => hopPlans += df.queryExecution.executedPlan.toString
    val p = try plan("sim_graph_multilevel_persisted")
            finally graft.analytics.Similarity.hopPlanProbe = _ => ()
    // entry scoring + topHops(2) + midHops(2) + layer-0 hops(2)
    assert(hopPlans.size >= 7, s"expected >=7 stage plans, saw ${hopPlans.size}")
    (hopPlans.toSeq :+ p).zipWithIndex.foreach { case (hp, i) =>
      assert(!hp.contains("CartesianProduct"), s"stage $i:\n${hp.take(2000)}")
      assert(!hp.contains("posexplode"), s"stage $i contains build work")
      // every window in a serve stage is query-keyed (the beam re-rank);
      // the build's md5 global rank has no query_id key and must not appear
      hp.linesIterator.filter(_.contains("Window [")).foreach { l =>
        assert(l.contains("query_id"),
          s"stage $i carries a non-query-keyed window (build leak?):\n$l")
      }
    }
    // the adjacency input is the persisted, level-PRUNED list scan (the
    // Location path may truncate in toString; the partition filter is
    // the durable marker)
    assert(hopPlans.exists(
        _.contains("PartitionFilters: [isnotnull(level#")),
      "no stage reads the level-partitioned persisted lists")
  }

  test("sim_ivf_forget_probe: deletion is a broadcast anti-join, not a rewrite or retrain") {
    val p = plan("sim_ivf_forget_probe")
    // the tombstone anti-join must broadcast (forget sets are
    // request-sized) and no Lloyd round may appear post-delete
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(!p.contains("posexplode"), "forget probe plan contains a Lloyd mean round")
    assert(!p.contains("CartesianProduct"))
  }

  test("sim_pq_forget_probe: tombstones filter the CODE scan; corpus never re-encoded") {
    val p = plan("sim_pq_forget_probe")
    assert(p.contains("LeftAnti"), p.take(3000))
    // encode's argmin aggregate must not exist — the corpus enters only
    // as the persisted code rows
    val rawScans = "embeddings\\.parquet".r.findAllIn(p).length
    assert(rawScans <= 2, s"forget probe re-reads the raw corpus ($rawScans scans)")
    assert(p.contains("codes"), "plan does not read the persisted codes")
    assert(!p.contains("CartesianProduct"))
  }

  test("sim_filtered_search: the label predicate is PUSHED to the member scan") {
    val p = plan("sim_filtered_search")
    // the label payload lives IN the index, so the metadata filter must
    // reach the parquet scan — the design's entire point: no metadata
    // join, no post-scan filter over the full lists
    assert(p.contains("In(label"), s"label filter not pushed:\n${p.take(3000)}")
    assert(!p.contains("posexplode"), "filtered probe plan contains a Lloyd mean round")
    assert(!p.contains("CartesianProduct"))
  }

  test("sim_hybrid_search: two-index probe — no corpus re-shingling, no cartesian") {
    val p = plan("sim_hybrid_search")
    // the lexical arm reads the STAGED postings, never the raw document
    // text: documents.parquet may appear only as the query-id slice
    val docScans = "documents\\.parquet".r.findAllIn(p).length
    assert(docScans <= 1, s"probe re-shingles the corpus ($docScans raw doc scans)")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // no Lloyd round leaks in from the vector arm
    assert(!p.contains("posexplode"), "hybrid probe plan contains a Lloyd mean round")
  }

  test("sim_ivf_persisted_add: the add+probe plan is training-free (no Lloyd, no sort-aggregate)") {
    val p = plan("sim_ivf_persisted_add")
    assert(p.contains("nearest_centroid"), p.take(2000))
    assert(!p.contains("posexplode"), "add/probe plan contains a Lloyd mean round")
    assert(!p.contains("SortAggregate"), p.take(3000))
  }

  test("sim_nndescent: every join is keyed — no cartesian over data") {
    val p = plan("sim_nndescent")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("tx_chunk_overlap: map-only chunking, zero exchanges before the sort") {
    // the chunker must fuse into the feeding scan (projection + bounded
    // explode) — a shuffle here means a 100 TB corpus pays an exchange
    // just to split documents
    val p = plan("tx_chunk_overlap")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunker plan hash-shuffles document rows:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"chunker shuffles while splitting:\n$p")
  }

  test("rel_mv_incremental: history facts never rescan — one orders scan (the delta)") {
    // the refresh reads the DELTA slice of the fact table plus the staged
    // partial-MV parquet; a second orders scan means the merge silently
    // became a recompute
    val p = plan("rel_mv_incremental")
    val ordersScans = "orders\\.parquet".r.findAllIn(p).length
    assert(ordersScans == 1,
      s"MV refresh must scan orders exactly once (the delta), found $ordersScans:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_pack_sequences: two-level prefix sum — no corpus-sized global window, one corpus scan") {
    val p = plan("tx_pack_sequences")
    // the corpus-side prefix window is PARTITIONED by bucket — bounded
    // partitions, never the whole corpus through one task
    assert(p.contains("windowspecdefinition(bucket#"), p.take(3000))
    // the only unpartitioned window runs over the metadata-scale bucket
    // table, which is produced by a map-side-combined aggregate and
    // BROADCAST back to the corpus side
    assert(p.contains("HashAggregate(keys=[bucket"), p.take(3000))
    assert(p.contains("BroadcastHashJoin [bucket"), p.take(3000))
    // the text column is scanned + tokenized exactly once (the narrow
    // lens projection is checkpointed; this plan reads only the RDD)
    assert(!p.contains("FileScan parquet"), p.take(3000))
  }

  test("ts_change_feed: snapshot diff is ONE keyed full-outer join with pushed ingest bounds") {
    val p = plan("ts_change_feed")
    // the (tag, ts) diff join is keyed (sort-merge or shuffled-hash),
    // never a pair enumeration
    assert(p.contains("FullOuter"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // each snapshot's ingest horizon reaches the parquet scan — rows
    // appended after the endpoint are skipped at the reader, not post-hoc
    assert(p.contains("PushedFilters: [IsNotNull(ingestTs), LessThanOrEqual(ingestTs"),
      p.take(3000))
  }

  test("tsdb_changes TVF resolves to the Scala lane's ledger-pruned plan verbatim") {
    // the SQL table function must be the SAME plan behind a SQL front
    // door: identical pruned input-file set, identical answer — never a
    // second implementation that could drift
    import org.apache.spark.sql.functions._
    import graft.tsdb.{Sample, StoreSettings, TimeSeriesStore}
    graft.expressions.GraftFunctions.register(spark)
    val st = new TimeSeriesStore(spark,
      java.nio.file.Files.createTempDirectory("planshape-tvf").toString,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    st.writeSamples((0 until 30).map(i =>
      Sample(s"t${i % 3}", i * 10L, s"v$i", 1000L, "w1", i.toLong)))
    st.flushL0()
    st.clock = () => 2000L
    st.writeSamples(Seq(Sample("t0", 0L, "u", 2000L, "w2", 100L)))
    st.flushL0()
    val api = st.changesBetween(1500L, 2500L)
    val sql = spark.sql("SELECT * FROM tsdb_changes(" +
      s"'${st.namespaceRoot}', ${1L << 60}, 1500, 2500)")
    // same ledger-pruned file set (the plan), same rows (the answer)
    assert(sql.inputFiles.sorted.toSeq === api.inputFiles.sorted.toSeq,
      "the TVF scanned a different (un-pruned?) file set")
    val a = api.orderBy("tag", "ts", "change_type").collect().toSeq
    val b = sql.orderBy("tag", "ts", "change_type").collect().toSeq
    assert(a === b, "the TVF answered differently from the Scala lane")
    // pruning pins: only the churned tag's dir is in the scan set
    assert(sql.inputFiles.nonEmpty &&
      sql.inputFiles.forall(f => f.contains("tag=t0") || f.contains("/l0/")),
      sql.inputFiles.mkString(","))
    // literal-argument contract is enforced loudly
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM tsdb_changes('${st.namespaceRoot}', " +
        s"${1L << 60}, 1500, CAST(rand() * 10 AS BIGINT))").collect()
    }
    assert(err.getMessage.contains("literal") ||
      err.getMessage.toLowerCase.contains("fold"), err.getMessage)
  }

  test("DriverBudget branch counters observe k-means centroid materialization") {
    graft.analytics.DriverBudget.resetBranchCounts()
    SparkEntry.queries("sim_ann_ivf_kmeans")(spark, sf).count()
    val (local, fallback) = graft.analytics.DriverBudget.branchCounts
    assert(local + fallback > 0, "k-means ran no collectWithin calls")
    // on a healthy heap the k-row centroid table always takes the
    // driver-collect fast path; the fallback firing here is exactly the
    // condition the round-7 bench could not observe
    assert(fallback == 0, s"unexpected distributed fallback (local=$local fallback=$fallback)")
  }
}
