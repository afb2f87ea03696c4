package graft.examples

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "ts_scatter_gather" -> ("The reference's three-round-trip readIndex/readPage/merge composition as ONE declarative plan: " +
        "broadcast range join against the tiny ranges table, ts-filter pushed into the parquet scan, window LWW dedup."),
      "rel_nation_revenue" -> "Star join chain: both dimension joins broadcast (no shuffle on the fact side until the aggregate).",
      "dd_minhash_lsh" -> ("Candidate generation is a band-signature equality join; signatures are a wide per-doc aggregate " +
        "(k static min-columns, one narrow shuffle). AQE picks broadcast at this SF; at corpus scale the same logical plan shuffles on band_sig."),
      "sim_ann_bruteforce" -> ("Scoring runs the custom codegen'd QuantizedDotProduct expression inside WholeStageCodegen; " +
        "queries broadcast; per-partition top-k survives to the final window."),
      "dd_exact" -> "Hash-groupBy dedup: two window functions over one hash-partitioned exchange on the content hash.",
      "tx_quality" -> "Pure projection pipeline: single scan, no exchange until the output sort.",
      "tx_kmv_distinct" -> ("KMV cardinality sketch: the k smallest hashes survive as TakeOrderedAndProject — " +
        "only k values per partition ever cross the network, the sketch-friendly shape for 100 TB distinct counts."),
      "ts_store_pruned_scan" -> ("Scan over the store's OWN Hive-partitioned layout: non-empty PartitionFilters " +
        "on (tag, partition_start) — only the filtered tag/time directories are listed; the rest of the store is never opened."),
      "sim_ann_ivf_kmeans" -> ("Two Lloyd rounds as pure dataflow: broadcast argmax assignment + per-(centroid,dim) " +
        "mean aggregate per round, all dots in the codegen'd long_dot kernel — no driver-side data, so the same plan runs at corpus scale."),
      "cu_pack_bins" -> ("Sequence packing WITHOUT a global running sum: the cumulative window is partitioned by the " +
        "pack shard, so the sort/sum run shard-parallel — a single unpartitioned window here would serialize the corpus through one task."),
      "rel_skew_salted" -> ("Salted skew join: the probe side carries a per-row shard from a whole-row hash, the build side " +
        "explodes across all shards, and the join keys on (okey, __salt) — one hot orderkey spreads over factor tasks instead of stalling one."),
      "cu_decontaminate" -> ("Benchmark decontamination: the eval set's distinct shingles BROADCAST to the train probe " +
        "(benchmarks are megabytes against a 100 TB corpus) — the corpus is never shuffled on shingle; the only wide exchange is the per-doc hit aggregate."),
      "tx_tfidf" -> ("TF-IDF top-k: tf and df aggregates both map-side combined on high-cardinality keys, corpus size a 1-row " +
        "broadcast, and the per-doc top-k window runs as WindowGroupLimit — partial top-k before the exchange, not a full sort."),
      "tx_cmsketch" -> ("Count-min sketch: the corpus feeds ONE map-side-combined aggregate whose key cardinality is bounded " +
        "by d·w (768), not vocabulary size — each task emits <=768 rows regardless of input; the candidate probe is a broadcast join."),
      "ts_asof_native" -> ("The custom sort-merge as-of join physical operator (graft.plans.AsOfJoinExec): both sides " +
        "exchange+sort at NATIVE row width on the key — no union padding, no window buffering — then one streaming merge pass per partition. " +
        "Same oracle as ts_asof_join proves the two execution paths agree."),
      "dd_bloom_membership" -> ("Incremental-dedup pre-check: the train shingle set collapses to <=2^16 DISTINCT bit positions " +
        "(constant size at any corpus scale) that BROADCAST; the eval probe never shuffles the corpus on shingle content."),
      "tx_hll_shingles" -> ("HyperLogLog cardinality sketch: ONE map-side-combined aggregate with key cardinality <= 256 " +
        "(each task emits <=256 register rows no matter how much it scanned), then a broadcast join to the register universe — " +
        "the fixed-state alternative to KMV's global TakeOrdered merge point."),
      "lay_zorder" -> ("Z-order layout audit: the Morton key is 32 static shift/mask terms inside WholeStageCodegen; " +
        "the corpus bounds are a 1-row broadcast; the bucket summary is one map-side-combined aggregate on a 1024-value key."),
      "ts_anomaly" -> ("Integer z-score outliers: the 5-row per-tag stats table BROADCASTS back onto the scan " +
        "(no second wide exchange); the 3-sigma test is exact DECIMAL cross-multiplication — no float mean/stddev anywhere."),
      "ts_interval_overlap" -> ("Interval-overlap join via time-bucket equi-join: intervals explode to the hour buckets they span " +
        "and candidates share a bucket — the theta-join a naive plan would run never appears; overlap is verified exactly after the equi-join."),
      "gr_pagerank" -> ("Fixed-point PageRank: each unrolled round is an edges-to-ranks hash join + a map-side-combined " +
        "contribution aggregate; rounds are MATERIALIZED (localCheckpoint) so the similarity join above runs once, not 2^iters times."),
      "mm_phash" -> ("Perceptual-hash near-dup: block sums and the 64-bit fingerprint are two map-side-combined hash aggregates " +
        "(<=64 rows per doc); candidates come from the 4x16-bit band join — the same never-all-pairs shape as dd_simhash."),
      "dd_substring" -> ("Exact-substring dup spans: window hashes explode once, the document-frequency count is a map-side-combined " +
        "aggregate on the md5 hash, and the per-doc rollup joins BACK on the hash — a hot window costs O(df) rows, never O(df^2) pairs."),
      "ts_ohlc" -> ("OHLC bars: ONE map-side-combined aggregate — min_by/max_by on a (ts, seq) struct replace the two " +
        "row_number windows a naive plan would run, so no second exchange and no per-bucket sort."),
      "ts_ewma" -> ("EWMA: a single bounded ROWS window (<=16-element state per row) over one exchange on the tag — " +
        "the weighted fold is a Catalyst higher-order function over the materialized frame, not a sequential scan."),
      "sim_recall_eval" -> ("ANN quality metric: both retrieval arms reuse their registered plans; the compare is a " +
        "left-semi hash join on (query, neighbor) over queries x k rows — evaluation costs nothing beyond the two retrievals."),
      "tx_novelty" -> ("Shingle novelty: first-seen ownership is ONE map-side-combined min-aggregate on the shingle " +
        "joined back to the shingle rows — the data-valuation score never materializes doc pairs."),
      "mm_silence" -> ("Silence runs: frame energies reduce to a per-doc array BEFORE the explode (frame rows carry one long, " +
        "the payload is never replicated); both islands windows share one exchange on doc_id."),
      "ts_store_sql_lww" -> ("User-written SQL against registerViews's temp views: the view is transparent to Catalyst — " +
        "the scan under the SQL window still shows non-empty PartitionFilters on (tag, partition_start)."),
      "ts_asof_nearest" -> ("Nearest-in-time as-of: TWO sort-merge passes (backward + forward over the same union form) " +
        "stitched by an equality join on the left row — the |dt|-minimizing match without any pair join."),
      "gr_triangles" -> ("Triangle counting: the (a<b)-oriented edge list joins itself twice, every join keyed on a VERTEX id " +
        "(b=b, then (a,c)) — wedge checking stays an equality-shuffle, the all-pairs form never appears."),
      "dd_semdedup" -> ("SemDeDup: cosine pairs are scored ONLY inside a learned k-means cluster (bucket-equality self-join " +
        "on the Lloyd assignment) — candidates scale with cluster sizes; the corpus-square join never appears."),
      "sim_ann_ivf" -> ("IVF probe with the round-6 fixed-k seed: the centroid table is a distributed top-k " +
        "(TakeOrderedAndProject on md5(vec_id) — O(k) per partition, k-row driver merge, CONSTANT in corpus size) " +
        "that BROADCASTS to the argmax assignment; the probe join shuffles on the bucket id only."),
      "sim_ann_ivf_kmeans_mp" -> ("Multi-probe IVF k-means (the nprobe recall knob): the query-to-centroid ranking is a " +
        "window over queries x k rows (query-set-sized, never corpus-sized), the nProbe probe table broadcasts, and the " +
        "bucket join scores each (query, neighbor) exactly once — a neighbor lives in one bucket and probed buckets are distinct."),
      "ts_dsv2_pruned_scan" -> ("The engine-native DataSource V2 connector (graft-tsdb): BatchScan shows `dirs=k/N` — tag IN " +
        "plus ts bounds prune tag and window DIRECTORIES at plan time (through the width invariant, before any file listing), " +
        "and the 3-column projection is pushed into the parquet read schema — value/writerId bytes are never decoded."),
      "rel_small_qty_loss" -> ("TPC-H Q17 shape, join-first: the selective part filter BROADCASTS and restricts lineitem " +
        "BEFORE the per-part average — the aggregate runs over the 1%-ish selected slice, never the full fact table; " +
        "the threshold test is division-free exact DECIMAL (qty*5*cnt < sum)."),
      "rel_market_share" -> ("TPC-H Q8 shape: region->nation->customer collapses to a broadcast custkey filter and " +
        "supplier->nation to a broadcast (suppkey, is_target) flag — the only wide operations are the two fact joins " +
        "on their natural keys; volumes are exact DECIMAL sums, the share one deterministic double division."),
      "gr_degree_dist" -> ("Degree histogram of the near-dup graph: after the label-blocked candidate join, " +
        "per-node degree and the degree histogram are two map-side-combined aggregates over vertex-id keys — " +
        "node-scale then distinct-degree-scale, both metadata-sized next to the pair materialization."),
      "cu_curriculum" -> ("Curriculum stages: the global easy->hard order uses the distributed total-order-index pattern — " +
        "repartitionByRange (parallel sort) + per-partition rank + <=32-row broadcast offsets — so no single-task global " +
        "window ever sees the corpus; the 5-stage rollup is metadata."),
      "cu_epoch_shuffle" -> ("Per-epoch training shuffle: the permutation key is md5(epoch||doc_id) — content-independent and " +
        "recomputable anywhere, so shard assignment is ONE hash bucketing per epoch (map-side-combined aggregate on " +
        "(epoch, shard)); no central order is ever materialized."),
      "sim_knn_graph" -> ("k-NN graph: exact quantized cosine within the label block, per-node top-k as WindowGroupLimit — " +
        "at most k rows per node survive to the rank exchange. Sigma-|block|^2 candidate contract (probe: 33x at 10x data " +
        "as blocks grew 10x); with corpus-scale blocks swap the blocking key for fixed-k k-means or LSH buckets."),
      "ts_sql_catalog_scan" -> ("Pure-SQL consumption through the TableCatalog (tsdb.<ns>.hot): the catalog resolves the " +
        "namespace's write-once settings.json and hands back the SAME TsdbTable — the SQL path shows the identical " +
        "TsdbScan dirs=k/N plan-time prune as the DataFrame path; no view layer, no re-listing."),
      "ts_dsv2_runtime_prune" -> ("Runtime (DPP) directory pruning under the oracle: NO static tag predicate — the 2-row " +
        "broadcast dim's key set reaches SupportsRuntimeFiltering.filter at execution, the scan re-prunes tag directories " +
        "before listing a single file, and the events-side oracle would hash-diverge on any wrong prune."),
      "sim_pq_adc" -> ("Product-quantization ADC: the corpus collapses to ONE slim codes-array row per vector (2 bytes of " +
        "ids vs 256 bytes of floats — the memory-bandwidth win PQ exists for); the M*K codebook and the per-query LUT both " +
        "BROADCAST, so the scan is a codegen'd array-lookup sum over compressed rows with no corpus shuffle beyond its own aggregates."),
      "gr_label_prop" -> ("Bounded-round label propagation: each of the R=3 supersteps is one edges-to-labels hash join + a " +
        "map-side-combined min aggregate, MATERIALIZED between rounds (localCheckpoint) so the upstream similarity join runs " +
        "once — fixed R-superstep cost regardless of component diameter, vs dd_dup_clusters' convergence fixpoint."),
      "tx_pii_scrub" -> ("PII scrub: detection counts and the triple-redaction digest are ONE projection over the scan — " +
        "no exchange before the output sort; regexes compile once per task inside WholeStageCodegen, the " +
        "embarrassingly-parallel shape a 100 TB scrub pass needs."),
      "rel_scd2_merge" -> ("SCD2 dimension build: the change-mark lag, version row_number and valid_to lead all partition " +
        "by the dimension key with one ordering — a SINGLE hash exchange on o_custkey feeds all three windows; per-key state " +
        "is one lag cell, so the build holds at any history length."),
      "ts_dsv2_agg_pushdown" -> ("FOOTER aggregate pushdown: the scan's ReadSchema IS the aggregation (PushedAggregates in " +
        "the BatchScan line) — each (tag, window) directory emits ONE pre-aggregated row computed from parquet block counts " +
        "and int64 column statistics, no data pages decoded; Spark's final merge sees directory-count rows, not data."),
      "ts_dsv2_topn_read" -> ("Top-N pushdown, the reference's newest-first readIndex walk: the dir-encoded sort prefix " +
        "(partition_start DESC, tag ASC) pushes into the connector, which keeps only enough directories (by footer row " +
        "counts, boundary-tie-safe) to cover the limit — dirs=k/N in the BatchScan line shows the walk; Spark's " +
        "TakeOrdered applies the row-level suffix keys to the surviving rows."),
      "rel_supplier_wait" -> ("TPC-H Q21 shape, aggregate rewrite: the correlated EXISTS/NOT-EXISTS pair becomes one " +
        "per-order rollup (distinct suppliers / distinct late suppliers, map-side combined) joined back to the late lines — " +
        "two hash shuffles on l_orderkey plus a broadcast supplier dim; the oracle keeps the textbook correlated form, " +
        "so hash equality PROVES the rewrite."),
      "rel_order_dist" -> ("TPC-H Q13 shape: the fact PRE-AGGREGATES to one row per customer key before touching the dim " +
        "(partial_count below the join — |customers| rows move, not |orders|); the zero bucket comes from the outer join, " +
        "and the second aggregate's key space is the max order count."),
      "sim_range_search" -> ("Cosine range search (all pairs >= threshold): candidates are LSH-blocked — pairs score only " +
        "inside a shared bucket, so the join is a bucket-equality shuffle with sum-of-squared-bucket-sizes work; " +
        "the corpus-square theta join never appears."),
      "cu_filter_funnel" -> ("Quality-filter funnel: the whole cascaded survival report is ONE map-side-combined global " +
        "aggregate (5 counters per partition cross the network) plus a 4-row stack — no document data is ever shuffled; " +
        "thresholds compare in exact integer form, so the oracle matches bit-for-bit."),
      "cu_embed_decontaminate" -> ("Embedding-space decontamination: the benchmark-sized eval set BROADCASTS and the " +
        "per-train-vector max-cosine is a map-side-combined max(struct) argmax — one row per train vector crosses the " +
        "network; the corpus is never shuffled (the paraphrase-shaped complement of cu_decontaminate's 3-gram probe)."),
      "gr_components_star" -> ("Alternating large-star/small-star connected components: each round is two groupBy+join " +
        "supersteps over the CURRENT canonical pair set, materialized between rounds — O(log^2 n) rounds independent of " +
        "component diameter (the chain-component property min-label fixpoints lack); same oracle as dd_dup_clusters, so " +
        "all three component paths are proven bit-identical."),
      "tx_bpe_merges" -> ("BPE merge iteration: the corpus collapses ONCE to a map-side-combined word-frequency table; " +
        "pair explosion, counting and the TakeOrdered top-k all run on VOCAB-sized data — merge rounds never rescan the corpus."),
      "rel_volume_shipping" -> ("TPC-H Q7 shape: both nation dims and supplier broadcast; the shipdate-filtered " +
        "lineitem drives TWO hash shuffles — orders joins customer on custkey, then lineitem joins that on orderkey; " +
        "the (2 x 2 x years)-row aggregate map-side combines."),
      "rel_returned_items" -> ("TPC-H Q10 shape, aggregate-then-decorate: the per-custkey revenue rollup runs BEFORE " +
        "customer attaches by broadcast — the corpus-sized join never carries customer columns; top-20 is TakeOrdered."),
      "sim_sq8_recall" -> ("SQ8 scalar quantization: per-dim (min, max) training is ONE explode+aggregate collapsing to a " +
        "1-row broadcast (2*dim longs); encode is a per-row projection; the asymmetric scan scores exact queries against " +
        "decoded bin centers in the long-dot kernel — index state constant in corpus size, same contract as the PQ family."),
      "ts_debounce" -> ("Lag-gap debounce: ONE window over ONE hash exchange on (user_id, event_type); per-row state is a " +
        "single lag cell, so the retry-storm cleanup holds at any history length — no self-join, no islands explosion."),
      "cu_corpus_diff" -> ("Corpus snapshot diff: digests computed scan-side so the full-outer join shuffles only " +
        "(key, 32-byte hash) rows — document bodies never cross the network; the status column is a projection on top."),
      "sim_ann_rerank" -> ("Two-stage retrieval (FAISS refine): the PQ shortlist stage scans only 2-byte codes; the " +
        "re-rank stage streams the full-vector corpus against the BROADCAST |queries|*25 pair list and the broadcast " +
        "query set — the expensive vectors are read once, never shuffled, and the final window ranks shortlist-sized groups."),
      "lay_compaction_plan" -> ("Compaction dry-run: file stats derive from one map-side-combined aggregate, the packing " +
        "window runs per-partition (partition-count parallelism), and the group rollup is a second keyed aggregate — " +
        "metadata rows only, so the plan job is seconds at any table size; only the rewrite that consumes it touches data."),
      "cu_quality_classifier" -> ("Model-based quality gate: the linear-probe score is ONE map-only projection (split + " +
        "three list aggregates over the row's own words, exact integer milli-units) — zero exchanges before the output " +
        "sort, so the gate fuses into whatever scan feeds it at 100 TB."),
      "sim_incremental_ivf" -> ("Incremental IVF maintenance: history-seeded centroids are k·dim longs of expression " +
        "state (DriverBudget-guarded), BOTH sides assign through the codegen'd nearest_centroid projection — no join, " +
        "no shuffle — and the occupancy-drift rollup is one map-side-combined aggregate on the k-value bucket key."),
      "gr_components_incremental" -> ("Incremental components merge: history edges cluster once, delta edges CONTRACT " +
        "through yesterday's labels (two label joins), and only the delta-edge-sized contracted graph re-clusters — " +
        "history is never re-clustered; gated by the identical from-scratch oracle as gr_components_star (merge ≡ " +
        "recompute, bit-for-bit)."),
      "ts_forecast_les" -> ("Brown's LES forecast + backtest: S1, S2 = EWMA-of-EWMA and the scoring lead() all share " +
        "ONE hash exchange (same partition + sort — Spark chains the three Window ops on a single shuffle); absolute " +
        "errors micro-quantize BEFORE the per-tag sum, so the MAE aggregate is order-free integers."))
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of representative queries\n\n")
    sb.append("Generated by `graft.examples.PlanDump` (sf0.01, AQE on, 8 shuffle partitions).\n")
    sb.append("For each query: why the plan is the one we want at 100 TB, then the\n")
    sb.append("executed plan tree with scan details (`PushedFilters`/`ReadSchema`).\n")
    picks.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count() // let AQE finalize
      val tree = df.queryExecution.executedPlan.toString
      val trimmed = tree.linesIterator.take(40).map(_.replaceAll("#\\d+L?", "")).mkString("\n")
      sb.append(s"\n## $name\n\n$note\n\n```\n$trimmed\n```\n")
    }
    // Everything after the PERSISTENT marker (hand-written analyses —
    // scale probes, variance notes) survives regeneration verbatim.
    val marker = "<!-- PERSISTENT -->"
    val plansPath = Paths.get("PLANS.md")
    if (Files.exists(plansPath)) {
      val old = new String(Files.readAllBytes(plansPath), "UTF-8")
      val i = old.indexOf(marker)
      if (i >= 0) sb.append("\n").append(old.substring(i))
    }
    Files.write(plansPath, sb.toString.getBytes("UTF-8"))
    println("PLANS.md written")
    spark.stop()
  }
}
