package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus-curation operators — the steps a training-data pipeline runs
  * AFTER dedup/quality scoring to assemble the final training set:
  * deterministic sampling, sequence packing, the combined keep-filter,
  * and per-class embedding prototypes. All are declarative plans with
  * engine-portable arithmetic (md5-derived randomness, exact integer
  * means), so every one is DuckDB-oracle-checked.
  */
object Curation {

  /** Deterministic stratified Bernoulli sample: a document is kept iff a
    * uniform hash of its text falls in the lowest `1/d` of the hash space
    * — reproducible across engines and runs (md5, not `rand()`), the
    * property a curation pipeline needs for auditable sampling. Emits the
    * per-stratum audit aggregate (totals + kept + realized rate); strata
    * are length deciles (`n_chars div 100`).
    *
    * Scale shape: one projection + one hash aggregate on the stratum key.
    */
  def stratifiedSample(docs: DataFrame, d: Int = 5): DataFrame =
    docs.select(
        (col("n_chars") / 100).cast("long").as("stratum"),
        (conv(substring(md5(col("text")), 1, 13), 16, 10)
          .cast("long") % d === 0).cast("int").as("kept"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_total"),
        sum(col("kept")).as("n_kept"),
        (sum(col("kept")).cast("double") / count(lit(1)).cast("double"))
          .as("kept_rate"))

  /** Fixed-SIZE per-stratum sample — the deterministic analog of
    * per-group reservoir sampling, and the complement of
    * [[stratifiedSample]]'s fixed-RATE Bernoulli keep: every `source`
    * stratum contributes exactly `min(k, |stratum|)` documents (eval-set
    * carving, per-domain audit panels, human-review batches all want a
    * bounded per-group count, not a rate). Rank stratum members by
    * `md5(doc_id)` (uniform, content-independent, reproducible across
    * engines) and keep the k smallest.
    *
    * Scale shape: one shuffle on the stratum key; the rank-≤-k filter
    * runs as `WindowGroupLimit` (per-partition partial top-k BEFORE the
    * exchange), so each task forwards at most k rows per stratum — the
    * same bounded-state shape as the ANN seeds, never a global sort.
    */
  def reservoirSample(docs: DataFrame, k: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), col("source"))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** Sequence packing: assign documents to fixed token-budget bins — the
    * standard pre-training step that concatenates documents into
    * max-sequence-length rows. Deterministic first-fit in doc_id order
    * WITHIN a hash shard: a single global running sum would serialize the
    * corpus through one task, so packing is sharded (`doc_id % shards`),
    * which is exactly how a distributed packer works — each shard packs
    * independently, bins never span shards. Emits the per-(shard, bin)
    * manifest (doc count, token sum).
    *
    * A document's bin is `floor(cumulative_tokens_before_it / budget)` —
    * documents longer than the budget occupy their own bin(s) boundary.
    */
  def packBins(docs: DataFrame, budget: Int = 2048, shards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("pack_shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        (col("doc_id") % shards).as("pack_shard"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens"))
        .cast("double") / budget).cast("long"))
      .groupBy("pack_shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
  }

  /** The combined curation keep-filter — what actually ships to training:
    * exact-dedup keepers only (min doc_id of each content group), with a
    * token-count floor and a type-token-ratio floor (degenerate/repetitive
    * docs out). One hash shuffle (the content-hash window); the quality
    * metrics are projections.
    */
  def curate(docs: DataFrame, minWords: Int = 10, minTtr: Double = 0.3): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"),
        size(words(col("text"))).cast("long").as("n_words"),
        (size(array_distinct(words(col("text")))).cast("double") /
          size(words(col("text"))).cast("double")).as("ttr"))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("keeper_id") &&
        col("n_words") >= minWords && col("ttr") >= minTtr)
      .select("doc_id", "content_hash", "n_words", "ttr")
  }

  /** Per-label embedding prototypes (class centroids): the per-dimension
    * rounded mean of each label's quantized vectors, emitted as a scalar
    * digest (mod-p polynomial fold over the dimension-ordered means) plus
    * the member count — the class-prototype table a curriculum/balancing
    * stage consumes. Exact integer arithmetic end to end.
    */
  def labelCentroids(emb: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.quantize
    emb.select(col("label"), posexplode(quantize(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("m",
        floor(col("sx").cast("double") / col("n").cast("double") + 0.5).cast("long"))
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vecs"), // n identical across dims of a label
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")),
          lit(0L),
          (acc, x) => pmod(acc * 31 + x, lit(1000000007L))).as("centroid_digest"))
  }

  /** Domain-mixture reweighting: per-source sampling weights that would
    * rebalance the corpus to a uniform source mix — `weight_s =
    * n_total / (n_sources · n_s)` (exact integer product, one IEEE
    * division). The table a mixture-controlled sampler consumes; a real
    * pipeline passes its target fractions instead of uniform.
    *
    * Scale shape: one map-side-combined aggregate on `source` (domain
    * cardinality, tiny) + a 1-row broadcast of the corpus totals.
    */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val totals = perSource.agg(
      sum(col("n_s")).as("n_total"), count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_s"), col("n_total"), col("n_sources"),
        (col("n_total").cast("double") /
          (col("n_sources") * col("n_s")).cast("double")).as("weight"))
  }

  /** Temperature-scaled mixture weights (T = 2): `w_s ∝ √(n_s / N)` — the
    * standard up-weight-the-tail domain mixing rule (uniform mixing at
    * T→∞, proportional at T=1). T=2 is the one temperature whose power is
    * an IEEE-exactly-rounded primitive (`sqrt`), so the whole table is
    * bit-portable to the oracle — arbitrary temperatures would need
    * `pow`, which differs across libm implementations.
    *
    * The normalizing sum folds the per-source weights IN SOURCE ORDER
    * (an ordered list fold, not a parallel aggregate) — double addition
    * is not associative, so only a specified fold order can hash-match.
    * Source cardinality is tiny (domains, not documents): the fold is a
    * 1-row broadcast.
    */
  def temperatureMixWeights(docs: DataFrame): DataFrame = {
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val totals = perSource.agg(sum(col("n_s")).as("n_total"))
    val weighted = perSource.crossJoin(broadcast(totals))
      .withColumn("w_raw",
        sqrt(col("n_s").cast("double") / col("n_total").cast("double")))
    val norm = weighted
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("source"), col("w_raw")))),
          s => s.getField("w_raw")),
        lit(0.0), (acc, x) => acc + x).as("w_sum"))
    weighted.crossJoin(broadcast(norm))
      .select(col("source"), col("n_s"), col("n_total"), col("w_raw"),
        (col("w_raw") / col("w_sum")).as("weight"))
  }

  /** DSIR-shaped importance weights for domain-targeted data selection:
    * score every document under an in-domain bigram model (built from the
    * `targetSource` slice) and under the full-corpus model, and emit the
    * quantized likelihood-ratio proxy `floor(10⁶ · (t+1) / (c+1))` over
    * the two exact integer scores (ppm-quantized transition probabilities,
    * see [[TextAnalysis.bigramLmScore]]; +1 smooths empty scores). High
    * weight = looks like the target domain relative to the corpus — the
    * ranking a targeted sampler consumes.
    *
    * Scale shape: both models are vocabulary-bounded aggregates; the
    * corpus bigrams join each model once (bigram-keyed shuffles); the
    * target model misses on out-of-domain bigrams (left join, 0-fill).
    */
  def dsirWeights(docs: DataFrame, targetSource: String): DataFrame = {
    val bigrams = TextAnalysis.docBigrams(docs)
    def model(bg: DataFrame): DataFrame = {
      val b = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bigram"))
      val p = b.groupBy("w1").agg(sum(col("c_bigram")).as("c_prefix"))
      b.join(p, "w1")
        .select(col("w1"), col("w2"),
          floor(col("c_bigram").cast("double") * lit(1000000.0) /
            col("c_prefix").cast("double")).cast("long").as("q"))
    }
    val targetIds = docs.where(col("source") === targetSource).select("doc_id")
    val corpusModel = model(bigrams)
    val targetModel = model(bigrams.join(targetIds, "doc_id"))
      .withColumnRenamed("q", "qt")
    bigrams
      .join(corpusModel, Seq("w1", "w2"))
      .join(targetModel, Seq("w1", "w2"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("qt"), lit(0L))).as("score_target_q"),
        sum(col("q")).as("score_corpus_q"))
      .withColumn("weight_q",
        floor((col("score_target_q") + 1).cast("double") * lit(1000000.0) /
          (col("score_corpus_q") + 1).cast("double")).cast("long"))
  }

  /** The end-to-end curation manifest — the full keep-chain a pre-training
    * run ships, composed from the family's individual operators: exact-
    * dedup keepers ∩ quality floors ([[curate]]) ∩ language filter ∩
    * NOT contaminated ([[decontaminate]]) ∩ not in the eval set, then
    * hash-sharded and cut at a per-shard token budget (first-fit in
    * doc_id order within the shard, like [[packBins]]). Emits one row per
    * shipped document: (doc_id, shard, n_tokens, cum_tokens).
    *
    * Scale shape: every stage is a filter/anti-join over the same corpus
    * scan — one content-hash window, one broadcast-semi contamination
    * probe, one per-shard running-sum window on the (tiny) surviving set.
    * The budget cut runs AFTER all filters, so the windowed set is the
    * curated corpus, not the raw one.
    */
  def manifest(docs: DataFrame, evalMod: Int = 20, minWords: Int = 10,
      minTtr: Double = 0.3, lang: String = "en", shards: Int = 8,
      budgetPerShard: Long = 1500L): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    val base = docs.select(col("doc_id"), col("lang"),
        md5(col("text")).as("content_hash"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        (size(array_distinct(words(col("text")))).cast("double") /
          size(words(col("text"))).cast("double")).as("ttr"))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
    val quality = base.where(col("doc_id") === col("keeper_id") &&
      col("n_tokens") >= minWords && col("ttr") >= minTtr &&
      col("lang") === lang && col("doc_id") % evalMod =!= 0)
    val contaminated = decontaminate(docs, evalMod).select("doc_id")
    val kept = quality.join(contaminated, Seq("doc_id"), "left_anti")
    val ws = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept
      .withColumn("shard",
        pmod(conv(substring(col("content_hash"), 1, 13), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(ws))
      .where(col("cum_tokens") <= budgetPerShard)
      .select("doc_id", "shard", "n_tokens", "cum_tokens")
  }

  /** Benchmark decontamination: find training documents that share any
    * word 3-gram with a held-out eval set — the standard pre-training
    * step that keeps benchmark text out of the training corpus. The eval
    * membership rule here is deterministic (`doc_id % evalMod == 0`)
    * so the oracle reproduces it; a real pipeline passes its benchmark
    * table instead.
    *
    * Scale shape: the eval set is tiny relative to the corpus (benchmark
    * suites are megabytes against 100 TB), so its distinct shingles are
    * BROADCAST and the train side probes them with a broadcast left-semi
    * join — the corpus is never shuffled on shingle. The only wide
    * exchange is the per-doc hit aggregate, keyed on `doc_id`, which
    * reuses the partitioning [[Dedup.shingleSet]]'s window already
    * established. Emits only contaminated docs (small at scale).
    */
  def decontaminate(docs: DataFrame, evalMod: Int = 20): DataFrame = {
    val sh = Dedup.shingleSet(docs)
    val isEval = col("doc_id") % evalMod === 0
    val evalShingles = sh.where(isEval).select("shingle").distinct()
    val train = sh.where(!isEval)
    val perDoc = train
      .join(broadcast(evalShingles).withColumn("__hit", lit(1)),
        Seq("shingle"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
    perDoc.where(col("n_hits") > 0)
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_shingles").cast("double"))
          .as("hit_ratio"))
  }

  /** Corpus snapshot diff — the dataset-versioning primitive a release
    * pipeline runs between two corpus builds: per-document status
    * (`unchanged` / `changed` / `added` / `removed`) from a full outer
    * join on the document key comparing content digests, plus the digest
    * pair for auditing. Content comparison is md5-hex (engine-portable),
    * never raw text equality over the wire.
    *
    * Scale shape: ONE full-outer hash join on `doc_id` between the two
    * snapshot scans — digests are computed scan-side so only (key, 32-
    * byte hash) rows shuffle, never document bodies; the status column
    * is a projection on top.
    */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val a = oldSnap.select(col("doc_id"), md5(col("text")).as("old_hash"))
    val b = newSnap.select(col("doc_id"), md5(col("text")).as("new_hash"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Greedy k-center coreset selection (Gonzalez's 2-approximation — the
    * geometric "maximally spread subset" every embedding-based data-
    * pruning recipe starts from): seed with the md5-smallest vector, then
    * k−1 rounds of "pick the vector FARTHEST from everything selected so
    * far". Distances are exact integer squared-L2 over the quantized
    * embeddings (‖a−b‖² = ‖a‖² + ‖b‖² − 2·a·b, the codegen'd long-dot
    * kernel), ties break to the smallest vec_id — fully deterministic and
    * engine-portable.
    *
    * Scale shape: each round is ONE corpus scan — the ≤k-row selected set
    * broadcasts, the per-vector min-distance is a projection, and the
    * round's argmax is a map-side-combined `max(struct)` aggregate (one
    * row per partition crosses the network, never a sort). Driver state
    * is the selected set itself: k·dim longs, CONSTANT in corpus size —
    * the same bounded-driver-state contract as the k-means centroid
    * tables ([[Similarity]]). Total cost O(k·n) distance kernels.
    */
  def kcenterSelect(emb: DataFrame, k: Int = 8): DataFrame = {
    import graft.functions.VectorFunctions.{dotLL, quantize}
    val spark = emb.sparkSession
    import spark.implicits._
    val all = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("nrm", dotLL(col("qv"), col("qv")))
    val seed = all
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(1)
      .as[(Long, Array[Long], Long)].collect().head
    // (vec_id, qv, nrm, dist² at selection, selection round)
    var centers = Vector((seed._1, seed._2, seed._3, 0L, 0))
    (1 until k).foreach { r =>
      val sel = broadcast(
        centers.map(c => (c._1, c._2, c._3)).toDF("c_id", "cv", "cnrm"))
      val next = all.crossJoin(sel)
        .select(col("vec_id"), col("qv"), col("nrm"),
          (col("nrm") + col("cnrm") - lit(2L) * dotLL(col("qv"), col("cv")))
            .as("d"))
        .groupBy(col("vec_id"), col("qv"), col("nrm"))
        .agg(min(col("d")).as("dmin"))
        .select(max(struct(col("dmin"), (-col("vec_id")).as("nid"),
          col("vec_id").as("vec_id"), col("qv").as("qv"),
          col("nrm").as("nrm"))).as("m"))
        .select(col("m.vec_id"), col("m.qv"), col("m.nrm"), col("m.dmin"))
        .as[(Long, Array[Long], Long, Long)].collect().head
      centers = centers :+ ((next._1, next._2, next._3, next._4, r))
    }
    centers.map(c => (c._5, c._1, c._4))
      .toDF("sel_round", "vec_id", "dist_sq")
  }

  /** Quality-filter funnel report — the per-stage survival table every
    * curation pipeline ships for observability: one row per filter
    * stage with how many docs entered it, survived it, and died at it.
    * Stage semantics are CASCADED (survive stage i = stages 1..i all
    * hold), so the rows chain: stage i's `n_kept` is stage i+1's
    * `n_in`, and the drops attribute each loss to exactly one stage.
    *
    * All thresholds compare in exact integer form (`10·distinct ≥
    * 3·words`, `chars ≤ 12·words`) — no float ratios, so the oracle
    * matches bit-for-bit. Scale shape: ONE corpus pass into a
    * map-side-combined global aggregate (5 counters — one row crosses
    * the network per partition), then a 4-row `stack`. No shuffle of
    * document data at all.
    */
  def filterFunnel(docs: DataFrame, minWords: Int = 10,
      minTtrTenths: Int = 3, maxMeanWordLen: Int = 12): DataFrame = {
    val ws = words(col("text"))
    val d = docs.select(
      (length(col("text")) > 0).as("b1"),
      size(ws).cast("long").as("nw"),
      size(array_distinct(ws)).cast("long").as("nd"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
    val s1 = col("b1")
    val s2 = s1 && col("nw") >= minWords
    val s3 = s2 && col("nd") * 10 >= col("nw") * minTtrTenths
    val s4 = s3 && col("nc") <= col("nw") * maxMeanWordLen
    d.agg(
        count(lit(1)).as("n0"),
        sum(when(s1, 1L).otherwise(0L)).as("n1"),
        sum(when(s2, 1L).otherwise(0L)).as("n2"),
        sum(when(s3, 1L).otherwise(0L)).as("n3"),
        sum(when(s4, 1L).otherwise(0L)).as("n4"))
      .selectExpr("""stack(4,
        1, 'nonempty',     n0, n1,
        2, 'min_words',    n1, n2,
        3, 'ttr_floor',    n2, n3,
        4, 'word_len_cap', n3, n4) AS (stage_idx, stage, n_in, n_kept)""")
      .withColumn("n_dropped", col("n_in") - col("n_kept"))
  }

  /** Model-based quality filtering — the linear-probe classifier gate
    * (the FineWeb-Edu / quality-classifier pipeline stage): a trained
    * linear model over cheap per-document features scores every doc and
    * the pipeline keeps those above threshold. The WEIGHTS here stand in
    * for an offline-trained probe (the engine contract is the scoring
    * plan, not the coefficients): features are the stopword rate,
    * type-token ratio, capped length, and a penalty for mean word length
    * far from English-typical — each in exact integer milli-units
    * (`a*1000 div b` — no float accumulation), so the score and the gate
    * decision are bit-deterministic and oracle-checkable.
    *
    * Scale shape: ONE projection per document (split + three list
    * aggregates over the row's own words), no shuffle, no UDF — at
    * 100 TB this is a map-only pass that fuses into whatever scan feeds
    * it, exactly how a classifier gate must run ahead of dedup.
    */
  def qualityClassifier(docs: DataFrame, thresholdMilli: Long = 700L): DataFrame = {
    val ws = words(col("text"))
    docs.select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        stopwordCount(col("ws")).cast("long").as("n_stop"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        aggregate(col("ws"), lit(0L), (a, w) => a + length(w)).as("sum_len"))
      .select(col("doc_id"),
        expr("n_stop * 1000 div n_words").as("stop_m"),
        expr("n_distinct * 1000 div n_words").as("ttr_m"),
        expr("sum_len * 1000 div n_words").as("awl_m"),
        least(col("n_words"), lit(400L)).as("len_b"))
      .withColumn("score_m",
        lit(2L) * col("stop_m") + col("ttr_m") + col("len_b") -
          expr("abs(awl_m - 4500) div 10"))
      .select(col("doc_id"), col("score_m"),
        (col("score_m") >= thresholdMilli).as("passes"))
  }
}
