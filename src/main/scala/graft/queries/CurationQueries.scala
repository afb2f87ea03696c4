package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.analytics.Curation

/** Corpus-curation operators (graft.analytics.Curation) plus the
  * oracle-checked salted skew join, as registry queries with DuckDB
  * oracles.
  */
object CurationQueries {

  private val QuantCte =
    """q AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10000 + 0.5) AS BIGINT)) AS v
      | FROM embeddings)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- deterministic stratified Bernoulli sample (audit aggregate) ----
    // ---- fixed-size per-stratum reservoir sample (bounded per-group
    // count, vs cu_sample_stratified's fixed rate) ----
    QueryDef("cu_reservoir",
      (s, dir) => Curation.reservoirSample(Tables.documents(s, dir), k = 50)
        .orderBy("source", "sample_rank"),
      Some("""
        SELECT doc_id, source, rn AS sample_rank FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= 50 ORDER BY source, sample_rank""")),

    QueryDef("cu_sample_stratified",
      (s, dir) => Curation.stratifiedSample(Tables.documents(s, dir), d = 5)
        .orderBy("stratum"),
      Some("""
        WITH k AS (SELECT n_chars // 100 AS stratum,
                     CASE WHEN CAST('0x' || substr(md5(text), 1, 13) AS BIGINT) % 5 = 0
                          THEN 1 ELSE 0 END AS kept
                   FROM documents)
        SELECT stratum, count(*) AS n_total,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               sum(kept) * 1.0 / count(*) AS kept_rate
        FROM k GROUP BY 1 ORDER BY stratum""")),

    // ---- sharded sequence packing into fixed token budgets ----
    QueryDef("cu_pack_bins",
      (s, dir) => Curation.packBins(Tables.documents(s, dir), budget = 2048, shards = 32)
        .orderBy("pack_shard", "bin"),
      Some("""
        WITH t AS (SELECT doc_id, doc_id % 32 AS pack_shard,
                     len(string_split(text, ' ')) AS n_tokens
                   FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS cum FROM t),
        b AS (SELECT pack_shard,
                CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS bin,
                n_tokens FROM c)
        SELECT pack_shard, bin, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        FROM b GROUP BY 1, 2 ORDER BY pack_shard, bin""")),

    // ---- model-based quality gate (linear-probe classifier) ----
    // The FineWeb-Edu-shaped pipeline stage: a linear model over cheap
    // per-doc features scores every document; the pipeline keeps
    // score >= 700 milli-units. Exact integer milli-features (a*1000
    // div b) make score and decision bit-deterministic; the plan is one
    // map-only projection (no shuffle, no UDF) that fuses into the
    // feeding scan at any scale.
    QueryDef("cu_quality_classifier",
      (s, dir) => Curation.qualityClassifier(Tables.documents(s, dir),
        thresholdMilli = 700L)
        .orderBy("doc_id"),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        f AS (SELECT doc_id, len(ws) AS n_words,
                CAST(list_sum(list_transform(ws, x ->
                  CASE WHEN x IN ('the','a','of','and','to','in')
                       THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop,
                len(list_distinct(ws)) AS n_distinct,
                CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT)
                  AS sum_len
              FROM w),
        s AS (SELECT doc_id,
                n_stop * 1000 // n_words AS stop_m,
                n_distinct * 1000 // n_words AS ttr_m,
                sum_len * 1000 // n_words AS awl_m,
                least(n_words, 400) AS len_b
              FROM f)
        SELECT doc_id,
               CAST(2*stop_m + ttr_m + len_b - abs(awl_m - 4500) // 10
                    AS BIGINT) AS score_m,
               2*stop_m + ttr_m + len_b - abs(awl_m - 4500) // 10 >= 700
                 AS passes
        FROM s ORDER BY doc_id""")),

    // ---- the combined keep-filter that ships to training ----
    QueryDef("cu_curate",
      (s, dir) => Curation.curate(Tables.documents(s, dir), minWords = 10, minTtr = 0.3)
        .orderBy("doc_id"),
      Some("""
        WITH q AS (SELECT doc_id, md5(text) AS content_hash,
                     len(string_split(text, ' ')) AS n_words,
                     len(list_distinct(string_split(text, ' '))) * 1.0
                       / len(string_split(text, ' ')) AS ttr,
                     min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id
                   FROM documents)
        SELECT doc_id, content_hash, CAST(n_words AS BIGINT) AS n_words, ttr
        FROM q WHERE doc_id = keeper_id AND n_words >= 10 AND ttr >= 0.3
        ORDER BY doc_id""")),

    // ---- per-label embedding prototypes (class centroids) ----
    QueryDef("cu_label_centroids",
      (s, dir) => Curation.labelCentroids(Tables.embeddings(s, dir))
        .orderBy("label"),
      Some(s"""
        WITH $QuantCte,
        cm AS (SELECT label, i,
                 CAST(floor(CAST(sum(v[i]) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m,
                 count(*) AS n
               FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
               GROUP BY 1, 2)
        SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
               list_reduce(list_prepend(CAST(0 AS BIGINT), list(m ORDER BY i)),
                 (acc, x) -> ((acc * 31 + x) % 1000000007 + 1000000007) % 1000000007)
                 AS centroid_digest
        FROM cm GROUP BY label ORDER BY label""")),

    // ---- salted skew join, oracle-checked against the plain join ----
    // The salt is invisible in the result by construction; the oracle IS
    // the unsalted join, so the gate proves the identity on real data.
    QueryDef("rel_skew_salted",
      (s, dir) => {
        val left = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val right = Tables.orders(s, dir)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        graft.operators.SkewJoin.salted(left, right, "okey", factor = 8)
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("priority")
      },
      Some("""
        SELECT o_orderpriority AS priority, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY priority""")),

    // ---- temperature-scaled mixture weights (T=2: sqrt is IEEE-exact) ----
    // The normalizing sum folds per-source weights IN SOURCE ORDER (double
    // addition is not associative); both engines run the same ordered
    // fold, so even the normalized shares hash-match.
    QueryDef("cu_temperature_mix",
      (s, dir) => Curation.temperatureMixWeights(Tables.documents(s, dir))
        .orderBy("source"),
      Some("""
        WITH p AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM p),
        wr AS (SELECT source, n_s, n_total,
                 sqrt(CAST(n_s AS DOUBLE) / CAST(n_total AS DOUBLE)) AS w_raw
               FROM p CROSS JOIN t),
        nm AS (SELECT list_reduce(
                 list_prepend(CAST(0 AS DOUBLE), list(w_raw ORDER BY source)),
                 (acc, x) -> acc + x) AS w_sum FROM wr)
        SELECT source, n_s, n_total, w_raw, w_raw / w_sum AS weight
        FROM wr CROSS JOIN nm ORDER BY source""")),

    // ---- domain-mixture reweighting (uniform target mix) ----
    QueryDef("cu_mix_weights",
      (s, dir) => Curation.mixtureWeights(Tables.documents(s, dir))
        .orderBy("source"),
      Some("""
        WITH p AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
                     count(*) AS n_sources FROM p)
        SELECT source, n_s, n_total, n_sources,
               CAST(n_total AS DOUBLE) / CAST(n_sources * n_s AS DOUBLE) AS weight
        FROM p CROSS JOIN t ORDER BY source""")),

    // ---- join-key skew profile (the diagnosis that picks SkewJoin) ----
    // One groupBy on the key + one scalar aggregate over the counts: the
    // max/mean ratio that tells an operator whether to salt.
    QueryDef("rel_skew_profile",
      (s, dir) => {
        val counts = Tables.lineitem(s, dir)
          .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
        counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"))
          .select(col("n_keys"), col("n_rows"), col("max_cnt"),
            (col("max_cnt").cast("double") * col("n_keys").cast("double") /
              col("n_rows").cast("double")).as("skew_ratio"))
      },
      Some("""
        WITH c AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1)
        SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
               max(cnt) AS max_cnt,
               CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                 / CAST(sum(cnt) AS DOUBLE) AS skew_ratio
        FROM c""")),

    // ---- the end-to-end curation manifest (full keep-chain + budget) ----
    // Composes dedup-keeper ∩ quality ∩ lang ∩ not-contaminated ∩
    // not-eval, then hash-shards and cuts at a per-shard token budget —
    // the single query a pre-training run materializes as its data
    // manifest.
    QueryDef("cu_manifest",
      (s, dir) => Curation.manifest(Tables.documents(s, dir), evalMod = 20,
        minWords = 10, minTtr = 0.3, lang = "en", shards = 8,
        budgetPerShard = 1500L)
        .orderBy("doc_id"),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        q AS (SELECT d.doc_id AS doc_id, d.lang, md5(d.text) AS content_hash,
                len(ws) AS n_tokens,
                len(list_distinct(ws)) * 1.0 / len(ws) AS ttr,
                min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS keeper_id
              FROM documents d JOIN w ON d.doc_id = w.doc_id),
        keep1 AS (SELECT doc_id, content_hash, n_tokens FROM q
                  WHERE doc_id = keeper_id AND n_tokens >= 10 AND ttr >= 0.3
                    AND lang = 'en' AND doc_id % 20 <> 0),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(ws)-1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
               FROM w WHERE len(ws) >= 3),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        cont AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (s)
                 WHERE sh.doc_id % 20 <> 0),
        kept AS (SELECT k.doc_id, k.content_hash, k.n_tokens
                 FROM keep1 k ANTI JOIN cont c ON k.doc_id = c.doc_id),
        sharded AS (SELECT doc_id, n_tokens,
                      ((CAST('0x' || substr(content_hash, 1, 13) AS BIGINT) % 8)
                        + 8) % 8 AS shard
                    FROM kept),
        c AS (SELECT doc_id, shard, n_tokens,
                sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum_tokens
              FROM sharded)
        SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens <= 1500 ORDER BY doc_id""")),

    // ---- benchmark decontamination (eval-set 3-gram overlap) ----
    QueryDef("cu_decontaminate",
      (s, dir) => Curation.decontaminate(Tables.documents(s, dir), evalMod = 20)
        .orderBy("doc_id"),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(ws)-1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
               FROM w WHERE len(ws) >= 3),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        a AS (SELECT tr.doc_id, count(*) AS n_shingles,
                CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hits
              FROM tr LEFT JOIN ev ON tr.s = ev.s GROUP BY 1)
        SELECT doc_id, n_shingles, n_hits,
               n_hits * 1.0 / n_shingles AS hit_ratio
        FROM a WHERE n_hits > 0 ORDER BY doc_id""")),

    // ---- corpus snapshot diff (dataset versioning) ----
    // Full-outer digest compare between two corpus builds; the synthetic
    // second snapshot deterministically removes (doc_id%17=3), rewrites
    // (doc_id%10=0), and adds (doc_id%25=0, shifted key) documents so all
    // four statuses appear. Only (key, hash) rows ever shuffle.
    QueryDef("cu_corpus_diff",
      (s, dir) => {
        val old = Tables.documents(s, dir)
        val newSnap = old
          .where(col("doc_id") % 17 =!= 3)
          .withColumn("text",
            when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(old.where(col("doc_id") % 25 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000L))
        Curation.corpusDiff(old, newSnap).orderBy("doc_id")
      },
      Some("""
        WITH oldc AS (SELECT doc_id, md5(text) AS h FROM documents),
        newc AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 17 <> 3
          UNION ALL
          SELECT doc_id + 1000000, md5(text)
          FROM documents WHERE doc_id % 25 = 0)
        SELECT COALESCE(oldc.doc_id, newc.doc_id) AS doc_id,
               oldc.h AS old_hash, newc.h AS new_hash,
               CASE WHEN oldc.h IS NULL THEN 'added'
                    WHEN newc.h IS NULL THEN 'removed'
                    WHEN oldc.h = newc.h THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM oldc FULL OUTER JOIN newc ON oldc.doc_id = newc.doc_id
        ORDER BY doc_id""")),

    // ---- benchmark decontamination, embedding-space variant ----
    // Max cosine vs the broadcast eval set; catches the paraphrase-shaped
    // contamination the 3-gram check (cu_decontaminate) misses. Same
    // max(struct) argmax shape as the IVF assignment — corpus never
    // shuffled.
    QueryDef("cu_embed_decontaminate",
      (s, dir) => graft.analytics.Similarity.embedDecontaminate(
        Tables.embeddings(s, dir), threshold = 0.35, evalModulo = 20)
        .orderBy("vec_id"),
      Some(s"""
        WITH $QuantCte,
        qn AS (SELECT vec_id, v,
                 list_sum(list_transform(v, x -> x*x)) AS nrm FROM q),
        ev AS (SELECT vec_id AS eval_id, v AS evv, nrm AS enrm
               FROM qn WHERE vec_id % 20 = 0),
        tr AS (SELECT vec_id, v, nrm FROM qn WHERE vec_id % 20 <> 0),
        sc AS (SELECT tr.vec_id, ev.eval_id,
                 list_sum(list_transform(range(1, len(tr.v)+1),
                   i -> tr.v[i]*ev.evv[i])) * 1.0
                   / (sqrt(tr.nrm) * sqrt(ev.enrm)) AS cos
               FROM tr CROSS JOIN ev),
        rk AS (SELECT vec_id, eval_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, eval_id) AS rn
               FROM sc)
        SELECT vec_id, eval_id, cos AS max_cos,
               CAST(CASE WHEN cos >= 0.35 THEN 1 ELSE 0 END AS INT)
                 AS contaminated
        FROM rk WHERE rn = 1 ORDER BY vec_id""")),

    // ---- dataset card: per-source corpus statistics manifest ----
    // The summary table a data release ships: volume, language spread,
    // length distribution, within-source redundancy. ONE map-side-combined
    // aggregate over the corpus (percentile is the only sort-based part).
    QueryDef("cu_dataset_card",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          expr("percentile(n_chars, 0.5)").as("p50_chars"),
          countDistinct(md5(col("text"))).as("n_uniq"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("total_chars"),
          (col("total_chars").cast("double") / col("n_docs").cast("double"))
            .as("avg_chars"),
          col("p50_chars"),
          (col("n_docs") - col("n_uniq")).as("n_redundant"),
          ((col("n_docs") - col("n_uniq")).cast("double") /
            col("n_docs").cast("double")).as("dup_frac"))
        .orderBy("source"),
      Some("""
        SELECT source, count(*) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
               quantile_cont(n_chars, 0.5) AS p50_chars,
               CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_redundant,
               CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE) AS dup_frac
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- deterministic train/val/test split (90/5/5) ----
    // Content-independent hash split on the doc id — stable under corpus
    // re-shuffles and re-runs, the property a reproducible data release
    // needs (same md5-bucket idiom as cu_sample_stratified). Pure
    // projection; the split never shuffles the corpus.
    QueryDef("cu_train_val_split",
      (s, dir) => {
        val bucket = (conv(substring(md5(
          concat(lit("split:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
          .cast("long") % 100).as("bucket")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), bucket)
          .withColumn("split",
            when(col("bucket") < 90, "train")
              .when(col("bucket") < 95, "val").otherwise("test"))
          .orderBy("doc_id")
      },
      Some("""
        WITH b AS (SELECT doc_id, source,
                     CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 13)
                          AS BIGINT) % 100 AS bucket
                   FROM documents)
        SELECT doc_id, source, bucket,
               CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        FROM b ORDER BY doc_id""")),

    // ---- token budget curve: cumulative tokens by quality rank ----
    // Sort the corpus best-first (stopword-evidence quality proxy, doc_id
    // tiebreak), cut into deciles, report per-decile and cumulative token
    // counts — the table that answers "how many tokens survive if we keep
    // only the best X%". The per-doc sort is the one wide operation; the
    // decile rollup is 10 rows.
    QueryDef("cu_budget_curve",
      (s, dir) => {
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            graft.functions.TextFunctions.stopwordCount(
              split(col("text"), " ")).cast("long").as("q_score"))
        // GLOBAL rank without a single-task global window: range-partition
        // on the sort key (parallel sort), rank locally per partition, and
        // add broadcast per-partition offsets — the distributed total-order
        // index pattern. Range boundaries may vary run to run; the final
        // index cannot (offsets correct for any split points).
        val parted = scored
          .repartitionByRange(32, col("q_score").desc, col("doc_id"))
          .withColumn("pid", spark_partition_id())
        val local = Window.partitionBy(col("pid"))
          .orderBy(col("q_score").desc, col("doc_id"))
        val withLocal = parted.withColumn("lrn", row_number().over(local))
        // ≤32 rows: this tiny window is driver-scale metadata, not data
        val offsets = withLocal.groupBy("pid").agg(count(lit(1)).as("cnt"))
          .withColumn("offset",
            coalesce(sum(col("cnt")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val n = scored.agg(count(lit(1)).as("n_total"))
        val ranked = withLocal.join(broadcast(offsets.select("pid", "offset")), "pid")
          .withColumn("rn", col("offset") + col("lrn"))
          .crossJoin(broadcast(n))
          .withColumn("decile",
            (lit(1) + expr("(rn - 1) * 10 div n_total")).cast("int"))
        val cum = Window.orderBy(col("decile"))
        ranked.groupBy("decile")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("decile_tokens"))
          .withColumn("cum_tokens",
            sum(col("decile_tokens")).over(
              cum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("decile")
      },
      Some("""
        WITH sc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                      CAST(list_sum(list_transform(string_split(text, ' '),
                        x -> CASE WHEN x IN ('the','a','of','and','to','in')
                                  THEN 1 ELSE 0 END)) AS BIGINT) AS q_score
                    FROM documents),
        n AS (SELECT count(*) AS n_total FROM sc),
        dec AS (SELECT sc.*, CAST(1 + (row_number() OVER (ORDER BY q_score DESC, doc_id) - 1)
                       * 10 // n_total AS INT) AS decile
                FROM sc CROSS JOIN n),
        agg AS (SELECT decile, count(*) AS n_docs,
                  CAST(sum(n_tokens) AS BIGINT) AS decile_tokens
                FROM dec GROUP BY 1)
        SELECT decile, n_docs, decile_tokens,
               CAST(sum(decile_tokens) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens
        FROM agg ORDER BY decile""")),

    // ---- curriculum schedule: easy→hard training stages ----
    // Orders the corpus by an exact integer difficulty proxy (mean token
    // length in thousandths — longer words ≈ harder text) and cuts it
    // into 5 curriculum stages. Reuses the distributed total-order-index
    // pattern (range partition → local rank → broadcast offsets): the
    // global sort is the one wide operation, stage stats are 5 rows. The
    // same shape emits the per-doc schedule when the rollup is dropped.
    QueryDef("cu_curriculum",
      (s, dir) => {
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_len"))
          .withColumn("difficulty", expr("n_len * 1000 div n_tokens"))
        val parted = scored
          .repartitionByRange(32, col("difficulty"), col("doc_id"))
          .withColumn("pid", spark_partition_id())
        val local = Window.partitionBy(col("pid"))
          .orderBy(col("difficulty"), col("doc_id"))
        val withLocal = parted.withColumn("lrn", row_number().over(local))
        // ≤32 rows — driver-scale metadata, not data
        val offsets = withLocal.groupBy("pid").agg(count(lit(1)).as("cnt"))
          .withColumn("offset",
            coalesce(sum(col("cnt")).over(Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val n = scored.agg(count(lit(1)).as("n_total"))
        withLocal.join(broadcast(offsets.select("pid", "offset")), "pid")
          .withColumn("rn", col("offset") + col("lrn"))
          .crossJoin(broadcast(n))
          .withColumn("stage", (lit(1) + expr("(rn - 1) * 5 div n_total")).cast("int"))
          .groupBy("stage")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("stage_tokens"),
            min(col("difficulty")).as("min_difficulty"),
            max(col("difficulty")).as("max_difficulty"))
          .orderBy("stage")
      },
      Some("""
        WITH sc AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                      CAST(len(text) AS BIGINT) * 1000
                        // CAST(len(string_split(text, ' ')) AS BIGINT) AS difficulty
                    FROM documents),
        n AS (SELECT count(*) AS n_total FROM sc),
        st AS (SELECT sc.*,
                 CAST(1 + (row_number() OVER (ORDER BY difficulty, doc_id) - 1)
                   * 5 // n_total AS INT) AS stage
               FROM sc CROSS JOIN n)
        SELECT stage, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS stage_tokens,
               min(difficulty) AS min_difficulty,
               max(difficulty) AS max_difficulty
        FROM st GROUP BY 1 ORDER BY stage""")),

    // ---- per-epoch deterministic training shuffle ----
    // Each epoch gets its own content-independent global permutation
    // (shuffle key = md5(epoch_seed ‖ doc_id)) cut into 8 shards by the
    // key's leading 16 bits — epochs de-correlate without coordination:
    // any worker recomputes its shard membership from (epoch, doc_id)
    // alone, so at 100 TB the "shuffle" is one deterministic hash
    // bucketing per epoch, no central order to materialize. The manifest
    // row per (epoch, shard) carries the key range as the audit that the
    // permutations are reproducible AND differ across epochs.
    QueryDef("cu_epoch_shuffle",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        Seq(1, 2).map { ep =>
          docs.withColumn("epoch", lit(ep))
            .withColumn("skey",
              md5(concat(lit(s"ep$ep:"), col("doc_id").cast("string"))))
        }.reduce(_ unionAll _)
          .withColumn("shard",
            expr("CAST(conv(substr(skey, 1, 4), 16, 10) AS BIGINT) % 8"))
          .groupBy("epoch", "shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("shard_tokens"),
            min(col("skey")).as("first_key"), max(col("skey")).as("last_key"))
          .orderBy("epoch", "shard")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
        e AS (SELECT 1 AS epoch, doc_id, n_tokens,
                     md5('ep1:' || CAST(doc_id AS VARCHAR)) AS skey FROM d
              UNION ALL
              SELECT 2, doc_id, n_tokens,
                     md5('ep2:' || CAST(doc_id AS VARCHAR)) FROM d),
        sh AS (SELECT epoch,
                      CAST('0x' || substr(skey, 1, 4) AS BIGINT) % 8 AS shard,
                      n_tokens, skey
               FROM e)
        SELECT epoch, shard, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
               min(skey) AS first_key, max(skey) AS last_key
        FROM sh GROUP BY 1, 2 ORDER BY epoch, shard"""))
    ,

    // ---- greedy k-center coreset selection (Gonzalez 2-approx) ----
    // The "maximally spread subset" of embedding-based data pruning: seed
    // with the md5-smallest vector, then 7 rounds of farthest-point
    // selection under exact integer squared-L2 (ties → smallest vec_id).
    // Each round: broadcast ≤k selected rows, one corpus scan, one
    // map-side-combined argmax — driver state k·dim longs, constant in
    // corpus size. The oracle unrolls the 8 rounds as CTEs.
    QueryDef("cu_kcenter",
      (s, dir) => Curation.kcenterSelect(Tables.embeddings(s, dir), k = 8)
        .orderBy("sel_round"),
      Some {
        val dot = "list_sum(list_transform(range(1, len(a.v)+1), " +
          "j -> a.v[j] * c.v[j]))"
        val rounds = (1 to 7).map { i =>
          val p = i - 1
          s"""d$i AS (SELECT a.vec_id, a.v, a.nrm,
                 CAST(min(a.nrm + c.nrm - 2 * $dot) AS BIGINT) AS dmin
               FROM qn a, sel$p c GROUP BY a.vec_id, a.v, a.nrm),
          s$i AS (SELECT vec_id, v, nrm, dmin AS d, $i AS r FROM d$i
                  ORDER BY dmin DESC, vec_id LIMIT 1),
          sel$i AS (SELECT * FROM sel$p UNION ALL SELECT * FROM s$i)"""
        }.mkString(",\n        ")
        s"""
        WITH $QuantCte,
        qn AS (SELECT vec_id, v,
                 CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS nrm
               FROM q),
        sel0 AS (SELECT vec_id, v, nrm, CAST(0 AS BIGINT) AS d, 0 AS r
                 FROM qn ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                 LIMIT 1),
        $rounds
        SELECT r AS sel_round, vec_id, d AS dist_sq
        FROM sel7 ORDER BY sel_round"""
      }),

    // ---- quality-filter funnel (per-stage survival report) ----
    // Cascaded filter observability: one row per stage, n_kept of stage
    // i is n_in of stage i+1. One corpus pass, 5 global counters, no
    // data shuffle; thresholds in exact integer form.
    QueryDef("cu_filter_funnel",
      (s, dir) => Curation.filterFunnel(Tables.documents(s, dir))
        .orderBy("stage_idx"),
      Some("""
        WITH d AS (SELECT length(text) > 0 AS b1,
                     len(string_split(text, ' ')) AS nw,
                     len(list_distinct(string_split(text, ' '))) AS nd,
                     length(replace(text, ' ', '')) AS nc
                   FROM documents),
        s AS (SELECT count(*) AS n0,
                CAST(sum(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN b1 AND nw >= 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                CAST(sum(CASE WHEN b1 AND nw >= 10 AND nd*10 >= nw*3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                CAST(sum(CASE WHEN b1 AND nw >= 10 AND nd*10 >= nw*3
                              AND nc <= nw*12
                         THEN 1 ELSE 0 END) AS BIGINT) AS n4
              FROM d)
        SELECT * FROM (
          SELECT 1 AS stage_idx, 'nonempty' AS stage,
                 n0 AS n_in, n1 AS n_kept, n0 - n1 AS n_dropped FROM s
          UNION ALL SELECT 2, 'min_words', n1, n2, n1 - n2 FROM s
          UNION ALL SELECT 3, 'ttr_floor', n2, n3, n2 - n3 FROM s
          UNION ALL SELECT 4, 'word_len_cap', n3, n4, n3 - n4 FROM s)
        ORDER BY stage_idx""")),

    // ---- right-to-be-forgotten deletion audit ----
    // The compliance primitive every corpus store needs (GDPR art. 17 /
    // CCPA delete): given a deletion list (doc_id % 97 = 0 simulates the
    // request queue), produce the per-source audit — how many rows were
    // subject, deleted, retained — plus an order-free FINGERPRINT of the
    // exact retained id set (md5 over the numerically-sorted id list),
    // which is what a downstream rebuild verifies against. One anti-join
    // + one source-keyed rollup; the deletion list broadcasts at any
    // corpus scale.
    QueryDef("cu_forget_audit",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val del = col("doc_id") % 97 === 0
        docs
          .withColumn("deleted", del)
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("deleted"), 1L).otherwise(0L)).as("n_deleted"),
            sum(when(!col("deleted"), 1L).otherwise(0L)).as("n_retained"),
            // a source with ZERO retained rows must fingerprint as NULL
            // (DuckDB's FILTERed string_agg over no rows), not md5("")
            when(sum(when(!col("deleted"), 1L).otherwise(0L)) > 0,
              md5(array_join(transform(
                sort_array(collect_list(when(!col("deleted"), col("doc_id")))),
                x => x.cast("string")), ","))).as("retained_fingerprint"))
          .orderBy("source")
      },
      Some("""
        SELECT source, count(*) AS n_total,
               CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_deleted,
               CAST(sum(CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_retained,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                   FILTER (WHERE doc_id % 97 <> 0)) AS retained_fingerprint
        FROM documents GROUP BY source ORDER BY source"""))
  )
}
