package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.analytics.{Dedup, Similarity, TextAnalysis}

/** Operator-level specs for the training-data-pipeline analytics
  * (dedup / similarity / text analysis) on constructed fixtures plus the
  * sf0.001 driver tables.
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-analytics-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def docsFixture = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", 49L),
      (1L, "the quick brown fox jumps over the lazy dog today", 49L), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat today", 49L), // near dup of 0
      (3L, "completely different words about spark engines and parquet files", 64L))
      .toDF("doc_id", "text", "n_chars")
  }

  test("exact dedup groups identical texts and keeps min doc_id") {
    val r = Dedup.exact(docsFixture).collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4))).sortBy(_._1)
    assert(r(0) === ((0L, 0L, 2L, 0)))  // keeper
    assert(r(1) === ((1L, 0L, 2L, 1)))  // dup of 0
    assert(r(2)._3 === 1L && r(3)._3 === 1L)
  }

  test("jaccard pairs find the near-duplicate, not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docsFixture, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))  // exact dup: jaccard 1.0
    assert(keys.contains((0L, 2L)) || keys.contains((1L, 2L))) // near dup
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == ((0L, 1L))).get._3 === 1.0)
  }

  test("jaccard DF cap drops ultra-common shingles from candidates and sizes") {
    import spark.implicits._
    // docs 0-3 all share the stop-phrase shingle "x y z" (df = 4); docs 0,1
    // additionally share rare content. With maxShingleDf = 3 the common
    // shingle is excluded, so only (0,1) can pair — and their jaccard is
    // computed over the CAPPED universe (stop shingles don't count toward
    // sizes either).
    val docs = Seq(
      (0L, "x y z alpha beta gamma delta", 27L),
      (1L, "x y z alpha beta gamma delta", 27L),
      (2L, "x y z unrelated words entirely here", 35L),
      (3L, "x y z other stuff altogether now", 32L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Dedup.jaccardPairs(docs, 0.5, maxShingleDf = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs.keySet === Set((0L, 1L)))
    assert(pairs(((0L, 1L))) === 1.0) // identical capped shingle sets
    // with the cap above every df, the stop shingle pairs everything
    val uncapped = Dedup.jaccardPairs(docs, 0.0, maxShingleDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size === 6) // all C(4,2) pairs share "x y z"
  }

  test("minhash LSH candidates include the exact duplicate with full signature match") {
    val cand = Dedup.minhashCandidates(docsFixture, k = 12, bands = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cand(((0L, 1L))) === 12L) // identical shingle sets → all seeds match
    assert(!cand.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("duplicate clusters label the connected component with its min doc_id") {
    val clusters = Dedup.duplicateClusters(docsFixture, 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0, 1 (exact dup) and 2 (near dup) form one component labeled 0
    assert(clusters === Map(0L -> 0L, 1L -> 0L, 2L -> 0L)) // doc 3 unpaired → absent
  }

  test("distributed min-label fixpoint matches driver union-find exactly") {
    // driverEdgeLimit = 0 forces the distributed branch on the same input
    val driver = Dedup.duplicateClusters(docsFixture, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Dedup.duplicateClusters(docsFixture, 0.5,
      driverEdgeLimit = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(driver.nonEmpty)
    assert(dist === driver)
    // the byte-aware default cutoff is positive and bounded
    assert(Dedup.maxDriverEdges > 0L && Dedup.maxDriverEdges <= 10000000L)
  }

  test("simhash pairs the identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docsFixture, maxHamming = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs(((0L, 1L))) === 0L)
  }

  test("quantized_dot registers as a SQL function and matches the Column API") {
    graft.expressions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_sql_test")
    val viaSql = spark.sql(
      """SELECT a.vec_id, quantized_dot(a.embedding, b.embedding) AS d
        |FROM emb_sql_test a JOIN emb_sql_test b ON b.vec_id = 0
        |ORDER BY a.vec_id""".stripMargin).collect().map(r => (r.getLong(0), r.getLong(1)))
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf).limit(10)
    val q0 = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val viaColumn = e.crossJoin(q0)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dotQF(col("embedding"), col("qv")).as("d"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq === viaColumn.toSeq)
    assert(viaSql.nonEmpty)
  }

  test("simhash SQL functions match the DataFrame fingerprint path") {
    graft.expressions.GraftFunctions.register(spark)
    docsFixture.createOrReplaceTempView("docs_simhash_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, fp.fp_hi AS fp_hi, fp.fp_lo AS fp_lo FROM (
        |  SELECT doc_id, simhash_fingerprint(md5_bit_parity(w)) AS fp
        |  FROM (SELECT doc_id, explode(split(text, ' ')) AS w FROM docs_simhash_sql)
        |  GROUP BY doc_id) ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaDF = Dedup.simhashFingerprints(docsFixture)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.toSeq === viaDF.toSeq)
    assert(viaSql.length === 4)
    assert(viaSql(0)._2 === viaSql(1)._2 && viaSql(0)._3 === viaSql(1)._3) // exact dups agree
  }

  test("GraftExtensions injects all native functions without error") {
    // the config-driven end-to-end path (a session BUILT with
    // spark.sql.extensions) is exercised by SqlFunctionDemo in its own JVM;
    // here we verify the injection hook itself accepts every descriptor
    new graft.expressions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("brute-force ANN returns k ranked neighbors per query on sf0.001") {
    val r = Similarity.bruteForceTopK(Tables.embeddings(spark, sf), k = 5, queryModulo = 100)
    val got = r.collect()
    val perQuery = got.groupBy(_.getLong(0))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (_, rows) =>
      assert(rows.length === 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      // ranks ordered by descending cosine
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF ANN neighbors are a subset of brute-force candidates' space") {
    val ivf = Similarity.ivfTopK(Tables.embeddings(spark, sf), k = 3,
      queryModulo = 100, numCentroids = 64).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(rows.forall(_.getLong(2) != q)) // never self
    }
  }

  test("language ID predicts en for the-heavy text and und for markerless text") {
    import spark.implicits._
    val df = Seq(
      (0L, "the cat and the dog of the house", 32L),
      (1L, "xyzzy plugh quux", 16L)).toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.langId(df).collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(r(0L) === "en")
    assert(r(1L) === "und")
  }

  test("quality + token stats are exact on a known sentence") {
    import spark.implicits._
    val df = Seq((0L, "the the fox", 11L)).toDF("doc_id", "text", "n_chars")
    val q = TextAnalysis.quality(df).collect()(0)
    assert(q.getAs[Long]("n_words") === 3L)
    assert(q.getAs[Long]("n_stopwords") === 2L)
    assert(q.getAs[Long]("n_distinct") === 2L)
    val t = TextAnalysis.tokenStats(df).collect()(0)
    assert(t.getLong(1) === 3L && t.getLong(2) === 2L)
  }

  test("LSH ANN buckets are consistent: neighbors share the query's bucket and never self-match") {
    val lsh = Similarity.lshTopK(Tables.embeddings(spark, sf), k = 3,
      queryModulo = 100, nPlanes = 8).collect()
    assert(lsh.nonEmpty)
    lsh.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(rows.forall(_.getLong(2) != q))
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("BPE pre-tokenizer stats are exact on a known sentence") {
    import spark.implicits._
    // lower("Ab1, cd!") → tokens: "ab","1",",","cd","!" — 5 tokens, 5 types
    val df = Seq((0L, "Ab1, cd!", 8L), (1L, "", 0L)).toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.bpeTokenStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r(0L) === ((5L, 5L, 2L)))
    assert(r(1L) === ((0L, 0L, 0L))) // empty text → zero counts, no null
  }

  private def annPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe LSH recall meets or beats single-probe against brute force") {
    val emb = Tables.embeddings(spark, sf)
    val truth = annPairs(Similarity.bruteForceTopK(emb, k = 5, queryModulo = 20))
    val single = annPairs(Similarity.lshTopK(emb, k = 5, queryModulo = 20, nPlanes = 8))
    val multi = annPairs(Similarity.lshTopKMultiProbe(emb, k = 5, queryModulo = 20, nPlanes = 8))
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(rMulti > 0.0)
    // multi-probe scans strictly more candidates than single-probe
    assert(multi.size >= single.size)
  }

  test("vector quality audit flags zero vectors and saturated components") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0.0f, 0.0f), 1),
      (1L, Array(0.5f, -3.0f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.vectorQuality(df).collect()
      .map(row => row.getLong(0) -> row).toMap
    assert(r(0L).getAs[Int]("is_degenerate") === 1)
    assert(r(0L).getAs[Long]("n_zero") === 2L)
    assert(r(1L).getAs[Int]("is_degenerate") === 0)
    assert(r(1L).getAs[Long]("n_zero") === 0L)
    assert(r(1L).getAs[Long]("max_abs_q") === 30000L)
    assert(r(1L).getAs[Long]("nrm") === 5000L * 5000 + 30000L * 30000)
  }

  test("multi-probe IVF k-means recall meets or beats single-probe against brute force") {
    val emb = Tables.embeddings(spark, sf)
    val truth = annPairs(Similarity.bruteForceTopK(emb, k = 5, queryModulo = 20))
    val single = annPairs(Similarity.kmeansIvfTopK(emb, k = 5,
      queryModulo = 20, numCentroids = 64, iters = 2))
    val multi = annPairs(Similarity.kmeansIvfTopKMultiProbe(emb, k = 5,
      queryModulo = 20, numCentroids = 64, iters = 2, nProbe = 2))
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    // the probe set contains the top-1 bucket, and candidates only rank by
    // true cosine — recall can never decrease
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(multi.size >= single.size)
  }

  test("k-means IVF refines centroids and still returns valid neighbors") {
    val emb = Tables.embeddings(spark, sf)
    val refined = Similarity.kmeansIvfTopK(emb, k = 5, queryModulo = 20,
      numCentroids = 64, iters = 2)
    val rows = refined.collect()
    assert(rows.nonEmpty)
    // deterministic: two runs produce the identical result
    val again = Similarity.kmeansIvfTopK(emb, k = 5, queryModulo = 20,
      numCentroids = 64, iters = 2).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // ranks are 1..k per query, no self-neighbors
    rows.foreach { r =>
      assert(r.getLong(0) !== r.getLong(2))
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 5)
    }
  }

  test("reservoir sample keeps exactly k per stratum, deterministically") {
    import spark.implicits._
    val docs = (0 until 40).map(i =>
      (i.toLong, s"t$i", if (i % 2 == 0) "a" else "b", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r1 = graft.analytics.Curation.reservoirSample(docs, k = 5).collect()
    assert(r1.length === 10)
    val bySrc = r1.groupBy(_.getString(1))
    assert(bySrc("a").length === 5 && bySrc("b").length === 5)
    assert(bySrc("a").map(_.getInt(2)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    // content-independent and reproducible: a second run is identical
    val r2 = graft.analytics.Curation.reservoirSample(docs, k = 5).collect()
    assert(r1.map(_.toString).sorted.toSeq === r2.map(_.toString).sorted.toSeq)
  }

  test("curation keep-filter drops exact dupes and low-quality docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 57L),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 57L), // dup of 0
      (2L, "word word word word word word word word word word", 49L),        // ttr 0.1
      (3L, "too short", 9L))                                                 // n_words 2
      .toDF("doc_id", "text", "n_chars")
    val kept = graft.analytics.Curation.curate(docs, minWords = 10, minTtr = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L)) // 1 loses dedup, 2 loses ttr, 3 loses length
  }

  test("pack bins respect the token budget boundary within each shard") {
    import spark.implicits._
    // one shard (doc_id % 32 distinct per doc here — force one shard via ids 0,32,64)
    val docs = Seq(
      (0L, Seq.fill(1500)("w").mkString(" "), 1L),
      (32L, Seq.fill(1000)("w").mkString(" "), 1L),
      (64L, Seq.fill(600)("w").mkString(" "), 1L))
      .toDF("doc_id", "text", "n_chars")
    val bins = graft.analytics.Curation.packBins(docs, budget = 2048, shards = 32)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // doc0 starts at 0 → bin 0; doc32 starts at 1500 → bin 0; doc64 starts at 2500 → bin 1
    assert(bins.toSeq === Seq((0L, 2L, 2500L), (1L, 1L, 600L)))
  }

  test("stratified sample is deterministic across runs") {
    val d1 = graft.analytics.Curation.stratifiedSample(Tables.documents(spark, sf))
      .collect().map(_.toString).sorted.toSeq
    val d2 = graft.analytics.Curation.stratifiedSample(Tables.documents(spark, sf))
      .collect().map(_.toString).sorted.toSeq
    assert(d1 === d2 && d1.nonEmpty)
  }

  test("KMV sketch estimates distinct tokens within the expected error band") {
    val r = TextAnalysis.kmvDistinctTokens(Tables.documents(spark, sf), k = 64).collect()(0)
    val exact = TextAnalysis.exactDistinctTokens(Tables.documents(spark, sf))
      .collect()(0).getLong(0)
    val est = r.getDouble(2)
    // sf0.001's vocab is tiny: the sketch holds min(64, n_exact) values
    assert(r.getLong(0) === math.min(64L, exact))
    if (exact >= 64) // saturated: KMV std error ~ 1/sqrt(k-2) ≈ 13%, allow 4σ
      assert(math.abs(est - exact.toDouble) / exact < 0.5, s"est=$est exact=$exact")
    else assert(est === exact.toDouble) // unsaturated sketch counts exactly
  }

  test("rolling fingerprint is order-sensitive; content hash is not") {
    import spark.implicits._
    val df = Seq(
      (0L, "alpha beta gamma", 16L),
      (1L, "gamma beta alpha", 16L)).toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(r(0L)._1 !== r(1L)._1) // different order → different rolling hash
  }

  test("repetition signals separate a degenerate loop from varied text") {
    import spark.implicits._
    val df = Seq(
      (0L, "buy now buy now buy now buy now", 31L),       // 4× "buy now"
      (1L, "one two three four five six seven eight", 39L)) // all distinct
      .toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.repetition(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // doc 0: 7 bigram slots, 2 distinct ("buy now"×4, "now buy"×3)
    assert(r(0L) === ((7L, 2L, 4L, 4.0 / 7.0, 1.0 - 2.0 / 7.0)))
    // doc 1: 7 bigram slots, all distinct, top count 1
    assert(r(1L) === ((7L, 7L, 1L, 1.0 / 7.0, 0.0)))
  }

  test("tfidf ranks a document's rare term above corpus-wide terms") {
    import spark.implicits._
    val df = Seq(
      (0L, "common common zebra", 19L),
      (1L, "common common common", 20L),
      (2L, "common aardvark common", 22L))
      .toDF("doc_id", "text", "n_chars")
    val top = TextAnalysis.tfidfTopTerms(df, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "zebra"/"aardvark" have df=1 → score tf·N/df = 3; "common" df=3 →
    // score ≤ 3·3/3 = 3 only when tf=3 (doc 1, where it's the only term)
    assert(top(0L) === "zebra")
    assert(top(1L) === "common")
    assert(top(2L) === "aardvark")
  }

  test("decontamination flags only train docs sharing an eval 3-gram") {
    import spark.implicits._
    // doc 0 (id % 20 == 0) is the eval set; doc 21 copies one of its
    // 3-grams, doc 22 shares words but no 3-gram, doc 23 is disjoint.
    val df = Seq(
      (0L, "secret benchmark answer key here today", 38L),
      (21L, "the secret benchmark answer was leaked", 38L),
      (22L, "benchmark the secret other answer words", 39L),
      (23L, "entirely unrelated training content now", 39L))
      .toDF("doc_id", "text", "n_chars")
    val r = graft.analytics.Curation.decontaminate(df, evalMod = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(r === List((21L, 4L, 1L))) // 4 train shingles, 1 eval hit
  }

  test("vocab truncation masks rare terms and preserves token positions") {
    import spark.implicits._
    // "common" in 2/2 docs (df-frac 1.0, kept); "rare"/"unique" in 1/2
    // docs (0.5 — kept at >= 0.5); threshold 0.75 masks them
    val df = Seq(
      (0L, "common rare common", 18L),
      (1L, "common unique", 13L)).toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.vocabTruncate(df, minDfFrac = 0.75).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(0L)._1 === 3L && r(0L)._2 === 1L) // "rare" masked
    assert(r(1L)._1 === 2L && r(1L)._2 === 1L) // "unique" masked
    // reconstruction hash = md5 of the masked text in original order
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0L)._3 === h("common <unk> common"))
    assert(r(1L)._3 === h("common <unk>"))
  }

  test("mixture weights rebalance sources to a uniform mix") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a", "web"), (1L, "b", "web"), (2L, "c", "web"),
      (3L, "d", "books")).toDF("doc_id", "text", "source")
    val w = graft.analytics.Curation.mixtureWeights(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(w("web") === 4.0 / (2 * 3))   // under-sample the big source
    assert(w("books") === 4.0 / (2 * 1)) // over-sample the small one
    // expected resampled counts equalize: 3·(2/3) = 1·2 = 2 per source
  }

  test("count-min sketch never underestimates and is exact sans collisions") {
    val docs = Tables.documents(spark, sf)
    val terms = graft.functions.TextFunctions.Stopwords
    val est = TextAnalysis.cmSketchEstimates(docs, terms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import spark.implicits._
    val exact = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("tk"))
      .groupBy("tk").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      val e = exact.getOrElse(t, 0L)
      assert(est(t) >= e, s"$t: est ${est(t)} < exact $e")
      // 3 rows × 256 buckets on a ~100-word vocab: collisions inflate at
      // most mildly; estimates stay within 2× of truth on this corpus
      assert(est(t) <= 2 * e + 50, s"$t: est ${est(t)} vs exact $e")
    }
  }
}
