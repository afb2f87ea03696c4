package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.analytics.{Curation, Graph, Layout, Multimodal, TextAnalysis}

/** Specs for the round-4 operator additions: HLL sketch, bigram-LM
  * scoring, Z-order keys, perceptual-hash near-dup, fixed-point PageRank,
  * the curation manifest, interval overlap, and streaming top-k.
  */
class Round4Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round4-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("zorderKey interleaves bits (x odd positions, y even)") {
    import spark.implicits._
    // (x, y, expected morton) — hand-interleaved references
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 2L),            // x bit0 -> position 1
      (0L, 1L, 1L),            // y bit0 -> position 0
      (3L, 3L, 15L),           // both low two bits set
      (0xFFFFL, 0L, 0xAAAAAAAAL), // all x bits -> odd positions
      (0L, 0xFFFFL, 0x55555555L)) // all y bits -> even positions
    val got = cases.toDF("x", "y", "want")
      .select(Layout.zorderKey(col("x"), col("y")).as("z"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("zorder audit buckets cover all events with tight coordinate boxes") {
    val audit = Layout.zorderAudit(Tables.events(spark, sf)).collect()
    val total = audit.map(_.getAs[Long]("n")).sum
    assert(total === Tables.events(spark, sf).count())
    // each top-10-bit z-range constrains the top 5 bits of both coords:
    // the bounding box must never exceed 2^11 per axis
    audit.foreach { r =>
      assert(r.getAs[Long]("max_ux") - r.getAs[Long]("min_ux") < 2048)
      assert(r.getAs[Long]("max_tx") - r.getAs[Long]("min_tx") < 2048)
    }
  }

  test("HLL estimate tracks the exact distinct-shingle count") {
    val docs = Tables.documents(spark, sf)
    val est = TextAnalysis.hllDistinctShingles(docs, p = 8)
      .collect()(0).getAs[Double]("est_distinct")
    val exact = graft.analytics.Dedup.shingleSet(docs)
      .select("shingle").distinct().count().toDouble
    // m=256 raw estimator: expected relative error 1.04/sqrt(256) ≈ 6.5%
    assert(math.abs(est - exact) / exact < 0.25,
      s"est $est vs exact $exact")
  }

  test("bigram LM score quantizes transition probabilities exactly") {
    import spark.implicits._
    // corpus bigrams: (a,b) twice, (a,c) once -> P(b|a)=2/3, P(c|a)=1/3
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramLmScore(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(r(0) === ((0L, 1L, 666666L))) // floor(2e6/3)
    assert(r(1) === ((1L, 1L, 666666L)))
    assert(r(2) === ((2L, 1L, 333333L))) // floor(1e6/3)
  }

  test("phash pairs identical payloads at hamming 0") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "zzz completely different text with other letters entirely qqq"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(docs, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 0L)))
  }

  test("pageRank fixed point: symmetric pair keeps uniform rank; star concentrates") {
    import spark.implicits._
    // two nodes, one undirected edge: uniform rank is the fixed point
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(pair, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr(1L) === Graph.RankScale && pr(2L) === Graph.RankScale)
    // star 1-2, 1-3: hand-unrolled integer iteration values
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr3 = Graph.pageRank(star, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr3(1L) === 1741625000L)
    assert(pr3(2L) === 629187500L && pr3(3L) === 629187500L)
  }

  test("curation manifest respects shard budget and the eval/keeper/quality gates") {
    val m = Curation.manifest(Tables.documents(spark, sf),
      evalMod = 20, minWords = 10, minTtr = 0.3, lang = "en",
      shards = 8, budgetPerShard = 1500L).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[Long]("cum_tokens") <= 1500L)
      val shard = r.getAs[Long]("shard")
      assert(shard >= 0 && shard < 8)
      assert(r.getAs[Long]("doc_id") % 20 != 0L)
    }
    // cum_tokens is a real running sum within each shard
    m.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      val sums = sorted.scanLeft(0L)(_ + _.getAs[Long]("n_tokens")).drop(1)
      assert(sorted.map(_.getAs[Long]("cum_tokens")).toSeq === sums.toSeq)
    }
  }

  test("bucketed interval overlap equals the direct theta-join") {
    val name = "ts_interval_overlap"
    val bucketed = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // direct theta-join reference on the same session intervals
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    val sess = Tables.events(spark, sf).select(col("user_id"), col("ts_ms"))
      .withColumn("prev", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_s", when(col("prev").isNull ||
        col("ts_ms") - col("prev") > 1800000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts_ms")).as("s_ms"), max(col("ts_ms")).as("e_ms"))
    val a = sess.toDF("user_a", "sid_a", "sa", "ea")
    val b = sess.toDF("user_b", "sid_b", "sb", "eb")
    val direct = a.crossJoin(b)
      .where(col("user_a") < col("user_b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .groupBy("user_a", "user_b").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_a"), col("user_b")).limit(100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bucketed.toSeq === direct.toSeq)
  }

  test("containment catches a short doc inside a long one that jaccard misses") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 30).map(i => s"filler$i").mkString(" ")
    val docs = Seq((0L, short, short.length.toLong), (1L, long, long.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val cont = graft.analytics.Dedup.containmentPairs(docs, 0.8).collect()
    assert(cont.length === 1)
    val r = cont(0)
    assert(r.getAs[Double]("containment_a") === 1.0) // short fully contained
    assert(r.getAs[Double]("containment_b") < 0.5)
    // symmetric jaccard at the same bar finds nothing
    assert(graft.analytics.Dedup.jaccardPairs(docs, 0.8).count() === 0)
  }

  test("temperature mixing normalizes to 1 and compresses the mix ratio") {
    val w = Curation.temperatureMixWeights(Tables.documents(spark, sf)).collect()
    val total = w.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - 1.0) < 1e-12)
    // T=2 compresses: the weight ratio between any two sources is the
    // sqrt of their count ratio
    val byN = w.sortBy(_.getAs[Long]("n_s"))
    val (lo, hi) = (byN.head, byN.last)
    val countRatio = hi.getAs[Long]("n_s").toDouble / lo.getAs[Long]("n_s")
    val weightRatio = hi.getAs[Double]("weight") / lo.getAs[Double]("weight")
    assert(math.abs(weightRatio - math.sqrt(countRatio)) < 1e-9)
  }

  test("dsir weights rank in-domain documents above the corpus at large") {
    val w = Curation.dsirWeights(Tables.documents(spark, sf), "src0").collect()
    val (target, rest) = w.partition(r =>
      Tables.documents(spark, sf).where(col("source") === "src0")
        .select("doc_id").collect().map(_.getLong(0)).toSet
        .contains(r.getAs[Long]("doc_id")))
    assert(target.nonEmpty && rest.nonEmpty)
    def meanW(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("weight_q").toDouble).sum / rs.length
    assert(meanW(target) > meanW(rest))
  }

  test("change-point cumulative deviation is maximal at the reported point") {
    val cp = SparkEntry.queries("ts_changepoint")(spark, sf).collect()
    assert(cp.length === 5) // one per event_type
    cp.foreach(r => assert(r.getAs[Long]("max_abs_dev") > 0))
  }

  test("funnel stages are monotonically non-increasing; retention covers all users") {
    val f = SparkEntry.queries("ts_funnel")(spark, sf).collect()(0)
    val (nu, nv, nc, np) = (f.getAs[Long]("n_users"), f.getAs[Long]("n_viewed"),
      f.getAs[Long]("n_clicked"), f.getAs[Long]("n_purchased"))
    assert(nu >= nv && nv >= nc && nc >= np && np >= 0)
    assert(nv > 0)
    // cohort matrix: offset-0 row of each cohort counts the cohort itself,
    // so summing offset-0 users over cohorts = total distinct users
    val r = SparkEntry.queries("ts_cohort_retention")(spark, sf).collect()
    val day0 = r.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(day0 === nu)
  }

  test("streaming top-k equals the batch ranking on the bounded source") {
    val st = graft.streaming.StreamingIngest.streamingTopK(spark, sf, k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("tag")).orderBy(col("cents").desc, col("event_id"))
    val batch = Tables.events(spark, sf)
      .select(col("event_type").as("tag"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        col("event_id"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("tag", "rank", "event_id", "cents")
      .orderBy("tag", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(st.toSeq === batch.toSeq)
  }
}
