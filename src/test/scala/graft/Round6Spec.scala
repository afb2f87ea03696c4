package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.analytics.{Graph, Similarity, TextAnalysis}

/** Specs for the round-6 batch-7 operators: bounded-round label
  * propagation, product-quantization ADC search, PII scrubbing, the SCD2
  * dimension build, binary-lane exact dedup, and the streaming anomaly
  * twin.
  */
class Round6Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round6-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- label propagation ----

  test("labelPropagation: label = min node id within `rounds` hops, not the component min") {
    import spark.implicits._
    // path 1-2-3-4-5-6-7-8 (diameter 7) plus triangle 10-11-12
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = undirected.toDF("src", "dst")
      .unionAll(undirected.map(_.swap).toDF("src", "dst"))
    val got = Graph.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // path node k reaches down to k-3 in 3 rounds — NOT all the way to 1
    (1L to 8L).foreach { k => assert(got(k) === math.max(1L, k - 3L), s"node $k") }
    // the triangle converges to its min immediately
    Seq(10L, 11L, 12L).foreach { k => assert(got(k) === 10L) }
  }

  test("labelPropagation: enough rounds reaches full connected components") {
    import spark.implicits._
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L))
    val edges = undirected.toDF("src", "dst")
      .unionAll(undirected.map(_.swap).toDF("src", "dst"))
    val got = Graph.labelPropagation(edges, rounds = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 8L).foreach { k => assert(got(k) === 1L) }
  }

  // ---- product quantization ----

  test("pqTopK: well-separated clusters rank in-cluster neighbors first") {
    import spark.implicits._
    // 4 clusters of 3 near-identical vectors at orthogonal ±1000 corners
    // (dim 8), with every vector in the codebook so each subspace encodes
    // losslessly — the assertion then isolates the ADC mechanics
    // (codebook slicing, L2 encode, LUT sum) rather than seed luck: the
    // two in-cluster neighbors must outrank any cross-cluster vector.
    val base = Seq(
      Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f),
      Array(-1f, -1f, -1f, -1f, 1f, 1f, 1f, 1f),
      Array(1f, 1f, -1f, -1f, -1f, -1f, 1f, 1f),
      Array(-1f, -1f, 1f, 1f, -1f, -1f, -1f, -1f))
    val vecs = for {
      c <- 0 until 4
      j <- 0 until 3
    } yield ((c * 3 + j).toLong, base(c).map(_ * 1000f + j * 0.01f), c)
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.pqTopK(emb, k = 2, queryModulo = 1,
      numSubspaces = 2, codebookSize = 12, dim = 8)
      .collect()
    assert(got.length === 12 * 2)
    got.foreach { r =>
      val (qid, nid) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(qid / 3 === nid / 3,
        s"query $qid ranked cross-cluster neighbor $nid in its top-2")
    }
  }

  test("sim_pq_adc: every query emits exactly k ranks with non-increasing adc_dot") {
    val rows = q("sim_pq_adc").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5), s"query $qid")
      val dots = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("adc_dot"))
      dots.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) >= w(1), s"query $qid not sorted")
      }
    }
  }

  // ---- PII scrub ----

  test("piiScrub: injected counts and redaction match a locally computed scrub") {
    import spark.implicits._
    val docs = Seq((5L, "plain words only"), (6L, "more plain words")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    // doc 5: 5%3=2 emails, 5%2=1 phone, 1 ip; doc 6: 0 emails, 0 phones, 1 ip
    assert(got(0).getAs[Int]("n_email") === 2)
    assert(got(0).getAs[Int]("n_phone") === 1)
    assert(got(0).getAs[Int]("n_ip") === 1)
    assert(got(1).getAs[Int]("n_email") === 0)
    assert(got(1).getAs[Int]("n_phone") === 0)
    assert(got(1).getAs[Int]("n_ip") === 1)
    // recompute doc 5's scrub with plain Java regex
    val aug5 = "plain words only" + (" user5@mail5.net" * 2) + " call 555-0105" +
      " from 10.5.35.65"
    val clean5 = aug5
      .replaceAll("[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>")
      .replaceAll("555-[0-9]+", "<PHONE>")
      .replaceAll("10\\.[0-9]+\\.[0-9]+\\.[0-9]+", "<IP>")
    assert(got(0).getAs[Long]("raw_len") === aug5.length.toLong)
    assert(got(0).getAs[Long]("clean_len") === clean5.length.toLong)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(clean5.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0).getAs[String]("clean_md5") === md5hex)
  }

  test("piiScrub: redaction shrinks every document that had a detection") {
    val scrubbed = TextAnalysis.piiScrub(Tables.documents(spark, sf))
    val bad = scrubbed.where(
      (col("n_email") + col("n_phone") + col("n_ip") > 0) &&
        (col("clean_len") >= col("raw_len"))).count()
    assert(bad === 0L)
    // every document detects at least the injected IP
    assert(scrubbed.where(col("n_ip") === 0).count() === 0L)
  }

  // ---- SCD2 ----

  test("rel_scd2_merge: versions are contiguous, intervals chain, one open version per key") {
    val rows = q("rel_scd2_merge").collect()
    val byKey = rows.groupBy(_.getAs[Long]("custkey"))
    assert(byKey.nonEmpty)
    byKey.foreach { case (ck, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq === (1 to rs.length), s"custkey $ck")
      // exactly one current (open) version, and it is the last
      val opens = sorted.filter(_.isNullAt(sorted.head.fieldIndex("valid_to")))
      assert(opens.length === 1 && opens.head.getAs[Int]("version") === rs.length,
        s"custkey $ck open versions")
      // interval chaining: valid_to(v) == valid_from(v+1)
      sorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[Long]("valid_to") === w(1).getAs[Long]("valid_from"),
            s"custkey $ck chain")
      }
      // merge-on-change semantics: consecutive versions differ in priority
      sorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0).getAs[String]("priority") !== w(1).getAs[String]("priority"),
            s"custkey $ck collapsed run")
      }
    }
  }

  // ---- binary-lane exact dedup ----

  test("mm_dedup: copies partition the corpus; keeper is the group min") {
    val docs = Tables.documents(spark, sf)
    val rows = q("mm_dedup").collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum === docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("wasted_bytes") ===
        (r.getAs[Long]("n_copies") - 1) * r.getAs[Long]("n_bytes"))
    }
    // keeper ids are distinct (one keeper per content group)
    val keepers = rows.map(_.getAs[Long]("keeper_id"))
    assert(keepers.distinct.length === keepers.length)
  }

  // ---- streaming anomaly parity ----

  test("st_anomaly: streaming rendering equals the batch ts_anomaly row-for-row") {
    val batch = q("ts_anomaly").collect().map(_.toString).sorted
    val stream = q("st_anomaly").collect().map(_.toString).sorted
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq)
  }

  // ---- streaming SCD2 parity ----

  test("st_scd2: stateful streaming build equals the batch rel_scd2_merge") {
    val batch = q("rel_scd2_merge").collect().map(_.toString).sorted
    val stream = q("st_scd2").collect().map(_.toString).sorted
    assert(stream.nonEmpty)
    assert(stream.toSeq === batch.toSeq)
  }

  test("Scd2Processor: a late early-timestamped order rebuilds the chain correctly") {
    // A(p1) then C(p1) collapse to one version; a LATE arrival B(p2)
    // between them must split the run — C becomes a change point again.
    // This is exactly the case that forces history (not chain) state.
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[graft.streaming.ScdOrder](
        implicitly[org.apache.spark.sql.Encoder[graft.streaming.ScdOrder]], spark)
      val out = in.toDS().groupByKey(_.custkey)
        .transformWithState(new graft.streaming.Scd2Processor,
          TimeMode.None(), OutputMode.Append())
        .toDF()
      val qy = out.writeStream.outputMode("append")
        .format("memory").queryName("scd2_late").start()
      try {
        in.addData(graft.streaming.ScdOrder(1L, 100L, 1L, "p1"),
          graft.streaming.ScdOrder(1L, 300L, 3L, "p1"))
        qy.processAllAvailable()
        in.addData(graft.streaming.ScdOrder(1L, 200L, 2L, "p2"))
        qy.processAllAvailable()
      } finally qy.stop()
      // the LAST emitted chain (second batch) must be p1@100 → p2@200 → p1@300
      val rows = spark.table("scd2_late").collect()
        .map(r => (r.getAs[Int]("version"), r.getAs[String]("priority"),
          r.getAs[Long]("valid_from")))
      val finalChain = rows.groupBy(_._1).map { case (_, vs) => vs.last }.toSeq.sorted
      assert(finalChain.containsSlice(Seq((1, "p1", 100L), (2, "p2", 200L), (3, "p1", 300L))),
        s"got $finalChain")
    } finally prev match {
      case Some(v) => spark.conf.set(pk, v)
      case None    => spark.conf.unset(pk)
    }
  }

  // ---- char diversity ----

  test("charDiversity: Simpson index matches a locally computed value") {
    import spark.implicits._
    val docs = Seq((1L, "aab"), (2L, "abab"), (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(docs).orderBy("doc_id").collect()
    // "aab": n_a=2, n_b=1 → simpson 2·1 = 2; N=3 → prob 2/6
    assert(got(0).getAs[Long]("simpson_num") === 2L)
    assert(got(0).getAs[Double]("collision_prob") === 2.0 / 6.0)
    assert(got(0).getAs[Long]("distinct_chars") === 2L)
    // "abab": 2·1 + 2·1 = 4; N=4 → 4/12
    assert(got(1).getAs[Long]("simpson_num") === 4L)
    assert(got(1).getAs[Double]("collision_prob") === 4.0 / 12.0)
    // single char: simpson 0, prob NULL (N ≤ 1)
    assert(got(2).getAs[Long]("simpson_num") === 0L)
    assert(got(2).isNullAt(got(2).fieldIndex("collision_prob")))
  }

  test("tx_char_diversity: alphabet covers the corpus; probabilities bounded") {
    val rows = q("tx_char_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("collision_prob")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Long]("distinct_chars") <= TextAnalysis.Alphabet.length.toLong)
    }
  }

  // ---- PQ recall ----

  test("sim_pq_recall: recall bounded, exact side always k-deep") {
    val rows = q("sim_pq_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hits") <= 5L)
    }
  }

  // ---- passage dedup ----

  test("dd_passage_dedup: duplicated spans removed exactly once, corpus-wide") {
    import spark.implicits._
    // doc 1 owns "a b c d e f g h i j"; doc 2 repeats it verbatim as its
    // FIRST passage then continues with fresh words; doc 3 is all-fresh
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j k l m n o p q r s t"),
      (3L, "z y x w v")).toDF("doc_id", "text")
    val out = graft.analytics.Dedup.passageDedup(docs, chunkWords = 10)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_chunks") === 1L)
    assert(byId(1L).getAs[Long]("n_kept") === 1L) // first occurrence wins
    assert(byId(2L).getAs[Long]("n_chunks") === 2L)
    assert(byId(2L).getAs[Long]("n_kept") === 1L) // repeated passage dropped
    assert(byId(2L).getAs[Long]("kept_words") === 10L)
    assert(byId(3L).getAs[Long]("n_kept") === 1L)
    // reconstruction fingerprint = md5 of the surviving text in doc order
    assert(byId(2L).getAs[String]("kept_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("k l m n o p q r s t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    // a doc whose every passage appeared earlier keeps nothing → null md5
    val dup = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val dupOut = graft.analytics.Dedup.passageDedup(dup, chunkWords = 10)
      .orderBy("doc_id").collect()
    assert(dupOut(1).getAs[Long]("n_kept") === 0L)
    assert(dupOut(1).isNullAt(dupOut(1).fieldIndex("kept_md5")))
  }

  // ---- k-center coreset ----

  test("cu_kcenter: k spread rounds, selection distances non-increasing") {
    val rows = q("cu_kcenter").orderBy("sel_round").collect()
    assert(rows.length === 8)
    assert(rows.map(_.getAs[Int]("sel_round")).toSeq === (0 until 8))
    // selected ids distinct; greedy farthest-point ⇒ the selection
    // distance can never increase after round 1 (each new center only
    // shrinks every point's distance-to-selected-set)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === 8)
    val d = rows.map(_.getAs[Long]("dist_sq"))
    assert(d(0) === 0L)
    (2 until 8).foreach(i => assert(d(i) <= d(i - 1),
      s"round $i dist ${d(i)} > round ${i - 1} dist ${d(i - 1)}"))
  }

  // ---- MAD outliers ----

  test("ts_outlier_mad: exact medians, outliers beyond 3*MAD only") {
    import spark.implicits._
    // 9 well-behaved values + one wild outlier: med=5 cents… values in
    // cents: 1..9 and 1000 → med=5.5, adev median exact multiple of .5
    val df = (Seq.tabulate(9)(i => (i + 1).toDouble / 100) :+ 10.0)
      .zipWithIndex
      .map { case (v, i) => (i.toLong, "t", v) }
      .toDF("event_id", "event_type", "value")
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val e = df.select(col("event_type"), cents.as("cents"))
    val med = e.groupBy("event_type")
      .agg(percentile(col("cents"), lit(0.5)).as("med"))
    val row = med.collect().head
    assert(row.getAs[Double]("med") === 5.5)
    val out = q("ts_outlier_mad").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      val mad = r.getAs[Double]("mad_cents")
      assert(mad * 4 === math.floor(mad * 4)) // exact multiple of 0.25
    }
  }
}
