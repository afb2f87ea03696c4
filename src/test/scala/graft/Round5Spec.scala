package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.analytics.{Dedup, TextAnalysis}

/** Specs for the round-4 second-batch operators: exact-substring dup
  * spans, Gopher quality gate, OHLC bars, EWMA, lagged cross-correlation,
  * JSON property extraction, and the ANN recall evaluation.
  */
class Round5Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round5-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("substringDupStats: exact duplicates have dup_frac 1.0") {
    val docs = Tables.documents(spark, sf)
    // sf0.001 has no exact-dup docs; the invariant still binds when the
    // set is empty, and the synthetic-repetition corpus guarantees some
    // duplicated windows regardless.
    val dupIds = Dedup.exact(docs).where(col("group_size") > 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val stats = Dedup.substringDupStats(docs).collect()
    assert(stats.length === docs.count())
    stats.foreach { r =>
      val (nw, nd) = (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))
      assert(nd <= nw)
      val frac = r.getAs[Double]("dup_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      if (dupIds.contains(r.getAs[Long]("doc_id")) && nw > 0)
        assert(frac === 1.0, s"exact dup doc ${r.getAs[Long]("doc_id")}")
    }
    assert(stats.map(_.getAs[Long]("n_dup_windows")).sum > 0L)
  }

  test("substringDupStats: sub-window docs report zero windows") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c"), (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(tiny).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_windows") === 0L)
    assert(got(0).getAs[Double]("dup_frac") === 0.0)
    // docs 2 and 3 are identical 8-token docs: one window each, duplicated
    assert(got(1).getAs[Long]("n_windows") === 1L)
    assert(got(1).getAs[Double]("dup_frac") === 1.0)
    assert(got(2).getAs[Double]("dup_frac") === 1.0)
  }

  test("gopherRules: passes is the conjunction of the four flags") {
    val got = TextAnalysis.gopherRules(Tables.documents(spark, sf)).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val flags = Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio",
        "f_stopwords").map(r.getAs[Int])
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getAs[Int]("passes") === flags.min)
      val mwl = r.getAs[Double]("mean_word_len")
      assert(mwl === r.getAs[Long]("sum_word_len").toDouble /
        r.getAs[Long]("n_words").toDouble)
    }
    // both outcomes should occur on the fixture (short docs fail word count)
    assert(got.map(_.getAs[Int]("passes")).distinct.length === 2)
  }

  test("ts_ohlc: bars bound their bucket and count every event") {
    val bars = q("ts_ohlc").collect()
    bars.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("low"), r.getAs[Double]("high"))
      assert(lo <= hi)
      assert(r.getAs[Double]("open") >= lo && r.getAs[Double]("open") <= hi)
      assert(r.getAs[Double]("close") >= lo && r.getAs[Double]("close") <= hi)
    }
    assert(bars.map(_.getAs[Long]("n")).sum ===
      Tables.events(spark, sf).count())
  }

  test("ts_ewma: equals the closed-form fold on a spot-checked tag") {
    val rows = q("ts_ewma").where(col("event_type") === "click")
      .orderBy("ts_ms", "event_id").limit(20).collect()
    val vals = rows.map(_.getAs[Double]("value"))
    rows.zipWithIndex.foreach { case (r, idx) =>
      val win = vals.slice(math.max(0, idx - 15), idx + 1)
      val n = win.length
      val num = win.zipWithIndex.map { case (x, i) =>
        x * math.pow(0.5, n - 1 - i) }.sum
      val den = 2.0 - math.pow(0.5, n - 1)
      assert(math.abs(r.getAs[Double]("ewma") - num / den) < 1e-9)
    }
  }

  test("ts_xcorr: lags are bounded correlations over joined buckets") {
    val got = q("ts_xcorr").collect()
    // lags whose shifted join is empty produce no group (inner join);
    // at sf0.001 only a few survive, at sf0.01+ all 6 do
    assert(got.length >= 1 && got.length <= 6)
    got.foreach { r =>
      assert(r.getAs[Long]("lag") >= 0 && r.getAs[Long]("lag") <= 5)
      assert(r.getAs[Long]("n_buckets") > 0)
      if (!r.isNullAt(r.fieldIndex("xcorr"))) {
        val c = r.getAs[Double]("xcorr")
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      }
    }
  }

  test("ts_json_props: per-tag stats are consistent and complete") {
    val got = q("ts_json_props").collect()
    assert(got.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf).count())
    got.foreach { r =>
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
      assert(r.getAs[Double]("avg_k") ===
        r.getAs[Long]("sum_k").toDouble / r.getAs[Long]("n").toDouble)
    }
  }

  test("silenceRuns: run accounting is internally consistent") {
    val got = q("mm_silence").collect()
    assert(got.length === 500)
    got.foreach { r =>
      val (nf, ns, nr, lr) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_silent"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("longest_run"))
      assert(ns <= nf)
      assert(lr <= ns)
      if (nr > 0) assert(lr >= 1 && ns >= nr)  // runs partition the silent frames
      else assert(ns === 0 && lr === 0)
      if (ns > 0) assert(lr >= (ns + nr - 1) / nr) // pigeonhole on max run
    }
    assert(got.map(_.getAs[Long]("n_runs")).sum > 0)
  }

  test("minhashErrorEval: estimate brackets the exact Jaccard sanely") {
    val got = q("dd_minhash_eval").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val exact = r.getAs[Double]("exact_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(exact >= 0.0 && exact <= 1.0)
      assert(r.getAs[Double]("abs_err") === math.abs(est - exact))
      assert(r.getAs[Long]("n_common") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
    // LSH candidates are near-dups: the mean error of a 12-seed sketch
    // on them should be moderate, not degenerate
    val meanErr = got.map(_.getAs[Double]("abs_err")).sum / got.length
    assert(meanErr < 0.5)
  }

  test("cu_dataset_card: per-source stats reconcile with the corpus") {
    val got = q("cu_dataset_card").collect()
    val docs = Tables.documents(spark, sf)
    assert(got.map(_.getAs[Long]("n_docs")).sum === docs.count())
    got.foreach { r =>
      assert(r.getAs[Long]("n_langs") >= 1 && r.getAs[Long]("n_langs") <= 5)
      assert(r.getAs[Long]("n_redundant") >= 0)
      assert(r.getAs[Double]("dup_frac") >= 0.0 && r.getAs[Double]("dup_frac") < 1.0)
      assert(r.getAs[Double]("avg_chars") > 0)
    }
  }

  test("rel_shipping_priority: top-10 revenue is sorted and positive") {
    val got = q("rel_shipping_priority").collect()
    assert(got.length === 10)
    val revs = got.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(revs.forall(_ > 0))
  }

  test("st_vwap matches the batch ts_vwap row-for-row") {
    val stream = q("st_vwap").collect().map(_.toSeq).toSet
    val batch = q("ts_vwap")
      .select("event_type", "bucket_hr", "n", "volume", "turnover_ck", "vwap_cents")
      .collect().map(_.toSeq).toSet
    assert(stream === batch)
  }

  test("st_ohlc matches the batch ts_ohlc row-for-row") {
    val stream = q("st_ohlc").collect().map(_.toSeq).toSet
    val batch = q("ts_ohlc")
      .select("event_type", "bucket_min", "n", "low", "high", "open", "close")
      .collect().map(_.toSeq).toSet
    assert(stream === batch)
  }

  test("rel_window_stats: distribution stats are positional ratios") {
    val got = q("rel_window_stats").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val qt = r.getAs[Int]("quartile")
      assert(qt >= 1 && qt <= 4)
      val c = r.getAs[Double]("cume")
      assert(c > 0.0 && c <= 1.0)
      val p = r.getAs[Double]("pct_rank")
      assert(p >= 0.0 && p <= 1.0)
    }
    val perPriorityMax = got.groupBy(_.getAs[String]("priority"))
      .values.map(_.map(_.getAs[Double]("cume")).max)
    perPriorityMax.foreach(m => assert(m === 1.0))
  }

  test("cu_train_val_split: deterministic, complete, roughly 90/5/5") {
    val a = q("cu_train_val_split").collect()
    val b = q("cu_train_val_split").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // re-run identical
    assert(a.length === 500)
    val bySplit = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > 400 && bySplit("train") < 490)
  }

  test("tx_novelty: exact duplicates contribute nothing new") {
    val got = q("tx_novelty").collect()
    assert(got.length === 500)
    got.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
      val n = r.getAs[Double]("novelty")
      assert(n >= 0.0 && n <= 1.0)
    }
    // the LATER copy of an exact-dup pair introduces zero shingles
    val docs = Tables.documents(spark, sf)
    val laterDups = analytics.Dedup.exact(docs)
      .where(col("is_dup") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    got.filter(r => laterDups.contains(r.getAs[Long]("doc_id")))
      .foreach(r => assert(r.getAs[Double]("novelty") === 0.0))
  }

  test("sceneChanges: boundaries and scenes reconcile per doc") {
    val got = q("mm_scenes").collect()
    assert(got.length === 500)
    got.foreach { r =>
      val (nf, nb, ns) = (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_boundaries"), r.getAs[Long]("n_scenes"))
      assert(nb <= math.max(0L, nf - 1))
      if (nf > 0) assert(ns === nb + 1) else assert(ns === 0L)
      if (nb > 0) assert(r.getAs[Long]("max_delta") >= 3000L)
    }
  }

  test("gr_triangles: counts match a hand-built clique graph") {
    import spark.implicits._
    // a 4-clique has C(4,3)=4 triangles; a path a-b-c has none
    val emb = Seq.tabulate(6) { i =>
      // label 0: vectors 0-3 identical (4-clique); label 1: 4,5 + nothing
      val base = if (i <= 3) Array.fill(4)(1.0f)
      else Array(1.0f, 0.0f, 0.0f, 0.0f + i)
      (i.toLong, base, if (i <= 3) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
    val e = analytics.Dedup.embeddingNearDupsByLabel(emb, 0.99)
      .select(col("vec_a").as("a"), col("vec_b").as("b"), col("label"))
    val e2 = e.select(col("a").as("b"), col("b").as("c"))
    val e3 = e.select(col("a").as("a3"), col("b").as("c3"))
    val tri = e.join(e2, "b")
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .groupBy("label").agg(count(lit(1)).as("n_triangles")).collect()
    assert(tri.length === 1)
    assert(tri(0).getAs[Int]("label") === 0)
    assert(tri(0).getAs[Long]("n_triangles") === 4L)
  }

  test("tx_lang_confusion: cells partition the corpus, shares sum to 1 per lang") {
    val got = q("tx_lang_confusion").collect()
    assert(got.map(_.getAs[Long]("n")).sum === 500L)
    got.groupBy(_.getAs[String]("lang")).values.foreach { cells =>
      val total = cells.map(_.getAs[Double]("share_of_actual")).sum
      assert(math.abs(total - 1.0) < 1e-9)
    }
    // the marker heuristic must beat chance on English at least
    val en = got.filter(r => r.getAs[String]("lang") == "en")
    val enHit = en.find(_.getAs[String]("predicted") == "en")
      .map(_.getAs[Long]("n")).getOrElse(0L)
    assert(enHit.toDouble / en.map(_.getAs[Long]("n")).sum > 0.2)
  }

  test("dd_threshold_sweep: counts are monotone in the threshold") {
    val r = q("dd_threshold_sweep").collect().head
    val (a, b, c) = (r.getAs[Long]("n_ge_50"), r.getAs[Long]("n_ge_70"),
      r.getAs[Long]("n_ge_90"))
    assert(a >= b && b >= c)
    assert(a > 0)
  }

  test("property: substring dup-frac and novelty are consistent on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1 to 3).foreach { round =>
      val base = (0 until 40).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // duplicate a random subset with fresh ids
      val dups = base.filter(_ => rnd.nextBoolean()).take(10)
        .zipWithIndex.map { case ((_, t), j) => (1000L + j, t) }
      val docs = (base ++ dups).toDF("doc_id", "text")
      val stats = analytics.Dedup.substringDupStats(docs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_frac")).toMap
      // every duplicated text: BOTH copies fully duplicated
      dups.foreach { case (id, t) =>
        assert(stats(id) === 1.0, s"round $round dup copy $id")
        val orig = base.find(_._2 == t).get._1
        assert(stats(orig) === 1.0, s"round $round original $orig")
      }
      // novelty: later exact copies introduce nothing
      val novelty = {
        val sh = analytics.Dedup.shingleSet(docs)
        val fs = sh.groupBy("shingle").agg(min(col("doc_id")).as("fd"))
        sh.join(fs, "shingle").groupBy("doc_id")
          .agg((sum(when(col("fd") === col("doc_id"), 1).otherwise(0)) /
            count(lit(1))).as("novelty")).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
      }
      dups.foreach { case (id, _) => assert(novelty(id) === 0.0) }
    }
  }

  test("asof nearest picks the closer side, backward on equidistant ties") {
    import spark.implicits._
    // the tiebreak column (rid) must exist on both sides, like event_id
    // does in the registry queries
    val left = Seq((1L, 1L, 10L), (2L, 1L, 100L), (3L, 2L, 50L))
      .toDF("rid", "k", "ts")
    val right = Seq(
      (11L, 1L, 7L),   // 3 before left#1
      (12L, 1L, 13L),  // 3 after left#1 — equidistant, backward must win
      (13L, 1L, 104L), // 4 after left#2; 11/12 are 90+ before
      (14L, 2L, 60L))  // only a forward match for left#3
      .toDF("rid", "k", "ts")
    val got = graft.operators.AsOfJoin
      .nearest(left, right, Seq("k"), "ts", "ts", "rid", "n_")
      .orderBy(col("rid")).collect()
    assert(got(0).getAs[Long]("n_rid") === 11L) // tie -> backward
    assert(got(1).getAs[Long]("n_rid") === 13L) // forward closer
    assert(got(2).getAs[Long]("n_rid") === 14L) // forward only
  }

  test("cu_budget_curve: deciles cover the corpus, cumulative is monotone") {
    val got = q("cu_budget_curve").collect()
    assert(got.length === 10)
    assert(got.map(_.getAs[Long]("n_docs")).sum === 500L)
    val cums = got.map(_.getAs[Long]("cum_tokens"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(cums.last === got.map(_.getAs[Long]("decile_tokens")).sum)
  }

  test("ts_vwap: weighted mean sits inside the bucket's cent range") {
    val got = q("ts_vwap").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("vwap_cents"))) {
        assert(r.getAs[Long]("volume") > 0)
        assert(r.getAs[Double]("vwap_cents") >= 0.0)
      } else assert(r.getAs[Long]("volume") === 0L)
    }
  }

  test("ts_histogram: buckets tile the range and count every event") {
    val got = q("ts_histogram").collect()
    assert(got.map(_.getAs[Long]("n")).sum === Tables.events(spark, sf).count())
    got.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 15)
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
    }
  }

  test("ts_drawdown: drawdown is bounded by the peak") {
    val got = q("ts_drawdown").collect()
    assert(got.length === 5)
    got.foreach { r =>
      val dd = r.getAs[Long]("max_drawdown_cents")
      assert(dd >= 0L && dd <= r.getAs[Long]("max_peak_cents"))
    }
  }

  test("ts_sma_cross: crossings alternate golden/death per tag") {
    val got = q("ts_sma_cross").collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[String]("tag")).values.foreach { rows =>
      val seq = rows.sortBy(r =>
        (r.getAs[Long]("ts_ms"), r.getAs[Long]("event_id")))
        .map(_.getAs[String]("cross"))
      seq.zip(seq.tail).foreach { case (a, b) => assert(a != b) }
    }
  }

  test("dd_semdedup_apply: kept set is exactly the non-vec_b side") {
    val pairs = q("dd_semdedup").collect()
      .map(_.getAs[Long]("vec_b")).toSet
    val got = q("dd_semdedup_apply").collect()
    assert(got.length === 500)
    got.foreach { r =>
      val dropped = pairs.contains(r.getAs[Long]("vec_id"))
      assert(r.getAs[Int]("is_kept") === (if (dropped) 0 else 1))
    }
    val kept = got.count(_.getAs[Int]("is_kept") == 1)
    assert(kept > 0 && kept < 500) // something dropped, not everything
  }

  test("dd_semdedup: pairs share a cluster and clear the threshold") {
    val got = q("dd_semdedup").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cos") >= 0.3)
    }
    // learned blocks differ from label blocks: the pair sets should not
    // be identical to the label-blocked operator's (same threshold)
    val labelPairs = analytics.Dedup
      .embeddingNearDupsByLabel(Tables.embeddings(spark, sf), 0.3)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val semPairs = got.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(semPairs.nonEmpty && semPairs != labelPairs)
  }

  test("sim_recall_eval: recall in [0,1] with k=5 exact sets") {
    val got = q("sim_recall_eval").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      assert(r.getAs[Long]("n_hits") <= 5L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the IVF probe should find at least some true neighbors overall
    assert(got.map(_.getAs[Long]("n_hits")).sum > 0L)
  }
}
