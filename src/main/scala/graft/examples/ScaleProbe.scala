package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** One-off scale probe: synthesize an sf1-shaped dataset (10× sf0.1) and
  * time the most expensive registry queries at both scales, printing the
  * per-query growth factor. This is the "would the claimed plan shapes
  * hold an order of magnitude up?" check — NOT a correctness gate (the
  * DuckDB oracle stays at sf0.01) and NOT the driver bench.
  *
  * The synthetic 10× corpus is 10 disjoint "shards" of the real sf0.1
  * data with per-shard key offsets, so per-shard structure (duplicate
  * clusters, skew profiles, time density) matches the real distribution:
  *  - documents: per-shard letter rotation (a deterministic `translate`)
  *    keeps intra-shard near-dup structure identical while making
  *    cross-shard texts unrelated (shingle sets disjoint).
  *  - embeddings: per-shard component rotation preserves norms and
  *    intra-shard geometry; cross-shard cosines decorrelate.
  *  - events: per-shard time-range offset stacks shards end-to-end, so
  *    the streaming windows/watermarks see a 10×-longer, equally-dense
  *    timeline.
  *  - TPC-H facts: consistent key offsets keep every join's fan-out and
  *    per-key skew exactly as measured at sf0.1.
  *
  * Usage: runMain graft.examples.ScaleProbe [queryCsv]
  */
object ScaleProbe {
  private val SrcDir = "/root/testdata/sf0.1"
  private val DstDir = "/tmp/graft-sf1"
  private val Replicas = 10

  private val DefaultQueries = Seq(
    "dd_minhash_lsh", "dd_minhash_eval", "dd_apply", "dd_dup_clusters",
    "dd_cluster_stats", "dd_semdedup", "sim_ann_ivf_kmeans", "gr_pagerank",
    "rel_skew_salted", "st_stream_join", "st_ohlc", "st_vwap", "st_lww_tws",
    "st_lww_state", "st_topk")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!Files.exists(Paths.get(DstDir, "documents.parquet")))
      generate(spark)

    val names =
      if (args.nonEmpty) args(0).split(",").toSeq else DefaultQueries
    println(f"${"query"}%-22s ${"sf0.1_s"}%9s ${"sf1_s"}%9s ${"growth"}%7s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: not registered")
        case Some(fn) =>
          val t01 = time(spark, fn, SrcDir)
          val t1 = time(spark, fn, DstDir)
          println(f"$name%-22s $t01%9.2f $t1%9.2f ${t1 / t01}%7.2f")
      }
    }
    spark.stop()
  }

  /** Warm-up run (JIT/codegen/listing), then best-of-2 timed runs on a
    * cold cache — the same protocol as [[graft.Bench]].
    */
  private def time(spark: SparkSession,
      fn: (SparkSession, String) => DataFrame, dir: String): Double = {
    fn(spark, dir).count()
    spark.catalog.clearCache()
    (0 until 2).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val d = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      d
    }.min
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      } finally s.close()
    }

  private def generate(spark: SparkSession): Unit = {
    Files.createDirectories(Paths.get(DstDir))
    def src(t: String) = spark.read.parquet(s"$SrcDir/$t.parquet")
    // each table must be ONE parquet FILE named <t>.parquet (matching the
    // driver's testdata layout — the streaming sources pathGlobFilter on
    // the file name, so a directory layout would feed them zero rows)
    def write(t: String, df: DataFrame): Unit = {
      val tmp = s"$DstDir/_tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, Paths.get(DstDir, s"$t.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          moved = true
        }
      }
      require(moved, s"no part file produced for $t")
      deleteTree(Paths.get(tmp))
    }
    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = src(t)
      write(t, (0 until Replicas).map(i => f(base, i)).reduce(_ unionAll _))
    }

    // tiny dims: copy as-is
    Seq("region", "nation").foreach(t => write(t, src(t)))

    val alpha = "abcdefghijklmnopqrst"
    replicate("documents") { (df, i) =>
      val rot = alpha.drop(2 * i) + alpha.take(2 * i)
      df.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) col("text") else translate(col("text"), alpha, rot)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }

    replicate("embeddings") { (df, i) =>
      val dim = 64
      val rotated =
        if (i == 0) col("embedding")
        else concat(slice(col("embedding"), i + 1, dim - i),
          slice(col("embedding"), 1, i))
      df.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        rotated.as("embedding"), col("label"))
    }

    // same encoding dispatch as Tables.withTsMs: the synthetic file must
    // keep the SOURCE's ts type so the loaders treat both scales alike
    val tsType = src("events").schema("ts").dataType
    val isLongTs = tsType == org.apache.spark.sql.types.LongType
    val tsSpan: Long = if (isLongTs) {
      val r = src("events").agg(min(col("ts")), max(col("ts"))).head()
      r.getLong(1) - r.getLong(0) + 1000000000L // nanos + 1 s gap
    } else {
      val r = src("events").agg(
        unix_micros(min(col("ts")).cast("timestamp")),
        unix_micros(max(col("ts")).cast("timestamp"))).head()
      r.getLong(1) - r.getLong(0) + 1000000L // micros + 1 s gap
    }
    replicate("events") { (df, i) =>
      val shiftedTs =
        if (isLongTs) (col("ts") + lit(i * tsSpan)).as("ts")
        else timestamp_micros(unix_micros(col("ts").cast("timestamp")) +
          lit(i * tsSpan)).cast(tsType).as("ts")
      df.select((col("event_id") + lit(i * 1000000000000L)).as("event_id"),
        shiftedTs,
        (col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

    replicate("customer") { (df, i) =>
      // c_name IS the key in TPC-H ("Customer#" + 9-digit custkey) — a
      // shard that offsets the key but kept the old name would put ten
      // identical names in every ER block (|block|² Levenshtein blowup,
      // measured 56× at 10×), which no real registry has
      df.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L))
        .withColumn("c_name",
          concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
    }
    replicate("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * 10000000L))
    }
    replicate("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * 10000000L))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * 10000000L))
    }
    println(s"[probe] generated $DstDir (${Replicas}x $SrcDir)")
  }
}
