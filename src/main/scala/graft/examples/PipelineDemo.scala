package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.{Curation, Dedup, Similarity, TextAnalysis}

/** The training-data curation pipeline END TO END as ONE composed Spark
  * job — the workflow a user of this library actually ships, staged the
  * way the big public pipelines (CCNet / RefinedWeb / Gopher) stage it:
  *
  *   1. quality gate        (rule-based filters, per-doc projection)
  *   2. exact dedup         (content-digest keeper)
  *   3. fuzzy dedup         (MinHash-LSH candidates → cluster keepers)
  *   4. decontamination     (eval-set 3-gram overlap + embedding cosine)
  *   5. curation output     (deterministic train/val split + manifest)
  *
  * Every stage is the SAME operator the oracle gate checks one by one
  * (`tx_gopher`, `dd_exact`, `dd_apply`, `cu_decontaminate`,
  * `cu_embed_decontaminate`, `cu_train_val_split`) — this demo composes
  * them to show the stages chain as plain DataFrame → DataFrame
  * functions, with one action at the end.
  *
  * Run: `sbt "runMain graft.examples.PipelineDemo [sfDir]"`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. rule-based quality gate (the Gopher-style keep rules; min-words
    // relaxed to the synthetic corpus's ~50-word documents)
    val quality = TextAnalysis.gopherRules(docs, minWords = 10)
      .where(col("passes") === 1).select("doc_id")
    val kept1 = docs.join(quality, "doc_id")
    val n1 = kept1.count()

    // 2. exact dedup: one keeper per content digest
    val exactKeepers = Dedup.exact(kept1)
      .where(col("is_dup") === 0).select("doc_id")
    val kept2 = kept1.join(exactKeepers, "doc_id")
    val n2 = kept2.count()

    // 3. fuzzy dedup: near-dup cluster keepers (min doc_id per cluster)
    val losers = Dedup.duplicateClusters(kept2, threshold = 0.5)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val kept3 = kept2.join(losers, Seq("doc_id"), "left_anti")
    val n3 = kept3.count()

    // 4a. n-gram decontamination vs the eval slice
    val contaminated = Curation.decontaminate(kept3, evalMod = 20)
      .where(col("hit_ratio") >= 0.5).select("doc_id")
    // 4b. embedding-space decontamination (paraphrase-shaped leaks)
    val embContaminated = Similarity.embedDecontaminate(
        Tables.embeddings(spark, sfDir), threshold = 0.35, evalModulo = 20)
      .where(col("contaminated") === 1)
      .select(col("vec_id").as("doc_id"))
    val kept4 = kept3
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(embContaminated, Seq("doc_id"), "left_anti")
    val n4 = kept4.count()

    // 5. deterministic content-independent split + release manifest
    val bucket = (conv(substring(md5(
      concat(lit("split:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long") % 100)
    val split = kept4.withColumn("split",
      when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
    val manifest = split.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("split")

    println(s"[pipeline] corpus $total -> quality $n1 -> exact-dedup $n2" +
      s" -> fuzzy-dedup $n3 -> decontaminated $n4")
    manifest.collect().foreach { r =>
      println(s"[pipeline] split=${r.get(0)} docs=${r.get(1)} chars=${r.get(2)}")
    }
    val funnelOk = total >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4 && n4 > 0
    println(s"[pipeline] monotone funnel with non-empty output: $funnelOk")
    spark.stop()
    if (!funnelOk) sys.exit(1)
  }
}
