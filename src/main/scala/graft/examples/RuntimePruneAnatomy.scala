package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost anatomy for `ts_dsv2_runtime_prune` — the slowest STABLE bench row
  * (~3.2 s at sf0.1, BASELINE.md round-7 table). The bench protocol already
  * hoists store staging into the untimed warm-up (StoreQueries.storeFor
  * memoizes per JVM), so the 3 s is the REPEATED cost of the DPP-gated
  * read itself. This main decomposes it:
  *
  *   staging        — one-time bulk ingest into the store layout (warm-up
  *                    cost, NOT in the bench row; printed for the record)
  *   full_scan      — connectorDF("hot") count, no pruning at all
  *   static_prune   — tag IN (...) pushed at plan time (no DPP machinery)
  *   dpp_query      — the registered query verbatim (broadcast dim join →
  *                    SupportsRuntimeFiltering → runtime directory prune)
  *
  * Run: sbt "runMain graft.examples.RuntimePruneAnatomy [sfDir]"
  * Findings land in PLANS.md ("runtime-prune cost anatomy").
  */
object RuntimePruneAnatomy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def best2(f: => Long): Double =
      (0 until 2).map { _ =>
        val (d, _) = time(f); spark.catalog.clearCache(); d
      }.min

    val (stagingSec, st) = time(graft.queries.StoreQueries.storeFor(spark, sfDir))
    println(f"staging_first_touch_sec=$stagingSec%.2f (bench pays this once, untimed)")

    val full = st.connectorDF("hot")
    full.count() // JIT/codegen warm-up on the connector path
    println(f"full_scan_sec=${best2(full.count())}%.2f")

    val staticQ = st.connectorDF("hot")
      .where(col("tag").isin("signup", "error"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"),
        sum(col("ts") % lit(1000000007L)).as("msum"))
    staticQ.count()
    println(f"static_prune_sec=${best2(staticQ.count())}%.2f")

    // the registered query verbatim (round 8: dim = md5-prefix-filtered
    // distinct tags, so pruning comes ONLY from the runtime filter)
    def dpp() = graft.SparkEntry.queries("ts_dsv2_runtime_prune")(spark, sfDir)
    dpp().count()
    println(f"dpp_query_sec=${best2(dpp().count())}%.2f")

    // same join WITHOUT the runtime-filter benefit: disable DPP-side
    // filtering by joining on a derived (non-filterable) column
    def joinNoDpp() = {
      val dim = Seq(("signup", 3L), ("error", 5L)).toDF("d_tag", "weight")
      st.connectorDF("hot")
        .withColumn("tag2", concat(col("tag"), lit("")))
        .join(broadcast(dim), col("tag2") === col("d_tag"))
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          sum(col("ts") % lit(1000000007L) * col("weight")).as("wsum"))
        .orderBy("tag")
    }
    joinNoDpp().count()
    println(f"join_no_dpp_sec=${best2(joinNoDpp().count())}%.2f")

    spark.stop()
  }
}
