package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Similarity

object LayerProbe {
  def main(a: Array[String]): Unit = {
    val sf = a.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Similarity.graphTelemetry = true
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, k = 5, queryModulo = 20)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val nExact = exact.count()
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      exact.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    val g20 = Similarity.nnDescent(emb, k = 20, rounds = 3, nPlanes = 8, buildK = 20)
      .localCheckpoint(true)
    val g5 = g20.where(col("rank") <= 5).localCheckpoint(true)
    val q = emb.where(col("vec_id") % 20 === 0)
    val t0 = System.nanoTime()
    val flat = Similarity.graphSearch(q, g5, emb, k = 5, beam = 8, hops = 3, nEntries = 4)
    val fh = hits(flat); val fScored = Similarity.lastScoredCount
    val t1 = System.nanoTime()
    val lay = Similarity.layeredGraphSearch(q, g20, emb, k = 5, beam = 8, hops = 2,
      degree = 5, upperBeam = 4, upperHops = 2, entryK = 2, nEntries = 4)
    val lh = hits(lay); val lScored = Similarity.lastScoredCount
    val t2 = System.nanoTime()
    println(s"[layer] exact=$nExact flat_hits=$fh flat_scored=$fScored flat_sec=${(t1-t0)/1e9}")
    println(s"[layer] layered_hits=$lh layered_scored=$lScored lay_sec=${(t2-t1)/1e9}")
    // the registered 3-level config (sim_graph_multilevel): guided mid
    // level affords a NARROWER layer-0 beam (6 vs the 2-layer's 8)
    val t2b = System.nanoTime()
    val ml = Similarity.multilevelGraphSearch(q, g20, emb, levels = 3, k = 5,
      beam = 6, hops = 2, degree = 5, upperBeam = 4, topHops = 2,
      midHops = 2, entryK = 2, nEntries = 2)
    val mh = hits(ml); val mScored = Similarity.lastScoredCount
    println(s"[layer] multilevel_hits=$mh multilevel_scored=$mScored " +
      s"ml_sec=${(System.nanoTime()-t2b)/1e9}")
    spark.stop()
  }
}
