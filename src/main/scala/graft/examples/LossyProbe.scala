package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Multimodal

/** Measures the JPEG lane's actual drift distribution (feeds the
  * tolerance-band choice in [[graft.analytics.Multimodal.decodeLossyFeatures]]
  * and the PLANS.md round-13 notes).
  */
object LossyProbe {
  def main(a: Array[String]): Unit = {
    val sf = a.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq(0.5f, 0.7f, 0.9f)) {
      val t0 = System.nanoTime()
      val feats = Multimodal.decodeLossyFeatures(spark,
        Multimodal.withEncodedJpeg(spark, Tables.documents(spark, sf), q),
        toleranceMilli = Long.MaxValue).toDF().localCheckpoint(true)
      val row = feats.agg(count(lit(1)), min(col("drift_milli")),
        max(col("drift_milli")),
        avg(col("drift_milli")),
        sum(when(col("decode_agree") && col("jpeg_magic"), 0L).otherwise(1L)))
        .head()
      println(s"[lossy] q=$q n=${row.getLong(0)} drift_milli min=${row.getLong(1)} " +
        s"max=${row.getLong(2)} avg=${row.getDouble(3)}%.0f bad=${row.getLong(4)} " +
        s"sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
