package graft.examples

import graft.Tables
import org.apache.spark.sql.SparkSession
object BpeProbe {
  def main(a: Array[String]): Unit = {
    val sf = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.analytics.TextAnalysis.bpeTelemetry = true
    val deep = a.length > 1 && a(1) == "deep"
    val t0 = System.nanoTime()
    val n =
      if (deep) graft.analytics.TextAnalysis.bpeTrainDeep(
        Tables.documents(spark, sf), targetMerges = 1024, batchM = 16, poolK = 96).count()
      else graft.analytics.TextAnalysis.bpeTrainScaled(
        Tables.documents(spark, sf), targetMerges = 256, batchM = 8, poolK = 48).count()
    val total = (System.nanoTime() - t0) / 1e9
    println(s"[bpeprobe] sf=$sf rules=$n total=${"%.1f".format(total)}s")
    graft.analytics.TextAnalysis.lastRoundCosts.foreach { case (r, m, pv, s) =>
      println(s"[bpeprobe] round=$r merges=$m pair_rows=$pv sec=" + "%.2f".format(s))
    }
    spark.stop()
  }
}
